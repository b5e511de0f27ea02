package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the hot inner loop of similarity search.
  *
  * Preference order per SURVEY.md §2.6 / the build brief: built-ins
  * can express this (zip_with + aggregate) but allocate an
  * intermediate array per row; a Scala UDF would box every element.
  * This expression runs a primitive float loop with full codegen
  * (doGenCode), so it stays inside the WholeStageCodegen span.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i); val yi = y.getFloat(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          float $xi = $a.getFloat($i); float $yi = $b.getFloat($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
          : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native, ORACLE-PORTABLE f32 dot product — the fast evaluator for
  * the [[VectorFunctions.chainDot]] SQL chain: a strictly
  * LEFT-ASSOCIATED float multiply-add loop whose first term is
  * `a[0]*b[0]` (no zero seed), so its result is bit-identical to the
  * 64-term `a[0]*b[0] + a[1]*b[1] + …` expression text both engines
  * replay — including the sign of a ±0.0 result, which a `0.0f`
  * accumulator seed would flip (IEEE: (+0) + (−0) = +0). Unlike
  * [[CosineSimilarity]] (double accumulator — fast but not
  * chain-replayable), this IS the chain, evaluated as one fused
  * primitive loop instead of a 64-node expression tree: the hot side
  * of the portable-LSH bucketing (16 projections per corpus row)
  * measured ~2.5× faster end to end. Multiplying by a ±1 weight is
  * exact, so a ±sign chain (`a[0] - a[1] + …`) equals the dot against
  * a ±1 vector — PortableLshSpec pins the bit-equality expression vs
  * native on the fixture. */
/** Ragged inputs are a TYPED CONTRACT violation, not a truncation:
  * the oracle's fixed-dim chain text indexes every element and DuckDB
  * yields NULL on an out-of-range list index, so a silently truncated
  * Spark score would be a finite number where the oracle goes NULL —
  * a cross-engine divergence masquerading as data. Unequal lengths
  * therefore evaluate to NULL here too (fail-visible on both engines
  * the same way); equal-length arrays shorter than the caller's chain
  * dim remain the caller's fixed-dim contract. */
case class ChainDotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FloatType

  // null even for non-null inputs (the length-mismatch contract)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chain_dot_f32 expects array<float>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null // ragged = contract violation
    else if (n == 0) 0.0f
    else {
      var acc = x.getFloat(0) * y.getFloat(0)
      var i = 1
      while (i < n) { acc += x.getFloat(i) * y.getFloat(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          float $acc = 0.0f;
          if ($n > 0) {
            $acc = $a.getFloat(0) * $b.getFloat(0);
            for (int $i = 1; $i < $n; $i++) {
              $acc += $a.getFloat($i) * $b.getFloat($i);
            }
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Register `cosine_sim` + `chain_dot_f32` for SQL/expr use on a
    * session. Truly idempotent: skips when GraftExtensions (or a prior
    * call) already installed them, so re-registration never logs a
    * "replaced a previously registered function" warning in
    * Bench/Verify output. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val cs = org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")
    if (!reg.functionExists(cs))
      reg.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    val cd = org.apache.spark.sql.catalyst.FunctionIdentifier("chain_dot_f32")
    if (!reg.functionExists(cd))
      reg.createOrReplaceTempFunction(
        "chain_dot_f32", exprs => ChainDotF32(exprs(0), exprs(1)), "scala_udf")
  }

  /** Oracle-portable cosine: an explicit per-index f32 product/sum
    * chain — left-associated float32 arithmetic is bit-identical in
    * Spark and DuckDB, so similarity queries can be hash-checked.
    * `a`/`b` are array-column SQL names; `dim` the fixed vector width.
    * `base` = 0 for Spark, 1 for DuckDB indexing.
    */
  def chainDot(a: String, b: String, dim: Int, base: Int): String =
    (0 until dim).map(d => s"$a[${d + base}] * $b[${d + base}]").mkString(" + ")

  def chainNorm(a: String, dim: Int, base: Int): String =
    s"sqrt(CAST(${chainDot(a, a, dim, base)} AS DOUBLE))"

  /** cosine = dot/(norm*norm), all from the deterministic f32 chains. */
  def chainCosine(a: String, b: String, dim: Int, base: Int): String =
    s"(CAST(${chainDot(a, b, dim, base)} AS DOUBLE) / " +
      s"(${chainNorm(a, dim, base)} * ${chainNorm(b, dim, base)}))"

  // ---- oracle-portable synthetic embedding ---------------------------
  // A deterministic per-row vector BOTH engines derive identically
  // from an id column, for lifecycle oracles whose corpus the loop
  // manufactures (p11): dim j's value is md5("emb:<id>:<j>") → first 4
  // hex chars as an integer v ∈ [0, 65535] → (v mod 997)/499 − 1 in
  // f64, rounded once to f32. md5 of an ASCII string is the same
  // lowercase hex in Spark and DuckDB; the hex→int fold, the mod, the
  // f64 divide/subtract and the final f32 round are all
  // required-correctly-rounded or exact integer ops — the PortableLsh
  // discipline, per ROW instead of per constant. (The engine's own
  // streaming fixtures use Spark's murmur `hash` — fine in-engine,
  // invisible to DuckDB; THIS text is the cross-engine twin.)

  /** Spark-side expression text: ARRAY<FLOAT> of `dim` values. */
  def portableSynthEmbedding(idCol: String, dim: Int): String = {
    val es = (0 until dim).map { j =>
      s"CAST(CAST(conv(substring(md5(concat('emb:', " +
        s"CAST($idCol AS STRING), ':', '$j')), 1, 4), 16, 10) AS BIGINT)" +
        s" % 997 AS DOUBLE) / CAST(499.0 AS DOUBLE) - CAST(1.0 AS DOUBLE)"
    }
    s"array(${es.map(e => s"CAST($e AS FLOAT)").mkString(", ")})"
  }

  /** DuckDB-side text for the SAME vector: LIST of FLOAT. DuckDB has
    * no base-16 `conv`, so the 4 hex chars fold through
    * `strpos('0123456789abcdef', c) − 1` — exact integer arithmetic
    * either way. */
  def portableSynthEmbeddingSql(idCol: String, dim: Int): String = {
    def hexDigit(h: String, p: Int) =
      s"(strpos('0123456789abcdef', substr($h, $p, 1)) - 1)"
    val es = (0 until dim).map { j =>
      val h = s"md5('emb:' || CAST($idCol AS VARCHAR) || ':$j')"
      val v = s"(((${hexDigit(h, 1)} * 16 + ${hexDigit(h, 2)}) * 16 + " +
        s"${hexDigit(h, 3)}) * 16 + ${hexDigit(h, 4)})"
      s"CAST(CAST($v % 997 AS DOUBLE) / CAST(499.0 AS DOUBLE) - " +
        s"CAST(1.0 AS DOUBLE) AS FLOAT)"
    }
    s"[${es.mkString(", ")}]"
  }
}
