package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

/** The portable LSH's two load-bearing identities (s03's hash-exact
  * oracle row stands on both):
  *
  *  1. the NATIVE fast path (`chain_dot_f32` against a ±1 sign
  *     vector) is bit-identical to the ±chain expression TEXT the
  *     DuckDB oracle replays — for every (table, plane) over every
  *     fixture vector, and for the self-dot the norm derives from;
  *  2. the Scala-side md5 sign derivation agrees with the ENGINE's
  *     md5 — the signs baked into the oracle text really are
  *     "md5(lsh:t:p:d)" as documented, not a JVM-private RNG.
  */
class PortableLshSpec extends SparkSpec {

  private val emb = Tables(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  test("chain_dot_f32 against a sign vector is bit-identical to the ±chain text") {
    VectorFunctions.register(spark)
    val dim = 64
    // every (t, p) plane at the production geometry, every fixture row:
    // the fused float loop and the 64-node ±chain must agree on the
    // BITS (casting both to their raw float — NaN-safe via <=>)
    val checks = for {
      t <- 0 until PortableLsh.Tables
      p <- 0 until PortableLsh.Planes
    } yield {
      val chain = expr(s"(${PortableLsh.projExpr("embedding", t, p, dim, 0)})")
      val native = call_function("chain_dot_f32", col("embedding"),
        typedLit(PortableLsh.signVector(t, p, dim)))
      sum(when(chain <=> native, 0).otherwise(1)).as(s"neq_${t}_$p")
    }
    val row = emb.agg(checks.head, checks.tail: _*).head()
    (0 until checks.size).foreach(i =>
      assert(row.getLong(i) == 0L, s"plane ${i / 4}:${i % 4} diverged"))
    // the self-dot (the norm's input) is the same chain with b = a
    val selfNeq = emb.agg(sum(when(
        expr(s"(${VectorFunctions.chainDot("embedding", "embedding", dim, 0)})")
          <=> call_function("chain_dot_f32", col("embedding"), col("embedding")),
        0).otherwise(1)).as("neq")).head().getLong(0)
    assert(selfNeq == 0L, "self-dot diverged from the chain text")
  }

  test("the Scala md5 sign derivation matches the engine's md5") {
    // the oracle bakes PortableLsh.sign's output into its text; this
    // pins that the Scala MessageDigest derivation and the ENGINE md5
    // agree on every (t, p, d) of the production geometry — i.e. the
    // documented definition ("high bit of md5('lsh:t:p:d')") is the
    // one actually shipped, in-engine
    import spark.implicits._
    val triples = for {
      t <- 0 until PortableLsh.Tables
      p <- 0 until PortableLsh.Planes
      d <- 0 until 64
    } yield (t, p, d, PortableLsh.sign(t, p, d))
    val df = triples.toDF("t", "p", "d", "scala_sign")
      .withColumn("engine_sign",
        when(expr("substring(md5(concat('lsh:', t, ':', p, ':', d)), 1, 1)")
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1).otherwise(-1))
    assert(df.filter(col("scala_sign") =!= col("engine_sign")).isEmpty,
      "Scala-side md5 signs disagree with the engine's md5")
    // and the family is reasonably balanced (a degenerate all-+1 set
    // would silently collapse every vector into one bucket per table)
    val plus = triples.count(_._4 > 0)
    assert(plus > triples.size / 4 && plus < 3 * triples.size / 4,
      s"sign family badly unbalanced: $plus of ${triples.size} positive")
  }

  test("multiprobe recall at the production point stays above the s05 floor") {
    val bf = Similarity.bruteForceTopK(spark, emb, col("vec_id") < 8, 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, emb, col("vec_id") < 8, 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"portable-hyperplane recall=$recall")
  }

  // r12 ADVICE: a ragged embedding must surface as NULL on BOTH
  // engines (DuckDB's fixed-dim chain indexes out of range → NULL),
  // never as a silently truncated finite Spark score — malformed data
  // fails fast instead of becoming a cross-engine divergence.
  test("chain_dot_f32 is NULL on length mismatch, exact on equal lengths") {
    VectorFunctions.register(spark)
    val rows = spark.sql("""SELECT
        chain_dot_f32(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
                      CAST(array(3.0) AS ARRAY<FLOAT>)) AS ragged,
        chain_dot_f32(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
                      CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS ok,
        chain_dot_f32(CAST(array() AS ARRAY<FLOAT>),
                      CAST(array() AS ARRAY<FLOAT>)) AS empty""").head()
    assert(rows.isNullAt(0), "ragged arrays must score NULL")
    assert(rows.getFloat(1) == 11.0f)
    assert(rows.getFloat(2) == 0.0f)
    // and the interpreted (non-codegen) path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit2 = Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType))
    val lit1 = Literal.create(Array(3.0f), ArrayType(FloatType))
    assert(graft.functions.ChainDotF32(lit2, lit1).eval(null) == null)
    assert(graft.functions.ChainDotF32(lit2, lit2).eval(null) == 5.0f)
  }
}
