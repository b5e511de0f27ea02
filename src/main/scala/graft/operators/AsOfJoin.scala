package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY.md
  * §2.6). For each left row, attach the most recent right row with the
  * same key and right.ts <= left.ts.
  *
  * Implemented by composing built-ins (preference (a) of the custom-
  * operator ladder): union both sides, then a running
  * `last(_, ignoreNulls)` window ordered by (ts, side) per key. One
  * shuffle on the key, no range-join pair explosion — each row is
  * touched once, so the plan scales linearly where a naive range join
  * is quadratic in matches. Right rows sort before left rows at equal
  * timestamps, giving the inclusive (>=) as-of semantics DuckDB's
  * native ASOF JOIN uses — which is exactly what the oracle checks.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (prefixed `asof_`) */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lPadded = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(
      valueCols.foldLeft(r0)((df, c) => df.withColumn(s"__r_$c", col(c)))
        .select((Seq(col(key), col("__ts"), col("__side")) ++
          valueCols.map(c => col(s"__r_$c"))): _*)) { (df, c) =>
      if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lPadded.select((leftCols.map(col) ++
        Seq(col("__ts"), col("__side")) ++ valueCols.map(c => col(s"__r_$c"))): _*)
      .unionByName(rPadded, allowMissingColumns = false)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    attached.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }
}
