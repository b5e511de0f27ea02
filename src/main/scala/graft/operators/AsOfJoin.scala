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

  /** @param valueCols right-side columns to carry (prefixed `asof_`)
    *
    * The right side travels as ONE struct column so every `asof_*`
    * value comes from the same matched right row — per-column
    * `last(ignoreNulls)` windows would each skip back independently
    * past a NULL field, stitching together fields of different right
    * rows (diverging from ASOF semantics, which return the matched
    * row's NULL). */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val lPadded = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rPadded = leftCols.foldLeft(
      right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__r"))) { (df, c) =>
      if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val ordered = leftCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__r"))
    val unioned = lPadded.select(ordered: _*)
      .unionByName(rPadded.select(ordered: _*), allowMissingColumns = false)
    // __r as the final sort key makes right-vs-right timestamp ties
    // deterministic (field-wise struct comparison): the matched row is
    // max by (ts, value struct), every run and partitioning. Left rows
    // (__r null) are separated by __side already.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__m.$c").as(s"asof_$c"))): _*)
  }
}
