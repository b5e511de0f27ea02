package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet fixture loaders (TESTDATA.md). One parquet file per table.
  *
  * At 100 TB these reads become multi-file partitioned scans; everything
  * here goes through `spark.read.parquet` so predicate pushdown, column
  * pruning and partition pruning apply unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a long only
    // under spark.sql.legacy.parquet.nanosAsLong (set by our sessions).
    // Truncate to micros — same floor DuckDB applies when loading nanos.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all fixtures as temp views named after the table, so
    * `spark.sql` queries can reference them like the DuckDB oracle does. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
