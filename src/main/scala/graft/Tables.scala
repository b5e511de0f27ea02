package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // Normalize events.ts to session-tz TIMESTAMP whatever the fixture
    // generation wrote. Earlier rounds shipped TIMESTAMP(NANOS) (read
    // as long under spark.sql.legacy.parquet.nanosAsLong, truncated to
    // micros — the floor DuckDB applies); current fixtures are naive
    // micros, which Spark 4 reads as TIMESTAMP_NTZ — cast under the
    // UTC session so values match DuckDB's naive read bit-for-bit.
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }

  /** Register all fixtures as temp views named after the table, so
    * `spark.sql` queries can reference them like the DuckDB oracle does. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
