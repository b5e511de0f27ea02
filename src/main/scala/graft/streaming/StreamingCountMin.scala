package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CountMin

/** Continuous frequency estimation over an unbounded stream — the CMS
  * twin of [[StreamingHeavyHitters]], on an even stronger property:
  * Count-Min merge is ELEMENTWISE ADD, so the merged sketch of any
  * batching is not just within-envelope but BIT-IDENTICAL to the
  * one-shot sketch of the whole stream (the hash rows are pure
  * functions of the key; counters are sums — associative, commutative,
  * batching-invariant). StreamingCountMinSpec asserts exact equality,
  * not a bound.
  *
  *  - each micro-batch reduces to its own d×w sketch (one
  *    partial-aggregated shuffle, ≤ d·w rows out),
  *  - the rows append to a plain parquet table keyed by batch_id —
  *    the stream's only persistent state, restart-safe by
  *    construction (a crashed query re-appends from its checkpointed
  *    source offsets),
  *  - [[merged]] is a plain groupBy-sum over the bank — fully
  *    distributed, no driver fold — and feeds [[CountMin.estimate]]
  *    unchanged. A long-lived deployment compacts the bank by
  *    replacing banked rows with their sum (same table, same
  *    guarantee, the d14 pattern in miniature). */
object StreamingCountMin {

  /** Start banking per-batch d×w sketches of `key` into `table`. */
  def start(spark: SparkSession, events: DataFrame, key: Column,
      d: Int, w: Int, table: String)(
      sink: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      val sk = CountMin.sketch(
        batch.select(key.cast("string").as("k")), "k", d, w)
        .withColumn("batch_id", lit(batchId))
      sk.write.format("parquet").mode("append").saveAsTable(table)
      sink(batchId, batch.count())
    }
    events.writeStream.outputMode("append").foreachBatch(step).start()
  }

  /** The whole-stream sketch: elementwise sum of every banked batch
    * sketch — same (ri, b, c) shape the batch [[CountMin]] emits, so
    * estimates run against it unchanged. */
  def merged(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy("ri", "b").agg(sum(col("c")).as("c"))
}
