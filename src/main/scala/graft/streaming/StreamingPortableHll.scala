package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.PortableHll

/** Continuous distinct-counting over an unbounded stream — the HLL
  * member of the streaming-sketch family ([[StreamingCountMin]],
  * [[StreamingHeavyHitters]]), on the STRONGEST merge property of the
  * three: HLL registers merge by per-bucket MAX, which is associative,
  * commutative and IDEMPOTENT. Bit-identity therefore holds not just
  * for any batching of the stream (CMS's add gives that too) but for
  * any AT-LEAST-ONCE replay of it — a crashed foreachBatch that
  * re-banks its last batch cannot move a single register, so the
  * banked state needs no replay fence at all (the spec re-banks a
  * batch on purpose and asserts the estimate unchanged).
  *
  *  - each micro-batch reduces to ≤ m register rows (one
  *    partial-aggregated shuffle — max is map-side combinable),
  *  - rows append to a plain parquet bank keyed by batch_id (the
  *    stream's only persistent state, restart-safe by construction),
  *  - [[merged]] is a groupBy-max over the bank — fully distributed —
  *    and [[estimate]] applies [[PortableHll]]'s closed form, so the
  *    streamed estimate is BIT-IDENTICAL to the one-shot batch
  *    estimate of the same rows (and still hash-reproducible in
  *    DuckDB, q16's portability). A long-lived deployment compacts
  *    the bank by replacing banked rows with their per-bucket max
  *    (the d14 pattern in miniature). */
object StreamingPortableHll {

  /** Start banking per-batch HLL registers of `key` into `table`.
    * `sink(batchId, rowCount)` is an OPTIONAL per-batch metrics hook;
    * when absent, the batch is consumed exactly once (no row count is
    * computed — on a real source a second action would re-read the
    * whole micro-batch for a discarded metric), and when present the
    * batch is cached across the two actions for the same reason. */
  def start(spark: SparkSession, events: DataFrame, key: Column,
      table: String,
      sink: Option[(Long, Long) => Unit] = None): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      val b = if (sink.isDefined) batch.persist() else batch
      try {
        PortableHll.registers(b.select(key.as("k")), "k")
          .withColumn("batch_id", lit(batchId))
          .write.format("parquet").mode("append").saveAsTable(table)
        sink.foreach(_(batchId, b.count()))
      } finally if (sink.isDefined) { b.unpersist(); () }
    }
    events.writeStream.outputMode("append").foreachBatch(step).start()
  }

  /** The whole-stream register table: per-bucket max over every banked
    * batch — same (bucket, m) shape the batch sketch emits. */
  def merged(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy("bucket").agg(max(col("m")).as("m"))

  /** The whole-stream distinct estimate (one row, column `alias`). */
  def estimate(spark: SparkSession, table: String,
      alias: String): DataFrame =
    PortableHll.estimateFromRegisters(merged(spark, table), alias)
}
