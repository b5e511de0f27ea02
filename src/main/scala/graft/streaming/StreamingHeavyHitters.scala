package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.{HeavyHittersAgg, MGEntry}

/** Continuous frequent-items over an unbounded stream, on the strength
  * of ONE theorem: Misra–Gries summaries are MERGEABLE (Agarwal et
  * al., PODS'12) — merging per-batch sketches preserves the ε = n/k
  * error envelope over the union, for any batching and any merge
  * order. So the streaming operator needs no state store at all:
  *
  *  - each micro-batch reduces to its own k-counter sketch (the same
  *    partial-aggregated q31 Aggregator, one tiny row out),
  *  - the sketch's entries append to a plain parquet table — ≤ k rows
  *    per batch, the stream's only persistent state, restart-safe by
  *    construction (a crashed query re-appends from its checkpointed
  *    source offsets),
  *  - [[merged]] folds all banked rows through the same pure
  *    mgMerge whenever anyone asks "what's hot so far" — cost
  *    O(batches·k) driver work on rows that are each k-bounded,
  *    decoupled from stream rate and key cardinality.
  *
  * The guarantee over the whole stream: every key whose TOTAL
  * frequency exceeds n_total/k is in the merged sketch, and every
  * reported count under-estimates by ≤ n_total/k
  * (StreamingHeavyHittersSpec replays a 3-batch stream and checks
  * both against exact whole-stream counts). */
object StreamingHeavyHitters {

  /** Start banking per-batch sketches of `key` into `table`.
    * `sink(entries, batchId)` also receives each batch's OWN sketch —
    * the per-interval hot list, which is itself a useful signal. */
  def start(spark: SparkSession, events: DataFrame, key: Column, k: Int,
      table: String)(
      sink: (Array[MGEntry], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val agg = udaf(new HeavyHittersAgg(k))
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      val spark2 = batch.sparkSession
      import spark2.implicits._
      val sketch = batch.select(key.cast("string").as("k"))
        .agg(agg(col("k")).as("hh"))
        .first().getSeq[Row](0)
        .map(r => MGEntry(r.getString(0), r.getLong(1))).toArray
      sketch.toSeq.map(e => (batchId, e.key, e.cnt))
        .toDF("batch_id", "key", "cnt")
        .write.format("parquet").mode("append").saveAsTable(table)
      sink(sketch, batchId)
    }
    events.writeStream.outputMode("append").foreachBatch(step).start()
  }

  /** The whole-stream sketch: fold every banked batch sketch through
    * the pure merge. Rows collected are ≤ batches·k — bounded by
    * stream AGE, not rate or cardinality; a long-lived deployment
    * compacts by replacing banked rows with their merge (same table,
    * same guarantee, the d14 pattern in miniature). */
  def merged(spark: SparkSession, table: String, k: Int): Array[MGEntry] = {
    val perBatch = spark.table(table)
      .collect()
      .groupBy(_.getLong(0))
      .toSeq.sortBy(_._1)
      .map(_._2.map(r => r.getString(1) -> r.getLong(2)).toMap)
    perBatch.foldLeft(Map.empty[String, Long])(HeavyHitters.mgMerge(_, _, k))
      .toSeq.sortBy { case (k2, v) => (-v, k2) }
      .map { case (k2, v) => MGEntry(k2, v) }.toArray
  }
}
