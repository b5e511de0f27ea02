package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Cdc, Frontier}

/** Continuous CDC consumption: a change-log stream folds into a
  * maintained snapshot table, one micro-batch at a time — the
  * Debezium-consumer shape, and the q36 MERGE as a LOOP instead of a
  * one-shot (the same batch→maintained-artifact promotion d13 makes
  * for the near-dup index and p05 for the shard layout).
  *
  * `foreachBatch` again, for the same two reasons as
  * [[StreamingNearDupIngest]]: each micro-batch needs batch-only
  * actions (read a catalog table, overwrite it), and micro-batches run
  * strictly sequentially — batch N+1 applies against the snapshot
  * batch N produced. The applied frame is [[Frontier.pin]]ned before
  * the overwrite: the pin cuts the plan's lineage back to the table
  * being replaced, which is what makes overwrite-what-you-read legal,
  * and in reliable mode makes the swap survive executor loss.
  *
  * Batching-invariance (StreamingCdcApplySpec): because upsert does
  * not distinguish insert from update, a key's final state depends
  * only on its LATEST change — so replaying the log in N micro-batches
  * lands the snapshot exactly where the one-shot q36 apply does, for
  * ANY batching that keeps each key's changes in `seqCol` order across
  * batch boundaries (a CDC log's own delivery guarantee; within a
  * batch, order is free — [[Cdc.applyChanges]] resolves by `seqCol`).
  *
  * Scale: per batch, cost = one snapshot scan + the (tiny) log
  * aggregation + the rewrite. The rewrite is the honest cost of
  * plain-parquet snapshots — at 100 TB you shard it (partition the
  * snapshot on a key range and overwrite only partitions with changes,
  * the p05 dynamic-partition-overwrite pattern; the MERGE arithmetic
  * here is unchanged). */
object StreamingCdcApply {

  /** One turn of the loop as a plain function — shared by the stream
    * and any batch scheduler: apply `changes` to `snapTable`, swap the
    * table in place, return the applied row count. Runs in the change
    * frame's OWN session so the overwrite refreshes the cache the next
    * read uses. */
  def applyAndSwap(snapTable: String, changes: DataFrame,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): Long = {
    val spark = changes.sparkSession
    val applied = Frontier.pin(Cdc.applyChanges(
      spark.table(snapTable), changes, keyCols, seqCol, opCol))
    applied.write.format("parquet").mode("overwrite").saveAsTable(snapTable)
    spark.catalog.refreshTable(snapTable)
    applied.count()
  }

  /** Start folding a streaming change log into `snapTable`. */
  def start(spark: SparkSession, changes: DataFrame, snapTable: String,
      keyCols: Seq[String], seqCol: String = "seq", opCol: String = "op")(
      sink: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      sink(batchId, applyAndSwap(snapTable, batch, keyCols, seqCol, opCol))
    changes.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
