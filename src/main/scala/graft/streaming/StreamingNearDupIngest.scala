package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Frontier}

/** Continuous near-dup ingest against the PERSISTED index: the
  * streaming composition of the d12 probe and the d13 append — the
  * reference's continuous-ingest loop (a service that consumes a
  * stream, dedups each delivery against its rolling window, and admits
  * what survives — `/root/reference/src/service.py:100-150` with the
  * window machinery of `/root/reference/src/nats_client.py:246-260`)
  * re-expressed over Structured Streaming and a bucketed table index.
  *
  * Shape: `foreachBatch` — the right Spark tool here, because each
  * micro-batch needs two BATCH actions no continuous operator
  * expresses (a join against a catalog table and a bucketed table
  * append), and foreachBatch runs micro-batches strictly sequentially,
  * which is exactly the maintenance contract: batch N+1's probe sees
  * batch N's appended survivors. Per micro-batch the work is
  * batch-sized (signature scan + bucket-aligned probe + append);
  * the corpus-sized index is never re-shuffled or rewritten — so
  * state grows on DISK with the survivor count, not in streaming
  * state stores, and the executor memory footprint is flat in stream
  * length.
  *
  * Within one micro-batch the semantics are
  * [[Dedup.incrementalNearDupSurvivorsIndexed]]'s: duplicates OF THE
  * INDEX drop, within-batch duplicates both survive (and both get
  * appended — the next batch dedups against them). Replaying N
  * micro-batches is therefore IDENTICAL to N sequential batch runs of
  * probe+append — StreamingNearDupIngestSpec replays both paths and
  * asserts per-batch survivor equality.
  */
object StreamingNearDupIngest {

  /** One night's turn of the loop as a plain function — shared by the
    * streaming query below and any batch scheduler: probe the index,
    * append the survivors, return them (pinned, so the append and the
    * caller's sink read one materialization).
    *
    * Everything runs in the BATCH FRAME'S OWN session (inside
    * foreachBatch that is the per-query streaming session, a clone of
    * the user's): probe and append must share a session so the
    * append's table-cache refresh invalidates the very cache the next
    * probe reads — an append issued from one session leaves another
    * session's cached file listing of the index tables stale, and a
    * stale probe silently re-admits duplicates. */
  def probeAndAppend(indexName: String, batch: DataFrame,
      k: Int = 5, minJ: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    val survIds = Dedup.incrementalNearDupSurvivorsIndexed(
      spark, indexName, batch, k, minJ)
    val survivors = Frontier.pin(batch.join(survIds, "doc_id"))
    Dedup.appendToNearDupIndex(survivors, indexName, k)
    survivors
  }

  /** Start the continuous ingest over a streaming (doc_id, text, ...)
    * frame. `sink(survivors, batchId)` receives each micro-batch's
    * surviving rows (already appended to the index) — write them to
    * the kept-corpus table, a queue, etc.
    *
    * `compactEvery = n` folds the third lifecycle step into the loop:
    * after every n-th micro-batch the index is compacted
    * ([[Dedup.compactNearDupIndex]]) — without it, a long-running
    * ingest accretes one file set per batch per bucket and the probe's
    * listing/open costs creep up with stream AGE rather than stream
    * rate. foreachBatch's strict sequencing makes the rewrite safe
    * mid-stream: no probe is in flight while the tables swap, and the
    * next batch re-resolves them through the (refreshed) catalog.
    * Compaction is behavior-invisible, so parity with sequential
    * batch runs is unchanged (StreamingNearDupIngestSpec replays both
    * paths with compaction on). */
  def start(spark: SparkSession, docs: DataFrame, indexName: String,
      k: Int = 5, minJ: Double = 0.5, compactEvery: Int = 0)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      // cache: the batch feeds the signature scan AND the survivor
      // join-back; without the pin a re-evaluation could re-read the
      // source offsets
      val b = batch.persist()
      try {
        sink(probeAndAppend(indexName, b.toDF(), k, minJ), batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          Dedup.compactNearDupIndex(b.sparkSession, indexName)
      } finally b.unpersist()
    }
    docs.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
