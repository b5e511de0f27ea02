package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Frontier, LexIndex}

/** Continuous ingest into the maintained lexical index — the streaming
  * twin of the s32 append path, closing the hybrid-retrieval family's
  * lifecycle the way [[StreamingNearDupIngest]]/[[StreamingGraphIngest]]
  * close theirs: a corpus stream lands as per-batch postings appends,
  * and retrieval (the s31 probe) answers against the maintained index
  * BETWEEN batches with batch-N freshness — the reference's
  * continuous-consume loop (`/root/reference/src/service.py:100-150`)
  * with the in-process rolling state replaced by the persisted
  * artifact a 100 TB corpus requires.
  *
  * Shape: `foreachBatch` — each micro-batch needs catalog-table work
  * no continuous operator expresses (a bucket-aligned append, a probe
  * against a catalog table, optionally a generation swap), and its
  * strict sequencing IS the single-writer maintenance contract.
  * Per batch the work is batch-sized: one tokenize of the delivery +
  * three bucket-aligned appends; the corpus-sized postings are never
  * rewritten outside compaction.
  *
  * Replay safety: appends run `ifAbsent = true` keyed by the
  * micro-batch id, so foreachBatch's at-least-once redelivery
  * converges instead of double-counting (LexIndexSpec's crash matrix;
  * the stats-delta fence is per batch id).
  *
  * `queries` (a static (doc_id, text) frame) makes the loop
  * probe-after-append: `sink` receives each batch's lexical top-k
  * (freshness contract — batch N's docs are retrievable the moment
  * batch N commits). With no queries the sink receives the batch
  * back as an ingest acknowledgment.
  *
  * `compactEvery = n` folds the compaction step in after every n-th
  * batch, holding file counts flat in stream AGE. When a compaction
  * runs in the same callback, the sink's probe frame is PINNED first:
  * lazily evaluated, it resolves the pre-swap generation, which a
  * `gcKeep = 1` compaction reclaims in this very callback — an async
  * sink would otherwise read dropped tables (the
  * StreamingGraphIngest lesson). */
object StreamingLexIngest {

  def start(spark: SparkSession, docs: DataFrame, indexName: String,
      queries: Option[DataFrame] = None, kEach: Int = 10,
      compactEvery: Int = 0)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      // the batch feeds the tokenize AND (absent queries) the sink —
      // pin it so the source offsets are read once
      val b = batch.persist()
      try {
        val s = b.sparkSession
        LexIndex.appendToLexIndex(b.toDF(), indexName,
          batchId = s"stream-$batchId", ifAbsent = true)
        val willCompact =
          compactEvery > 0 && (batchId + 1) % compactEvery == 0
        val out = queries match {
          case Some(q) => LexIndex.probeLexIndex(s, indexName, q, kEach)
          case None => b.toDF()
        }
        sink(if (willCompact) Frontier.pin(out) else out, batchId)
        if (willCompact) LexIndex.compactLexIndex(s, indexName)
      } finally b.unpersist()
    }
    docs.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
