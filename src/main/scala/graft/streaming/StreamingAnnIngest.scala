package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{AnnIndex, Frontier}

/** Continuous similarity-search ingest against the PERSISTED ANN
  * index: the streaming composition of the s09 probe and append — the
  * same maintained-artifact loop [[StreamingNearDupIngest]] runs for
  * the near-dup index (the reference's continuous-ingest shape,
  * `/root/reference/src/service.py:100-150`), applied to the vector
  * side of the house. Each arriving vector is annotated with its
  * top-k neighbors among EVERYTHING PREVIOUSLY INGESTED, then becomes
  * part of the index the next batch probes — the retrieval-during-
  * ingest contract of a production vector store.
  *
  * Shape: `foreachBatch`, for the same reasons as the near-dup loop —
  * each micro-batch needs batch-only actions (a catalog-table join
  * with dynamic partition pruning, a partitioned-table append), and
  * foreachBatch's strict sequencing IS the maintenance contract:
  * batch N+1's probe sees batch N's appended codes. Per micro-batch
  * the work is batch-sized (encode the batch with the frozen model,
  * scan nprobe cells per query, re-rank a bounded shortlist); the
  * index is never rebuilt, and no streaming state store is involved —
  * state lives on DISK as the index + corpus tables, so executor
  * memory is flat in stream length.
  *
  * Semantics within a batch: queries are the batch's vectors; the
  * index holds only PRIOR vectors, so batch members never match each
  * other or themselves — "neighbors as of batch start". Replaying N
  * micro-batches is therefore IDENTICAL to N sequential batch runs of
  * probe+append (StreamingAnnIngestSpec replays both paths).
  */
object StreamingAnnIngest {

  /** One turn of the loop as a plain function — probe the index with
    * the batch, append the batch's codes (frozen-model encode) and its
    * raw vectors (to `corpusTable` — a PQ index stores codes; re-rank
    * and future probes need the f32 vectors somewhere), return the
    * neighbor annotations. The probe result is pinned BEFORE the
    * appends: it is lazy, and a post-append evaluation would see the
    * batch's own codes in the index — self-matches the "as of batch
    * start" contract forbids. Runs in the batch frame's own session
    * (the foreachBatch clone) so the appends' cache refreshes
    * invalidate the very table caches the next probe reads. */
  def probeAndAppend(indexName: String, corpusTable: String,
      batch: DataFrame, k: Int = 10, nprobe: Int = 4,
      shortlist: Int = 60): DataFrame = {
    val spark = batch.sparkSession
    val corpus = spark.table(corpusTable)
    val neighbors = Frontier.pin(AnnIndex.probeQueries(spark, indexName,
      batch, corpus.unionByName(batch), k, nprobe, shortlist))
    AnnIndex.appendToAnnIndex(batch, indexName)
    batch.select("vec_id", "embedding")
      .write.format("parquet").mode("append").saveAsTable(corpusTable)
    spark.catalog.refreshTable(corpusTable)
    neighbors
  }

  /** Start the continuous ingest over a streaming (vec_id, embedding)
    * frame. `sink(neighbors, batchId)` receives each batch's neighbor
    * annotations (qid = the arriving vector, vec_id/rank/cos = its
    * top-k among prior ingest). `compactEvery = n` folds
    * [[AnnIndex.compactAnnIndex]] into the loop after every n-th
    * batch — without it each cell directory gains one file per batch
    * and probe listing cost grows with stream AGE. foreachBatch's
    * sequencing makes the swap safe: no probe is in flight while the
    * table renames, and the next batch re-resolves it through the
    * refreshed catalog. Compaction is behavior-invisible (same rows,
    * same partitioning), so parity with sequential batch runs holds
    * with it on — the spec replays both paths that way. */
  def start(spark: SparkSession, vecs: DataFrame, indexName: String,
      corpusTable: String, k: Int = 10, nprobe: Int = 4,
      shortlist: Int = 60, compactEvery: Int = 0)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      // the batch feeds the probe (queries + re-rank union) AND two
      // appends — pin it so the source offsets are read once
      val b = batch.persist()
      try {
        sink(probeAndAppend(indexName, corpusTable, b.toDF(),
          k, nprobe, shortlist), batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          AnnIndex.compactAnnIndex(b.sparkSession, indexName)
      } finally b.unpersist()
    }
    vecs.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
