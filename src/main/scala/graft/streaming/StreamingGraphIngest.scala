package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.KnnGraphIndex

/** Continuous ingest into the MAINTAINED k-NN graph — the graph member
  * of the streaming-ingest family ([[StreamingNearDupIngest]],
  * [[StreamingAnnIngest]]): each arriving micro-batch appends to the
  * persisted graph (its vectors gain forward edges, stored vectors
  * gain reverse edges toward it) and the batch's own neighborhoods are
  * emitted. The nightly loop ([[StreamingNightlyIngest]]) already
  * advances an opt-in graph as one of six artifacts; this is the
  * graph's STANDALONE loop, so its stream/batch parity is pinned by a
  * dedicated spec (StreamingGraphIngestSpec) exactly as the other two
  * maintained indexes have, instead of only by existence inside the
  * composed pipeline.
  *
  * Shape: `foreachBatch` — per batch the work is batch-sized
  * ([[KnnGraphIndex.appendToKnnGraph]]'s broadcast-batch candidate
  * generation; the corpus-sized tables stream in place), the append is
  * replay-fenced (vecs is the applied marker), and foreachBatch's
  * strict sequencing is the maintenance contract: batch N+1's append
  * and probe see batch N's edges. No streaming state store — state is
  * the graph family on disk, so executor memory is flat in stream
  * length.
  *
  * Semantics differ from the ANN loop deliberately: the graph is an
  * artifact over ALL vectors, and an append scores the batch against
  * old ∪ new — so batch members CAN be each other's neighbors
  * ("as of batch END", where the ANN ingest's probe-before-append is
  * "as of batch start"). Replaying N micro-batches is identical to N
  * sequential [[KnnGraphIndex.appendToKnnGraph]] runs; the spec
  * replays both paths and compares probes per batch.
  */
object StreamingGraphIngest {

  /** Past this many distinct batch ids the probe predicate would blow
    * the plan up as an IN-literal list — switch to a broadcast
    * semi-join over the full probe (the `Sharding` >10k discipline). */
  private val InListMax = 10000

  /** One turn of the loop as a plain function — append the batch to
    * the graph (replay-fenced), then return the batch's own top-k
    * neighborhoods from the stored edges. The probe runs AFTER the
    * append (the graph's as-of-batch-end semantic above). The id
    * slice rides the probe predicate, so it pushes into the
    * bucketed+sorted edge scan (the s28 row-group-pruned shape); a
    * jumbo batch falls back to a broadcast semi-join. */
  def appendAndProbe(graphName: String, batch: DataFrame,
      ifAbsent: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    KnnGraphIndex.appendToKnnGraph(batch, graphName, ifAbsent)
    // over-budget batches (a catch-up burst after downtime) detect via
    // limit(max+1) without materializing every id on the driver — the
    // same discipline as Dedup's probe-key collection
    val ids = batch.select("vec_id").distinct()
      .limit(InListMax + 1).collect().map(_.getLong(0))
    if (ids.length <= InListMax)
      KnnGraphIndex.probeKnnGraph(spark, graphName,
        col("qid").isin(ids.map(Long.box): _*))
    else
      KnnGraphIndex.probeKnnGraph(spark, graphName)
        .join(broadcast(batch.select(col("vec_id").as("qid")).distinct()),
          Seq("qid"), "left_semi")
  }

  /** Start the continuous ingest over a streaming (vec_id, embedding)
    * frame against an EXISTING graph family (build it with
    * [[KnnGraphIndex.writeKnnGraph]] first — the quantizer trains at
    * build time, appends assign against it). `sink(neighbors,
    * batchId)` receives each batch's neighborhoods. `compactEvery = n`
    * folds [[KnnGraphIndex.compactKnnGraph]] in after every n-th
    * batch — re-tightening edge lists to k + edgeBuffer and collapsing
    * per-append files; the swap is reader-safe and behavior-invisible,
    * so parity with sequential runs holds with it on (the spec replays
    * both paths that way). */
  def start(spark: SparkSession, vecs: DataFrame, graphName: String,
      compactEvery: Int = 0)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      // the batch feeds the append's candidate generation AND the
      // probe slice — pin it so the source offsets are read once
      val b = batch.persist()
      try {
        val willCompact =
          compactEvery > 0 && (batchId + 1) % compactEvery == 0
        // when THIS callback will also compact, the sink's frame is
        // PINNED first: the lazy neighborhoods resolve the pre-swap
        // generation, and with gcKeep = 1 the compaction reclaims it
        // in the same callback — a sink that defers evaluation (an
        // async writer) would otherwise read dropped tables
        val nb = appendAndProbe(graphName, b.toDF())
        sink(if (willCompact) graft.operators.Frontier.pin(nb) else nb,
          batchId)
        if (willCompact)
          KnnGraphIndex.compactKnnGraph(b.sparkSession, graphName)
      } finally b.unpersist()
    }
    vecs.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
