package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{Generations, KnnGraphIndex}

/** Stream/batch parity of the MAINTAINED k-NN graph (the r11 ask:
  * the graph was the one maintained index without a dedicated parity
  * spec): replaying N micro-batches through [[StreamingGraphIngest]]
  * must leave the graph — and each batch's emitted neighborhoods —
  * exactly as N sequential [[KnnGraphIndex.appendToKnnGraph]] runs do,
  * a batch-2 CLONE of a batch-1 vector must find its batch-1 original
  * at rank 1 (the appended edges are live for the next batch), and
  * folding compaction into the stream must change nothing. */
case class GraphVec(vec_id: Long, embedding: Seq[Float])

class StreamingGraphIngestSpec extends SparkSpec {

  /** Three micro-batches of real fixture vectors under fresh ids;
    * batch 2 carries an exact clone of a batch-1 vector. */
  private def batches: Seq[Seq[GraphVec]] = {
    val v = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") >= 40 && col("vec_id") < 52)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b1 = (40L to 45L).map(i => GraphVec(1000100 + i - 40, v(i)))
    val b2 = (46L to 49L).map(i => GraphVec(1000200 + i - 46, v(i))) :+
      GraphVec(1000210L, v(40L)) // clone of batch-1's first vector
    val b3 = (50L to 51L).map(i => GraphVec(1000300 + i - 50, v(i)))
    Seq(b1, b2, b3)
  }

  /** A fresh graph over the base corpus; nprobe = nCells so the
    * maintained graph is EXACT and parity divergence cannot hide
    * behind approximation. */
  private def build(name: String): Unit =
    KnnGraphIndex.writeKnnGraph(
      Tables(spark, sf, "embeddings")
        .select("vec_id", "embedding").filter(col("vec_id") < 40),
      name, k = 5, nCells = 8, nprobe = 8, edgeBuffer = 4)

  private def nbSet(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def fullProbe(name: String) =
    nbSet(KnnGraphIndex.probeKnnGraph(spark, name))

  test("N micro-batches == N sequential appends; batch-2 clone finds its batch-1 original") {
    import spark.implicits._
    val bs = batches

    // reference path: sequential append+probe
    build("graft_sgi_batch")
    val expected = bs.map(b => nbSet(
      StreamingGraphIngest.appendAndProbe("graft_sgi_batch", b.toDF())))

    // streaming path: same batches through foreachBatch
    build("graft_sgi_stream")
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Int)]]()
    val mem = MemoryStream[GraphVec](spark)
    val q = StreamingGraphIngest.start(spark, mem.toDF(),
      "graft_sgi_stream") { (nb, id) => got(id) = nbSet(nb) }
    try {
      bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    assert(got.size == bs.size)
    got.toSeq.sortBy(_._1).map(_._2).zip(expected).zipWithIndex.foreach {
      case ((g, e), i) => assert(g == e, s"batch ${i + 1} diverged")
    }
    // and the WHOLE graphs agree, not just the emitted slices
    assert(fullProbe("graft_sgi_stream") == fullProbe("graft_sgi_batch"),
      "stream-built and batch-built graphs diverged")
    // maintenance: the batch-2 clone's rank-1 neighbor is its batch-1
    // original — the appended edges were live for the next batch
    val rank1 = expected(1).collect { case (q, v, 1) => q -> v }.toMap
    assert(rank1(1000210L) == 1000100L,
      s"clone's rank-1 = ${rank1(1000210L)}, expected its batch-1 original")
    // graph semantic (as-of-batch-END, unlike the ANN loop): batch-1
    // members DO see same-batch neighbors — the append scores old ∪ new
    val b1Ids = bs.head.map(_.vec_id).toSet
    assert(expected.head.exists { case (q, v, _) => b1Ids(q) && b1Ids(v) },
      "expected same-batch edges in the graph's batch-end semantic")
  }

  test("compact-every-batch (with a resize) is behavior-invisible; edge lists stay tight") {
    import spark.implicits._
    val bs = batches
    build("graft_sgi_cref")
    val expected = bs.map(b => nbSet(
      StreamingGraphIngest.appendAndProbe("graft_sgi_cref", b.toDF())))

    build("graft_sgi_compact")
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Int)]]()
    val mem = MemoryStream[GraphVec](spark)
    val q = StreamingGraphIngest.start(spark, mem.toDF(),
        "graft_sgi_compact", compactEvery = 1) {
      (nb, id) => got(id) = nbSet(nb)
    }
    try {
      bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toSeq.sortBy(_._1).map(_._2) == expected,
      "in-stream compaction changed the emitted neighborhoods")
    assert(fullProbe("graft_sgi_compact") == fullProbe("graft_sgi_cref"),
      "in-stream compaction changed the graph")
    // compaction re-tightened: ≤ k + edgeBuffer rows per qid
    import spark.implicits._
    val maxPerQid = spark.table(
        Generations.resolve(spark, "graft_sgi_compact", "edges"))
      .groupBy("qid").count().agg(max("count")).as[Long].head()
    assert(maxPerQid <= 9, s"stream compaction left $maxPerQid rows on a qid")
    // and a mid-stream RESIZE composes: rebucket, probe unchanged
    KnnGraphIndex.compactKnnGraph(spark, "graft_sgi_compact",
      numBuckets = Some(16))
    assert(fullProbe("graft_sgi_compact") == fullProbe("graft_sgi_cref"),
      "a post-stream resize changed the graph")
  }
}
