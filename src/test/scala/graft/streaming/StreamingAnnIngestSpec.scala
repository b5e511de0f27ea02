package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.AnnIndex

/** Stream/batch parity of the maintained ANN index: replaying N
  * micro-batches through [[StreamingAnnIngest]] must annotate each
  * arriving vector with exactly the neighbors N sequential batch runs
  * of probe+append produce — and a vector ingested in batch N must be
  * findable by batch N+1 (the maintenance contract), never by its own
  * batch ("as of batch start"). */
case class IngestVec(vec_id: Long, embedding: Seq[Float])

class StreamingAnnIngestSpec extends SparkSpec {

  /** Three micro-batches built from real fixture vectors under fresh
    * ids; batch 2 carries an EXACT CLONE of a batch-1 vector, so its
    * rank-1 neighbor must be the batch-1 id — proving the appended
    * codes are live for the next probe. */
  private def batches: Seq[Seq[IngestVec]] = {
    val rows = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") >= 40 && col("vec_id") < 52)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val v = rows.toMap
    val b1 = (40L to 45L).map(i => IngestVec(1000100 + i - 40, v(i)))
    val b2 = (46L to 49L).map(i => IngestVec(1000200 + i - 46, v(i))) :+
      IngestVec(1000210L, v(40L)) // clone of batch-1's first vector
    val b3 = (50L to 51L).map(i => IngestVec(1000300 + i - 50, v(i)))
    Seq(b1, b2, b3)
  }

  private def setup(tag: String): (String, String) = {
    import spark.implicits._
    val base = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 40)
    val (index, corpus) = (s"graft_sann_$tag", s"graft_sann_${tag}_corpus")
    AnnIndex.writeAnnIndex(base, index)
    // drop catalog entry AND any orphaned location a prior JVM left
    dropTestTable(corpus)
    base.write.format("parquet").mode("overwrite").saveAsTable(corpus)
    (index, corpus)
  }

  private def neighborSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("N micro-batches == N sequential batch runs; clone found across batches") {
    import spark.implicits._
    val bs = batches

    // reference path: sequential batch probe+append
    val (bIndex, bCorpus) = setup("batch")
    val expected = bs.map(b => neighborSet(
      StreamingAnnIngest.probeAndAppend(bIndex, bCorpus, b.toDF())))

    // streaming path: same batches through foreachBatch
    val (sIndex, sCorpus) = setup("stream")
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Int)]]()
    val mem = MemoryStream[IngestVec](spark)
    val q = StreamingAnnIngest.start(spark, mem.toDF(), sIndex, sCorpus) {
      (nb, id) => got(id) = neighborSet(nb)
    }
    try {
      bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    assert(got.size == bs.size)
    got.toSeq.sortBy(_._1).map(_._2).zip(expected).zipWithIndex.foreach {
      case ((g, e), i) => assert(g == e, s"batch ${i + 1} diverged")
    }
    // maintenance: the batch-2 clone's rank-1 neighbor is its batch-1
    // original (cos = 1), NOT any same-batch vector or itself
    val rank1 = expected(1).collect { case (q, v, 1) => q -> v }.toMap
    assert(rank1(1000210L) == 1000100L,
      s"clone's rank-1 = ${rank1(1000210L)}, expected its batch-1 original")
    // "as of batch start": no batch-1 query has a batch-1 neighbor
    val b1Ids = bs.head.map(_.vec_id).toSet
    assert(expected.head.forall { case (_, v, _) => !b1Ids(v) },
      "a batch-1 vector matched a same-batch vector")
  }

  test("compact-every-batch is behavior-invisible and holds files flat") {
    import spark.implicits._
    val bs = batches
    val (bIndex, bCorpus) = setup("cbatch")
    val expected = bs.map(b => neighborSet(
      StreamingAnnIngest.probeAndAppend(bIndex, bCorpus, b.toDF())))

    val (cIndex, cCorpus) = setup("compact")
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Int)]]()
    val mem = MemoryStream[IngestVec](spark)
    val q = StreamingAnnIngest.start(spark, mem.toDF(), cIndex, cCorpus,
        compactEvery = 1) { (nb, id) => got(id) = neighborSet(nb) }
    try {
      bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got.toSeq.sortBy(_._1).map(_._2) == expected,
      "compaction changed the neighbor annotations")

    // 1 build + 3 appends would leave ≥2 files in every appended cell
    // dir; compact-after-each-batch leaves exactly one per cell
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(
        graft.operators.Generations.resolve(spark, cIndex, "cells")))
      .location
    val root = new java.io.File(new java.net.URI(loc.getPath).getPath)
    val perCell = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perCell.nonEmpty)
    perCell.foreach { case (cell, n) =>
      assert(n == 1, s"$cell has $n files after compaction")
    }
  }
}
