package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** Stream/batch parity of the maintained near-dup index: replaying N
  * micro-batches through [[StreamingNearDupIngest]] must admit exactly
  * the docs that N sequential batch runs of probe+append admit — the
  * multi-ingest maintenance contract under `readStream`. */
case class IngestDoc(doc_id: Long, text: String)

class StreamingNearDupIngestSpec extends SparkSpec {

  // three nights of ingest: night 1 = corpus replays (drop) + fresh
  // (survive + append); night 2 = copies of night-1 fresh (drop iff
  // the append landed) + new fresh; night 3 = copies of night-2 fresh
  // (same, one generation later) + corpus replays (original index
  // entries still live)
  private def nights: Seq[Seq[IngestDoc]] = {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def fresh(idBase: Long, tag: String, n: Int) = (0 until n).map(i =>
      IngestDoc(idBase + i, s"wholly fresh $tag document number $i carrying" +
        s" distinct vocabulary ${tag}a ${tag}b ${tag}c ${tag}d ${tag}e" +
        s" ${tag}f ${tag}g ${tag}h"))
    val n1 = docs.take(5).map { case (id, t) =>
      IngestDoc(id + 1000000000L, t + " zz edit marker token pad") } ++
      fresh(1000000100L, "alpha", 4)
    val n2 = fresh(1000000100L, "alpha", 4).map(d =>
      d.copy(doc_id = d.doc_id + 1000L)) ++ fresh(1000000200L, "beta", 3)
    val n3 = fresh(1000000200L, "beta", 3).map(d =>
      d.copy(doc_id = d.doc_id + 1000L)) ++
      docs.slice(5, 10).map { case (id, t) =>
        IngestDoc(id + 2000000000L, t + " zz edit marker token pad") } ++
      fresh(1000000300L, "gamma", 2)
    Seq(n1, n2, n3)
  }

  test("N micro-batches == N sequential batch runs of probe+append") {
    import spark.implicits._
    val corpus = Tables(spark, sf, "documents").select("doc_id", "text")
    val batches = nights

    // reference path: sequential BATCH probe+append on its own index
    Dedup.writeNearDupIndex(corpus, "graft_snd_batch", numBuckets = 4)
    val expected = batches.map { b =>
      StreamingNearDupIngest.probeAndAppend("graft_snd_batch",
          b.toDF()).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }

    // streaming path: same nights as micro-batches through foreachBatch
    Dedup.writeNearDupIndex(corpus, "graft_snd_stream", numBuckets = 4)
    val got = scala.collection.mutable.Map[Long, Set[Long]]()
    val mem = MemoryStream[IngestDoc](spark)
    val q = StreamingNearDupIngest.start(spark, mem.toDF(),
        "graft_snd_stream") { (surv, id) =>
      got(id) = surv.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(got.size == batches.size, s"expected ${batches.size} batches, got $got")
    got.toSeq.sortBy(_._1).map(_._2).zip(expected).zipWithIndex.foreach {
      case ((g, e), i) => assert(g == e, s"night ${i + 1}: stream=$g batch=$e")
    }
    // the fixture exercised all three maintenance properties: fresh
    // docs survived, next-generation copies dropped, replays dropped
    assert(expected.head.size == 4)
    assert(expected(1).size == 3, expected(1).toString)
    assert(expected(2).size == 2, expected(2).toString)

    // ---- full lifecycle: probe + append + compact-every-batch -------
    // compaction mid-stream must be behavior-invisible (same survivors
    // per night) while holding the file count flat in stream age
    def indexFiles(name: String): Int =
      Seq(graft.operators.Generations.resolve(spark, name, "buckets"),
          graft.operators.Generations.resolve(spark, name, "sigs")).map { t =>
        val loc = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(t)).location
        Option(new java.io.File(new java.net.URI(loc.getPath).getPath)
          .listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
      }.sum
    Dedup.writeNearDupIndex(corpus, "graft_snd_compact", numBuckets = 4)
    val gotC = scala.collection.mutable.Map[Long, Set[Long]]()
    val memC = MemoryStream[IngestDoc](spark)
    val qc = StreamingNearDupIngest.start(spark, memC.toDF(),
        "graft_snd_compact", compactEvery = 1) { (surv, id) =>
      gotC(id) = surv.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    try {
      batches.foreach { b =>
        memC.addData(b: _*)
        qc.processAllAvailable()
      }
    } finally qc.stop()
    assert(gotC.toSeq.sortBy(_._1).map(_._2) == expected,
      s"compaction changed survivors: $gotC vs $expected")
    // 1 build + 3 appends would be ≥4 file sets per table without
    // compaction; the step compacts AFTER each append, so the final
    // state is ≤ one file per bucket per table
    assert(indexFiles("graft_snd_compact") <= 8,
      s"file count not held flat: ${indexFiles("graft_snd_compact")}")
  }
}
