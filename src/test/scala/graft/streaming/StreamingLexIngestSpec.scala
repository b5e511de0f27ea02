package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{Generations, LexIndex}

/** Stream/batch parity of the maintained lexical index: N micro-batches
  * through [[StreamingLexIngest]] must leave the index — observed
  * through the per-batch probe — exactly where N sequential
  * [[LexIndex.appendToLexIndex]] runs leave it, including with a
  * compact-every-batch swap in the loop. */
case class LexDoc(doc_id: Long, text: String)

class StreamingLexIngestSpec extends SparkSpec {

  private def corpus = Tables(spark, sf, "documents")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)

  private def queries = Tables(spark, sf, "documents")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 4)

  /** Three deliveries; each contains a near-dup EDIT of one query doc
    * (which must immediately top that query's lexical list — the
    * freshness discriminator) plus filler docs that shift df/N. */
  private def batches: Seq[Seq[LexDoc]] = {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .filter(col("doc_id") < 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def night(n: Int): Seq[LexDoc] =
      LexDoc(1000000000L + n, docs(n.toLong) + " zz stream edit marker") +:
        (0 until 5).map(i => LexDoc(2000000000L + n * 10 + i,
          docs(10L + n * 10 + i) + s" filler night $n token $i"))
    (0 until 3).map(night)
  }

  private def probe(name: String): Seq[(Long, Long, Int, Long)] =
    LexIndex.probeLexIndex(spark, name, queries, kEach = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("N micro-batches == N sequential appends (probe-observed), " +
      "with compact-every-batch behavior-invisible") {
    import spark.implicits._

    // reference path: sequential batch appends on a control index
    LexIndex.destroy(spark, "graft_slx_batch")
    LexIndex.writeLexIndex(corpus, "graft_slx_batch", numBuckets = 4)
    val expected = batches.zipWithIndex.map { case (b, i) =>
      LexIndex.appendToLexIndex(b.toDF(), "graft_slx_batch", s"seq-$i")
      probe("graft_slx_batch")
    }
    // the fixture discriminates FRESHNESS: every append shifts df and
    // n_docs/total_tokens, so every probe-visible score moves — a
    // probe still reading the pre-append index would repeat the
    // previous night's list bit-for-bit. (On this synthetic corpus's
    // ~31-word vocabulary every query term is a near-stop-word with
    // NEGATIVE log-idf, so an appended near-dup ranks bottom, not
    // top — score movement, not list membership, is the observable.)
    (1 until 3).foreach { n =>
      assert(expected(n) != expected(n - 1),
        s"night $n probe identical to night ${n - 1} — append invisible")
    }

    // streaming path: same deliveries as micro-batches, probing in
    // the loop via the queries hook
    LexIndex.destroy(spark, "graft_slx_stream")
    LexIndex.writeLexIndex(corpus, "graft_slx_stream", numBuckets = 4)
    val got = scala.collection.mutable.Map[Long, Seq[(Long, Long, Int, Long)]]()
    val mem = MemoryStream[LexDoc](spark)
    val q = StreamingLexIngest.start(spark, mem.toDF(), "graft_slx_stream",
        queries = Some(queries)) { (res, id) =>
      got(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got.size == 3, s"expected 3 batches, got ${got.keySet}")
    got.toSeq.sortBy(_._1).map(_._2).zip(expected).zipWithIndex.foreach {
      case ((g, e), i) => assert(g == e, s"night ${i + 1} diverged:\n$g\nvs\n$e")
    }

    // ---- compact-every-batch: behavior-invisible + files flat -------
    LexIndex.destroy(spark, "graft_slx_cmp")
    LexIndex.writeLexIndex(corpus, "graft_slx_cmp", numBuckets = 4)
    val gotC = scala.collection.mutable.Map[Long, Seq[(Long, Long, Int, Long)]]()
    val memC = MemoryStream[LexDoc](spark)
    val qc = StreamingLexIngest.start(spark, memC.toDF(), "graft_slx_cmp",
        queries = Some(queries), compactEvery = 1) { (res, id) =>
      gotC(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    }
    try {
      batches.foreach { b => memC.addData(b: _*); qc.processAllAvailable() }
    } finally qc.stop()
    assert(gotC.toSeq.sortBy(_._1).map(_._2) == expected,
      "compaction changed probe results mid-stream")
    // 1 build + 3 appends would hold ≥4 file sets per bucketed member
    // without compaction; compacting after each batch holds it at one
    // file per bucket
    val files = Seq("postings", "doclen", "dfcap", "vocab").map { m =>
      val t = Generations.resolve(spark, "graft_slx_cmp", m)
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location
      Option(new java.io.File(new java.net.URI(loc.getPath).getPath)
        .listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }.sum
    assert(files <= 16, s"file count not held flat: $files")
    // and the consolidated stats survived the swaps exactly
    val st = spark.table(Generations.resolve(spark, "graft_slx_cmp", "stats"))
      .agg(sum("n_docs"), sum("total_tokens")).head()
    val stB = spark.table(Generations.resolve(spark, "graft_slx_batch", "stats"))
      .agg(sum("n_docs"), sum("total_tokens")).head()
    assert(st == stB, s"stats diverged: $st vs $stB")
  }
}
