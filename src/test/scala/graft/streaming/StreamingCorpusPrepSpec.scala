package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Batch/stream parity of the corpus-prep front door: the SAME fixture
  * run through p01's batch stages 1–3 and through
  * [[StreamingCorpusPrep.frontDoor]] must keep the SAME documents with
  * the SAME contamination flags. The stream replays the corpus as an
  * append-in-event-order ingest (ts = doc_id seconds) across two
  * micro-batches with shuffled intra-batch order — the arrival pattern
  * a nightly tailer produces, and the one where DedupWindow's
  * min-event-time winner coincides with batch dedup's min-doc_id
  * survivor. */
case class PrepDoc(doc_id: Long, text: String, n_chars: Long, ts: Timestamp)
case class TokenCount(doc_id: Long, n_tokens: Long)

class StreamingCorpusPrepSpec extends SparkSpec {

  private def doc(id: Long, text: String) =
    PrepDoc(id, text, text.length.toLong, new Timestamp(1700000000000L + id * 1000L))

  // realistic-ish prose so the quality gate passes where intended
  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2L -> "training corpora need careful deduplication before any model sees them",
    3L -> "spark structured streaming composes batch operators over unbounded input",
    4L -> "   ", // blank → quality stage drops
    5L -> "zz zz zz zz zz zz zz zz zz zz zz zz", // low quality → drops
    6L -> "benchmark evaluation documents must never leak into the training set",
    7L -> "a completely separate document about cooking pasta with fresh tomatoes",
    8L -> "the quick brown fox jumps over the lazy dog near the river bank today", // dup of 1 (same batch)
    9L -> "another unique document describing mountains and weather patterns in spring",
    21L -> "spark structured streaming composes batch operators over unbounded input", // dup of 3 (cross batch)
    22L -> "late arriving but genuinely new content about databases and indexes",
    23L -> "benchmark evaluation documents must never leak into the training set", // dup of 6 (cross batch)
    24L -> "final unique entry mentioning sailing ships and ocean navigation routes")
  private val fixture = base.map { case (id, t) => doc(id, t) }
  // eval set: doc 6's text (flags 6 itself) + an 8-gram of doc 9
  private val evalTexts = Seq(
    100L -> "benchmark evaluation documents must never leak into the training set",
    101L -> "another unique document describing mountains and weather patterns here")

  private def batchKept(docs: DataFrame, evalSet: DataFrame): Set[(Long, Boolean)] = {
    // p01 stages 1-3 verbatim (CorpusPrep.scala)
    val quality = docs.filter(length(trim(col("text"))) > 0)
      .filter(TextFunctions.quality(col("text"), col("n_chars")) >= 0.5)
    val survivors = Dedup.exactDedup(quality).select("doc_id")
    val deduped = quality.join(survivors, "doc_id")
    Dedup.decontaminate(deduped, evalSet)
      .select("doc_id", "contaminated").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
  }

  /** DedupWindow's transformWithState needs the RocksDB provider. */
  private def withRocksDB[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("front door keeps the same docs with the same flags as the batch stages") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val evalSet = evalTexts.toDF("doc_id", "text")
      val expected = batchKept(fixture.toDF(), evalSet)
      // sanity on the fixture itself: quality drops 4/5, dedup drops
      // 8/21/23, docs 6 and 9 carry the contamination flag
      assert(expected == Set((1L, false), (2L, false), (3L, false),
        (6L, true), (7L, false), (9L, true), (22L, false), (24L, false)),
        expected.toString)

      val mem = MemoryStream[PrepDoc](spark)
      val out = StreamingCorpusPrep.frontDoor(spark, mem.toDF(), evalSet,
        window = java.time.Duration.ofDays(1), delay = "1 hour")
      val q = out.writeStream.format("memory")
        .queryName("corpus_front_door").outputMode("append").start()
      val (early, late) = fixture.partition(_.doc_id < 20)
      // intra-batch order is shuffled: DedupWindow's winner must not
      // depend on it (its spec proves this; parity re-exercises it)
      mem.addData(scala.util.Random.shuffle(early): _*)
      q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(late): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("corpus_front_door")
        .select("doc_id", "contaminated").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSet
      assert(streamed == expected,
        s"stream=$streamed\nbatch=$expected")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stage 4 streams: static-rate mixture gate == the batch gate") {
    withRocksDB {
    import spark.implicits._
    import graft.operators.Sampling
    // rates as static config — the streaming approximation of q27
    // (rate DERIVATION needs whole-corpus counts and stays offline);
    // the gate itself is a pure md5-of-doc_id filter, so the stream
    // and batch draws are the same draw
    val rates = Seq("en" -> 0.7)
    val docsDf = fixture.toDF()
    val evalSet = evalTexts.toDF("doc_id", "text")
    // batch reference: stages 1-3 kept set, decontaminated, then gated
    val quality = docsDf.filter(length(trim(col("text"))) > 0)
      .filter(TextFunctions.quality(col("text"), col("n_chars")) >= 0.5)
    val deduped = quality.join(Dedup.exactDedup(quality).select("doc_id"), "doc_id")
    val clean = deduped.join(Dedup.decontaminate(deduped, evalSet)
      .filter(!col("contaminated")).select("doc_id"), "doc_id")
    val expected = Sampling.mixtureSample(
        clean.withColumn("lang", TextFunctions.langId(col("text"))),
        col("doc_id"), col("lang"), rates, "mix7")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 8,
      s"gate fixture degenerate: $expected") // some kept, some dropped

    val mem = MemoryStream[PrepDoc](spark)
    val gated = StreamingCorpusPrep.mixtureGate(
      StreamingCorpusPrep.frontDoor(spark, mem.toDF(), evalSet,
          window = java.time.Duration.ofDays(1), delay = "1 hour")
        .filter(!col("contaminated")),
      rates, "mix7")
    val q = gated.writeStream.format("memory")
      .queryName("mixture_gate").outputMode("append").start()
    mem.addData(fixture: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mixture_gate")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected, s"stream=$streamed batch=$expected")
    }
  }

  test("stage 5 bridges as epochs: each closed micro-batch packs like batch t11") {
    import spark.implicits._
    import graft.operators.Packing
    val epochs = Seq(
      (0L until 40L).map(i => TokenCount(i, (i % 7) * 30 + 5)),
      (100L until 170L).map(i => TokenCount(i, (i % 5) * 50 + 1)))
    val mem = MemoryStream[TokenCount](spark)
    val got = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Long)]]()
    val q = StreamingCorpusPrep.packEpochs(mem.toDF(), budget = 256) {
      (packed, epoch) =>
        got(epoch) = packed.select("doc_id", "start_tok", "seq_first", "seq_last")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).sortBy(_._1).toSeq
    }
    try {
      epochs.foreach { e => mem.addData(e: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got.size == 2)
    epochs.zipWithIndex.foreach { case (e, i) =>
      val batch = Packing.packPlan(e.toDF(), "doc_id", "n_tokens", 256)
        .select("doc_id", "start_tok", "seq_first", "seq_last")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      assert(got(i.toLong) == batch, s"epoch $i diverged from batch packing")
    }
  }
}
