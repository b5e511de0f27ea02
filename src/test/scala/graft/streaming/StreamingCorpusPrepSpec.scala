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
}
