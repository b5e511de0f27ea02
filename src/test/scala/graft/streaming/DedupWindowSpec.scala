package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** transformWithState duplicate-window semantics: first occurrence of a
  * msg_id passes, duplicates inside the window drop (same batch or
  * later batch), and the key expires once the watermark passes
  * first_ts + window, so a later re-send passes again. */
class DedupWindowSpec extends SparkSpec {
  import DedupWindow.Msg

  private def ts(s: String) = Timestamp.valueOf(s)

  test("first-wins within the window, key expires at watermark + window") {
    // transformWithState requires the RocksDB state store; scope the
    // provider to this test and restore the default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val mem = MemoryStream[Msg](spark)
      val out = DedupWindow.dedup(spark, mem.toDS(), Duration.ofSeconds(60))
      val q = out.writeStream.format("memory")
        .queryName("dedup_out").outputMode("append").start()

      // same-batch duplicate + cross-batch duplicate both drop
      mem.addData(
        Msg("a", "p1", ts("2024-01-01 10:00:00")),
        Msg("a", "p1-dup", ts("2024-01-01 10:00:05")),
        Msg("b", "p2", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      mem.addData(Msg("a", "p1-replay", ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      val first = spark.table("dedup_out").as[Msg].collect()
      assert(first.map(m => (m.msg_id, m.payload)).sorted.toSeq ==
        Seq(("a", "p1"), ("b", "p2")))

      // watermark past 10:01:00 (= a's first ts + 60s window) expires
      // the key: a re-send of "a" passes again
      mem.addData(Msg("c", "p3", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      mem.addData(Msg("a", "p1-late", ts("2024-01-01 10:05:10")))
      q.processAllAvailable()
      val after = spark.table("dedup_out").as[Msg].collect()
      assert(after.count(_.msg_id == "a") == 2, after.mkString(","))
      assert(after.exists(m => m.msg_id == "a" && m.payload == "p1-late"))
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("winner is the min-ts row regardless of intra-batch arrival order") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      // same multiset of duplicate rows, three arrival orders (replay
      // can deliver any of them); the kept row and its timer anchor
      // must not depend on which order Spark's iterator surfaces
      val dupes = Seq(
        Msg("k", "later", ts("2024-01-01 10:00:20")),
        Msg("k", "first", ts("2024-01-01 10:00:01")),
        Msg("k", "mid", ts("2024-01-01 10:00:10")))
      val orders = Seq(dupes, dupes.reverse, dupes.sortBy(_.payload))
      val kept = orders.zipWithIndex.map { case (batch, i) =>
        val mem = MemoryStream[Msg](spark)
        val out = DedupWindow.dedup(spark, mem.toDS(), Duration.ofSeconds(60))
        val q = out.writeStream.format("memory")
          .queryName(s"dedup_det_$i").outputMode("append").start()
        mem.addData(batch: _*)
        q.processAllAvailable()
        val rows = spark.table(s"dedup_det_$i").as[Msg].collect().toSeq
        q.stop()
        rows
      }
      assert(kept.forall(_.map(m => (m.msg_id, m.payload)) ==
        Seq(("k", "first"))), kept.mkString(" | "))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming incremental dedup: stream-static anti-join vs the corpus index (d09 shape)") {
    // d09's batch anti-join is also the streaming-ingest shape: the
    // historical fingerprint index sits on the STATIC side of a
    // stream-static left-anti join, so each micro-batch ships only
    // never-seen-before documents. The static side re-scans per batch
    // (at scale: a bucketed/indexed table), stream side stays narrow.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val hist = Seq("seen doc one", "seen doc two").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
    val mem = MemoryStream[String](spark)
    val out = mem.toDF().select(col("value").as("text"),
        TextFunctions.fingerprint(col("value")).as("fp"))
      .join(hist, Seq("fp"), "left_anti")
    val q = out.writeStream.format("memory")
      .queryName("inc_dedup_out").outputMode("append").start()
    mem.addData("seen doc one", "brand new doc", "seen doc two")
    q.processAllAvailable()
    mem.addData("another new doc", "seen doc one")
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("inc_dedup_out").select("text")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("brand new doc", "another new doc"), kept.toString)
  }
}
