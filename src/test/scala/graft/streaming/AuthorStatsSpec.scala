package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** flatMapGroupsWithState: per-author state must accumulate across
  * micro-batches, stay isolated between keys, and expire (emit a
  * terminal row + free the state-store entry) once the event-time
  * watermark passes the author's last activity + timeout. */
class AuthorStatsSpec extends SparkSpec {
  import spark.implicits._

  private def post(author: String, at: String, text: String): String =
    s"""{"uri":"at://$author/${text.hashCode}","cid":"c${text.hashCode}","author":"$author","text":"$text","created_at":"$at"}"""

  test("state accumulates across batches and expires on watermark") {
    val mem = MemoryStream[String](spark)
    val enriched = StreamingEnrich.enrich(StreamingEnrich.parse(mem.toDF()))
      .withColumn("event_ts", to_timestamp(col("created_at")))
      .withWatermark("event_ts", "0 seconds")
    val updates = AuthorStats.updates(spark, enriched, "10 minutes")
    val q = updates.writeStream.format("memory").queryName("author_out")
      .outputMode("append").start()

    mem.addData(
      post("alice", "2024-01-01T00:00:00Z", "m m m museum join join join join"),
      post("bob", "2024-01-01T00:00:00Z", "u u u unusual window window window window"))
    q.processAllAvailable()
    mem.addData(
      post("alice", "2024-01-01T00:05:00Z", "m m m museum join join join join too"))
    q.processAllAvailable()
    // watermark jumps far past bob's last activity (+10 min) → bob
    // expires; alice was active at 00:05 so 00:30 also expires alice
    mem.addData(
      post("carol", "2024-01-01T00:30:00Z", "m m m museum join join join join"))
    q.processAllAvailable()
    // one more advance so the 00:30 watermark's timeouts fire
    mem.addData(
      post("carol", "2024-01-01T01:00:00Z", "m m m museum join join join join"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("author_out")
      .select("author", "posts", "expired").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))

    // accumulation: alice 1 then 2 (state carried); isolation: bob stays 1
    assert(rows.filter(r => r._1 == "alice" && !r._3).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(rows.filter(r => r._1 == "bob" && !r._3).map(_._2).toSeq == Seq(1L))
    // expiry: terminal rows carry the final accumulated counts
    assert(rows.contains(("bob", 1L, true)), rows.mkString(", "))
    assert(rows.contains(("alice", 2L, true)), rows.mkString(", "))
    // carol is still live at the end — no terminal row
    assert(!rows.exists(r => r._1 == "carol" && r._3))
    val avgs = spark.table("author_out").select("avg_confidence")
      .collect().map(_.getDouble(0))
    assert(avgs.forall(a => a > 0 && a <= 1))
  }
}
