package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** v03's session_window semantics under Structured Streaming (verdict
  * item 7): watermarked event-time sessions with a 10-minute gap, in
  * append mode — sessions merge while open, close when the watermark
  * passes their end, and late events beyond the watermark are dropped.
  */
class SessionWindowStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming session windows: merge, close on watermark, drop late") {
    val mem = MemoryStream[(Timestamp, String)](spark)
    val sessions = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds") // watermark = max event time seen
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("start"),
        col("w.end").as("end"), col("n"))
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()

    // two events 5 min apart → one session [10:00, 10:15) (the second
    // event extends the end to its ts + gap)
    mem.addData((ts("2024-01-01 10:00:00"), "alice"),
      (ts("2024-01-01 10:05:00"), "alice"))
    q.processAllAvailable()
    // session still open (watermark == 10:05 < end) → nothing emitted
    assert(spark.table("sessions_out").count() == 0)

    // an event far ahead advances the watermark past the session end →
    // alice's merged session closes and is emitted
    mem.addData((ts("2024-01-01 12:00:00"), "bob"))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").collect()
    assert(closed.length == 1)
    val r = closed.head
    assert(r.getString(0) == "alice" && r.getLong(3) == 2L)
    assert(r.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(r.getTimestamp(2) == ts("2024-01-01 10:15:00")) // last ts + gap

    // a late event behind the watermark (12:00) is dropped: no new
    // session appears for it, ever
    mem.addData((ts("2024-01-01 10:02:00"), "carol"))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 1)
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped >= 1)
    q.stop()
  }
}
