package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join semantics: matches inside the event-time
  * window, exclusion outside it, and left-outer null-padding emitted
  * only after the watermark closes the click's window. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches within the window only") {
    val clicks = MemoryStream[(Long, Timestamp, String)](spark)
    val purchases = MemoryStream[(Long, Timestamp, Double)](spark)
    val joined = Attribution.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "click_ts", "ad"),
      purchases.toDF().toDF("p_user_id", "purchase_ts", "amount"))
      .select("user_id", "ad", "amount")
    val q = joined.writeStream.format("memory")
      .queryName("attr_inner").outputMode("append").start()

    clicks.addData(
      (1L, ts("2024-01-01 10:00:00"), "adA"),   // purchase 8 min later: in
      (2L, ts("2024-01-01 10:00:00"), "adB"),   // purchase 20 min later: out
      (3L, ts("2024-01-01 10:30:00"), "adC"))   // purchase before click: out
    purchases.addData(
      (1L, ts("2024-01-01 10:08:00"), 9.99),
      (2L, ts("2024-01-01 10:20:00"), 5.00),
      (3L, ts("2024-01-01 10:25:00"), 7.00))
    q.processAllAvailable()

    val rows = spark.table("attr_inner").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "adA")))
    q.stop()
  }

  test("left outer join emits unmatched clicks after the watermark closes them") {
    val clicks = MemoryStream[(Long, Timestamp, String)](spark)
    val purchases = MemoryStream[(Long, Timestamp, Double)](spark)
    val joined = Attribution.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "click_ts", "ad"),
      purchases.toDF().toDF("p_user_id", "purchase_ts", "amount"),
      joinType = "leftOuter")
      .select(col("user_id"), col("ad"), col("amount"))
    val q = joined.writeStream.format("memory")
      .queryName("attr_outer").outputMode("append").start()

    clicks.addData(
      (1L, ts("2024-01-01 10:00:00"), "adA"),
      (2L, ts("2024-01-01 10:01:00"), "adB")) // never purchases
    purchases.addData((1L, ts("2024-01-01 10:05:00"), 9.99))
    q.processAllAvailable()
    // matched row is emitted promptly; the unmatched click can't be:
    // a purchase might still arrive inside its 10-minute window
    val early = spark.table("attr_outer").collect()
    assert(early.map(_.getString(1)).toSet == Set("adA"))

    // advance both watermarks (min of the two gates state eviction)
    // far past 10:01 + 10 min → adB's window provably closed
    clicks.addData((9L, ts("2024-01-01 11:00:00"), "later"))
    purchases.addData((9L, ts("2024-01-01 11:30:00"), 1.00))
    q.processAllAvailable()
    q.processAllAvailable() // outer results flush one trigger behind

    val rows = spark.table("attr_outer").collect()
    val unmatched = rows.filter(_.getString(1) == "adB")
    assert(unmatched.length == 1 && unmatched.head.isNullAt(2))
    q.stop()
  }
}
