package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream event-time interval join (north-star surface beyond
  * the reference's processing-time pipeline — SURVEY.md §2.5 T6).
  *
  * Attribution shape: each purchase joins the clicks of the same user
  * in the preceding `window`. Both sides are watermarked, and the join
  * condition bounds event-time distance, so Spark can expire join
  * state: a click is held only until `watermark > click_ts + window`,
  * a purchase until the watermark passes it. State is therefore
  * O(events inside the window), not O(stream length) — the property
  * that lets the join run forever at 100 TB/day. An unbounded-interval
  * stream-stream join would grow state monotonically and is the
  * classic production outage; the interval predicate is load-bearing,
  * not an optimization.
  *
  * `joinType = "leftOuter"` additionally emits unmatched clicks
  * null-padded — but only once the watermark proves no future purchase
  * can match them (outer results are late by construction).
  */
object Attribution {

  /** `clicks`  needs columns: user_id, click_ts (+payload).
    * `purchases` needs: p_user_id, purchase_ts (+payload).
    * Columns are disjoint on purpose: stream-stream joins forbid
    * ambiguous references across sides. */
  def clickPurchaseJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      window: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", "0 seconds")
    val p = purchases.withWatermark("purchase_ts", "0 seconds")
    c.join(p,
      expr(s"""user_id = p_user_id
        AND purchase_ts >= click_ts
        AND purchase_ts <= click_ts + INTERVAL $window"""),
      joinType)
  }
}
