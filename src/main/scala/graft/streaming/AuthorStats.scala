package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over the enriched stream
  * (`flatMapGroupsWithState` — the Structured Streaming surface for
  * state the built-in windows can't express): per-author running
  * volume + confidence, with event-time inactivity expiry.
  *
  * The reference keeps only process-global counters
  * (metrics.py:15-59); per-author state is the north-star extension —
  * the shape a real abuse/quality tracker needs. State lives in the
  * state store (RocksDB-backed on a real cluster), partitioned by
  * author: memory scales with |authors active inside the watermark
  * horizon|, never with stream length — that bound is what makes the
  * operator safe at 100 TB/day. Expiry is EVENT-time (watermark-
  * driven): deterministic under replay, unlike a processing-time
  * clock — and a processing-time timeout also makes the engine
  * schedule perpetual empty wake-up batches, so a drain-and-stop
  * trigger never quiesces.
  */
object AuthorStats {

  final case class AuthorState(posts: Long, sumConfidence: Double)
  final case class AuthorUpdate(author: String, posts: Long,
      avg_confidence: Double, expired: Boolean)

  /** One update row per author per micro-batch it appears in; a final
    * expired=true row once the watermark passes the author's last
    * activity + timeout. `enriched` must carry (author, confidence,
    * event_ts) with a watermark on event_ts (the pipeline's frame
    * does). */
  def updates(spark: SparkSession, enriched: DataFrame,
      inactivityTimeout: String = "10 minutes"): Dataset[AuthorUpdate] = {
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(inactivityTimeout))
    require(iv.months == 0, "month-based timeouts are ambiguous")
    val timeoutMs = iv.days * 86400000L + iv.microseconds / 1000L
    enriched.select(col("author"), col("confidence"), col("event_ts"))
      .as[(String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AuthorState, AuthorUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (author: String, rows: Iterator[(String, Double, java.sql.Timestamp)],
            state: GroupState[AuthorState]) =>
          if (state.hasTimedOut) {
            // quiet past the horizon: emit the terminal row, free the
            // state-store entry (the memory bound in the scaladoc)
            val s = state.get
            state.remove()
            Iterator.single(
              AuthorUpdate(author, s.posts, s.sumConfidence / s.posts, expired = true))
          } else {
            val prev = state.getOption.getOrElse(AuthorState(0L, 0.0))
            val batch = rows.foldLeft((0L, 0.0, 0L)) {
              case ((n, c, mx), (_, conf, ts)) =>
                (n + 1, c + conf, math.max(mx, ts.getTime))
            }
            val next = AuthorState(prev.posts + batch._1,
              prev.sumConfidence + batch._2)
            state.update(next)
            // expire when the watermark passes last-seen + timeout
            // (clamped above the watermark: a late straggler must not
            // set a timeout in the already-passed past)
            state.setTimeoutTimestamp(
              math.max(batch._3 + timeoutMs, state.getCurrentWatermarkMs + 1))
            Iterator.single(AuthorUpdate(author, next.posts,
              next.sumConfidence / next.posts, expired = false))
          }
      }
  }
}
