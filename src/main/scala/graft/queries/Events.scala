package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-time windowing over the `events` fixture (SURVEY.md §2.5 T6:
  * the reference is processing-time-only; the north star adds real
  * event-time windows). Batch mode here — identical `window()` /
  * `session_window()` calls run under Structured Streaming with
  * `withWatermark` (graft.streaming, ScalaTest-covered); the batch
  * results are what the streaming query converges to, which is exactly
  * what the DuckDB oracle can check. */
object Events {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  val all: Seq[Q] = Seq(

    // ---- tumbling 1h windows per event type -------------------------
    Q("v01_tumbling_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          // window start as epoch seconds: timestamp binary layouts
          // differ across engines, epoch bigints hash identically
          .select(col("w.start").cast("long").as("ws"), col("event_type"),
            col("n"), col("total"))
          .orderBy("ws", "event_type"),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,
          event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY ws, event_type
        ORDER BY ws NULLS FIRST, event_type NULLS FIRST""")),

    // ---- sliding windows: 10 min size, 5 min slide ------------------
    Q("v02_sliding_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").cast("long").as("ws"), col("n"))
          .orderBy("ws"),
      // every event belongs to exactly two windows: the one starting at
      // its 5-min floor and the one 5 min earlier (epoch-aligned, same
      // origin Spark uses)
      Some("""WITH x AS (SELECT
          CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS t5 FROM events),
        e AS (SELECT unnest([t5, t5 - 300]) AS ws FROM x)
        SELECT ws, count(*) AS n FROM e GROUP BY ws
        ORDER BY ws NULLS FIRST""")),

    // ---- session windows: 30 min inactivity gap per user ------------
    Q("v03_session_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .select(col("user_id"),
            col("w.start").cast("long").as("session_start"),
            col("w.end").cast("long").as("session_end"), col("n"), col("total"))
          .orderBy("user_id", "session_start"),
      // gap-and-island formulation: a session breaks when the gap from
      // the previous event reaches 30 min — Spark's session_window
      // half-open [t, t+gap) merges only on strict overlap, so an
      // exactly-30-min gap starts a NEW session; `>=` matches that
      Some("""WITH g AS (SELECT user_id, ts, value,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL 30 MINUTE OR
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               THEN 1 ELSE 0 END AS brk FROM events),
        sid AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g)
        SELECT user_id,
          CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
          CAST(floor(epoch(max(ts))) + 1800 AS BIGINT) AS session_end,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM sid GROUP BY user_id, session_id
        ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""")),

    // ---- semi-structured JSON extraction from props -----------------
    Q("v04_json_props",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
            max(col("k")).as("k_max"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
          CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
          CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    // ---- top-k per group via window function over event aggregates --
    Q("v05_top_users_per_type",
      (s, dir) => {
        val agg = Tables(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        agg.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("event_type"))
              .orderBy(col("n").desc, col("user_id"))))
          .filter(col("rk") <= 3)
          .select("event_type", "user_id", "n", "total", "rk")
          .orderBy("event_type", "rk")
      },
      Some("""WITH a AS (SELECT event_type, user_id, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
          FROM events GROUP BY event_type, user_id),
        r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
            ORDER BY n DESC, user_id) AS INT) AS rk FROM a)
        SELECT event_type, user_id, n, total, rk FROM r WHERE rk <= 3
        ORDER BY event_type NULLS FIRST, rk NULLS FIRST""")),

    // ---- ordered-sequence funnel: view -> click -> purchase ---------
    // Per-user conversion detection via conditional min() — one
    // map-side-combined aggregate, no self-joins (the naive funnel is
    // a 3-way self-join; conditional aggregation shuffles each user
    // once regardless of funnel depth). NULL discipline: the IS NOT
    // NULL conjuncts run first, so FALSE AND NULL = FALSE makes
    // `converted` never NULL in either engine.
    Q("v06_funnel",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        def firstTs(t: String) =
          min(when(col("event_type") === t, col("ts")))
        ev.groupBy("user_id")
          .agg(firstTs("view").as("fv"), firstTs("click").as("fc"),
            firstTs("purchase").as("fp"))
          .select(col("user_id"),
            col("fv").cast("long").as("first_view"),
            col("fc").cast("long").as("first_click"),
            col("fp").cast("long").as("first_purchase"),
            (col("fv").isNotNull && col("fc").isNotNull &&
              col("fp").isNotNull && col("fv") < col("fc") &&
              col("fc") < col("fp")).as("converted"))
          .orderBy("user_id")
      },
      Some("""WITH a AS (SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
          min(CASE WHEN event_type = 'click' THEN ts END) AS fc,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY user_id)
        SELECT user_id,
          CAST(floor(epoch(fv)) AS BIGINT) AS first_view,
          CAST(floor(epoch(fc)) AS BIGINT) AS first_click,
          CAST(floor(epoch(fp)) AS BIGINT) AS first_purchase,
          (fv IS NOT NULL AND fc IS NOT NULL AND fp IS NOT NULL
            AND fv < fc AND fc < fp) AS converted
        FROM a ORDER BY user_id NULLS FIRST""")),

    // ---- weekly retention cohorts -----------------------------------
    // (user, week) activity distinct once, then a self-join shifted by
    // one week — shuffled volume is |users × weeks| (post-distinct),
    // never raw events. rate is a single final division (hash-exact).
    Q("v07_retention",
      (s, dir) => {
        val uw = Tables(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("long").as("wk"))
          .distinct()
        val nxt = uw.select(col("user_id").as("u2"),
          (col("wk") - 604800L).as("wk2"))
        uw.join(nxt, col("user_id") === col("u2") && col("wk") === col("wk2"),
            "left")
          .groupBy("wk")
          .agg(count(lit(1)).as("n_active"),
            count(col("u2")).as("n_retained"))
          .withColumn("retention",
            col("n_retained").cast("double") / col("n_active").cast("double"))
          .orderBy("wk")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
          CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS wk FROM events)
        SELECT a.wk, count(*) AS n_active,
          CAST(count(b.user_id) AS BIGINT) AS n_retained,
          CAST(count(b.user_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS retention
        FROM uw a LEFT JOIN uw b
          ON a.user_id = b.user_id AND b.wk = a.wk + 604800
        GROUP BY a.wk ORDER BY a.wk NULLS FIRST""")),

    // ---- v08: event-transition matrix --------------------------------
    // The Markov view of user behavior ("after a click, what next?"):
    // per-user lag ordered by (ts, event_id) — tie-free at any SF —
    // then (prev, next) counts and per-prev transition probabilities.
    // The window partitions by user_id, so the sort distributes across
    // users (the correct shape for millions of users — never a global
    // window); probabilities come from a join against the per-prev
    // totals, both partial-aggregated. Exact integer counts ⇒ the
    // double division hash-checks.
    Q("v08_transitions",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val t = Tables(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
        val c = t.groupBy(col("prev_type"),
            col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = c.groupBy("prev_type").agg(sum(col("n")).as("tn"))
        c.join(tot, "prev_type")
          .select(col("prev_type"), col("next_type"), col("n"),
            (col("n").cast("double") / col("tn").cast("double")).as("p"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH t AS (SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_type
        FROM events),
        c AS (SELECT prev_type, event_type AS next_type,
            count(*) AS n
          FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT prev_type, sum(n) AS tn FROM c GROUP BY 1)
        SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
          CAST(c.n AS DOUBLE) / CAST(tot.tn AS DOUBLE) AS p
        FROM c JOIN tot USING (prev_type)
        ORDER BY prev_type NULLS FIRST, next_type NULLS FIRST""")),
  )
}
