package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{BandJoin, Sampling, SkewJoin}

/** Scale-pattern queries (SURVEY.md §2.6 extensions): skew-salted join,
  * time-band range join, exact + approximate quantiles, pivot. Each is
  * a pattern a 100 TB training-data pipeline leans on daily; results
  * are deliberately expressible in ANSI SQL so every one hash-checks
  * against DuckDB (the approximate-quantile error bound is ScalaTest'd
  * instead, like q16's HLL).
  */
object Advanced {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
  private def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    // ---- salted fact-fact join under a skew-hostile plan -------------
    // Results are identical to the plain l_orderkey join (the oracle
    // proves it); the plan detects the heaviest orderkeys (≥4 lineitems
    // here — at 100 TB the threshold targets genuine stragglers) and
    // spreads ONLY their rows over 8 reducers. Cold keys keep salt 0
    // (single replica), so neither fact is blanket-replicated AND each
    // fact is scanned exactly once (SkewBandJoinSpec pins both).
    // Detection runs the SAMPLED path (fraction 0.5, threshold scaled
    // inside detectHotKeys) — the 100 TB shape, where the hot-set pass
    // reads a fraction of the fact instead of a full scan; the result
    // is hash-exact regardless of which borderline keys the sample
    // promotes, because salting is row-invisible.
    Q("q18_salted_join",
      (s, dir) => {
        val line = Tables(s, dir, "lineitem")
          .withColumnRenamed("l_orderkey", "okey")
        val ord = Tables(s, dir, "orders")
          .withColumnRenamed("o_orderkey", "okey")
        SkewJoin.hotKeySaltedJoin(line, ord, "okey", salt = 8,
            hotThreshold = 4L, sampleFraction = 0.5)
          .groupBy(col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
          ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
          count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority NULLS FIRST""")),

    // ---- time-band range join (equi-key + |Δt| ≤ 10 min) -------------
    // The oracle is the naive inequality join; the engine runs the
    // binned equi-join plan (BandJoin scaladoc) — same rows exactly.
    Q("q19_band_join",
      (s, dir) =>
        BandJoin.selfBandPairs(Tables(s, dir, "events"),
            key = "user_id", tsCol = "ts", idCol = "event_id",
            bandSec = 600L)
          .orderBy("user_id", "id_a", "id_b"),
      Some("""SELECT a.user_id AS user_id,
          a.event_id AS id_a, b.event_id AS id_b,
          (epoch_us(b.ts) - epoch_us(a.ts)) / 1e6 AS gap_sec
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000
        ORDER BY a.user_id NULLS FIRST, id_a NULLS FIRST, id_b NULLS FIRST""")),

    // ---- exact interpolated quantiles by group -----------------------
    // Spark `percentile` and DuckDB `quantile_cont` share the
    // lower + frac·(upper − lower) definition; the approximate
    // (percentile_approx) error bound is asserted in ApproxQuantileSpec.
    Q("q20_quantiles",
      (s, dir) => {
        val ps = array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(percentile(col("l_extendedprice"), ps).as("q"))
          .select(col("l_returnflag"),
            col("q").getItem(0).as("p25"), col("q").getItem(1).as("p50"),
            col("q").getItem(2).as("p75"), col("q").getItem(3).as("p95"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.25) AS p25,
          quantile_cont(l_extendedprice, 0.50) AS p50,
          quantile_cont(l_extendedprice, 0.75) AS p75,
          quantile_cont(l_extendedprice, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag NULLS FIRST""")),

    // ---- pivot (long → wide reshaping) -------------------------------
    // Spark's relational pivot with an explicit value list (implicit
    // discovery would add a driver-side distinct pass — never at scale).
    Q("q21_pivot",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(year(col("l_shipdate")).as("ship_year"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(dsum(col("l_extendedprice"), 2))
          .orderBy("ship_year"),
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
          CAST(sum(CASE WHEN l_returnflag = 'A'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
          CAST(sum(CASE WHEN l_returnflag = 'N'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
          CAST(sum(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS R
        FROM lineitem GROUP BY 1
        ORDER BY ship_year NULLS FIRST""")),

    // ---- reproducible mixture sampling -------------------------------
    // Training-corpus mixture: per-language keep rates via a pure
    // md5-of-key gate (Sampling scaladoc: rand()/sample() redraw under
    // task retry; this is stable across retries, partitionings and
    // engines — which is why DuckDB can hash-check the sampled SET).
    Q("q22_mixture_sample",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .withColumn("lang", TextFunctions.langId(col("text")))
        Sampling.mixtureSample(docs, col("doc_id"), col("lang"),
            Seq("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25,
              "es" -> 0.25, "und" -> 0.1), salt = "mix1")
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some {
        val rates = Seq("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25,
          "es" -> 0.25, "und" -> 0.1)
        val gate = rates.map { case (l, f) =>
          s"(lang = '$l' AND ${Sampling.sqlKeep("doc_id", f, "mix1")})"
        }.mkString(" OR ")
        s"""WITH l AS (SELECT doc_id,
            ${TextFunctions.sqlLangId("text")} AS lang FROM documents)
          SELECT doc_id, lang FROM l WHERE $gate
          ORDER BY doc_id NULLS FIRST"""
      }),

    // ---- temperature-rebalanced mixture ------------------------------
    // Data-dependent cousin of q22: keep rates are COMPUTED from the
    // corpus (rate_s = √(c_min/c_s), the α=1/2 multilingual rebalance)
    // instead of hand-picked. `lang` is naturally skewed here (en ≈
    // 3.4× fr), so en genuinely downsamples while the rarest lang
    // exercises the rate-1.0 short-circuit. α=1/2 because IEEE sqrt /
    // divide are correctly rounded — the 16-bit gate threshold is
    // bit-identical in both engines (see Sampling scaladoc).
    Q("q27_temperature_mix",
      (s, dir) =>
        Sampling.temperatureRebalance(
            Tables(s, dir, "documents"), col("doc_id"), col("lang"), salt = "temp1")
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some(Sampling.sqlTemperatureRebalance(
          "documents", "doc_id", "lang", "temp1", "doc_id, lang") +
        " ORDER BY doc_id NULLS FIRST")),

    // ---- exact per-stratum quota sampling ----------------------------
    // Hard quotas (40 docs per lang) in deterministic md5-hash order —
    // the balanced-eval-subset draw that rate-based q22/q27 can't
    // guarantee. Runs on the bounded top-k Aggregator (≤ k rows per
    // partition per stratum reach the shuffle), not a per-stratum
    // window sort; the 52-bit hash prefix makes the engine's numeric
    // order equal the oracle's hex string order (Sampling scaladoc).
    Q("q28_stratified_quota",
      (s, dir) =>
        Sampling.stratifiedQuota(Tables(s, dir, "documents"),
            col("doc_id"), col("lang"), k = 40, salt = "quota1")
          .select(col("qid").as("lang"), col("rank").as("rn"),
            col("vec_id").as("doc_id"))
          .orderBy("lang", "rn"),
      Some("""WITH r AS (SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':quota1'), 1, 13),
              doc_id) AS rn
          FROM documents)
        SELECT lang, CAST(rn AS INT) AS rn, doc_id FROM r WHERE rn <= 40
        ORDER BY lang NULLS FIRST, rn NULLS FIRST""")),

    // ---- deterministic corpus shuffle --------------------------------
    // Reproducible global permutation in md5 order (data order is a
    // training hyperparameter — a rerun must ship the same order). The
    // rank runs as the two-phase distributed scan, never a one-reducer
    // global window (PlanSpec pins the absence); the oracle's
    // row_number window IS that single-reducer plan, fine for DuckDB
    // at sf0.01 and exactly what the operator exists to avoid.
    Q("q29_corpus_shuffle",
      (s, dir) =>
        Sampling.deterministicShuffle(
            Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
            col("doc_id"), salt = "shuf1")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
          CAST(row_number() OVER (
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':shuf1'), 1, 13),
              doc_id) - 1 AS BIGINT) AS shuffle_pos
        FROM documents ORDER BY doc_id NULLS FIRST""")),

    // ---- q30: token-budget mixture -----------------------------------
    // The trainer-facing mixture spec ("N tokens per domain"): per
    // lang, keep docs in deterministic md5 order until 2500 cumulative
    // tokens. Every lang at sf0.01 holds 3.5k-12k tokens, so each
    // stratum exercises both the kept prefix and the dropped tail. The
    // in-engine plan is the generalized two-phase scan (no per-stratum
    // one-reducer window — see tokenBudgetSample's scaladoc; the
    // oracle's window spelling is safe only because DuckDB runs at
    // oracle scale).
    Q("q30_token_budget",
      (s, dir) =>
        Sampling.tokenBudgetSample(Tables(s, dir, "documents"),
            col("doc_id"), col("lang"),
            TextFunctions.tokenCount(col("text")),
            budget = 2500L, salt = "tb1")
          .orderBy("doc_id"),
      Some(Sampling.sqlTokenBudgetSample("documents", "doc_id", "lang",
          TextFunctions.sqlTokenCount("text"), 2500L, "tb1") +
        " ORDER BY doc_id NULLS FIRST")),

    // ---- q38: quality-WEIGHTED sampling (A-ES without replacement) ---
    // The gradient the keep/drop gates lack: 40 docs per language
    // drawn with inclusion odds ∝ the t04 quality score — the
    // "prefer good documents, don't hard-cut" corpus-selection spec.
    // Deterministic A-ES (u = exact 52-bit md5-uniform, key =
    // floor(u^(1/w)·10^6) so a last-ulp pow divergence can't flip the
    // order) → hash-exact vs the windowed DuckDB twin; the engine side
    // runs the bounded TopKAgg per stratum (map-side combined, ≤ k
    // rows per partition-stratum to the exchange), never a per-stratum
    // row_number sort.
    Q("q38_weighted_sample",
      (s, dir) =>
        Sampling.weightedSample(Tables(s, dir, "documents"),
            col("doc_id"), col("lang"),
            greatest(TextFunctions.quality(col("text"), col("n_chars")),
              lit(0.05)),
            k = 40, salt = "ws1")
          .orderBy("stratum", "rank"),
      Some(Sampling.sqlWeightedSample("documents", "doc_id", "lang",
          s"greatest(${TextFunctions.sqlQuality("text", "n_chars")}, 0.05)",
          40, "ws1") +
        " ORDER BY stratum NULLS FIRST, rank NULLS FIRST")),

    // ---- q32: deterministic train/val/test split ---------------------
    // A TOTAL partition (vs sampling's keep-or-drop): every doc lands
    // in exactly one split by which band of its md5 prefix it falls
    // in. Cumulative thresholds make bands disjoint+exhaustive by
    // construction, and a row's split never changes as the corpus
    // grows — the property that keeps a held-out set held out across
    // corpus versions. One narrow CASE, no shuffle; the assignment
    // itself hash-checks.
    Q("q32_dataset_split",
      (s, dir) =>
        Sampling.datasetSplit(
            Tables(s, dir, "documents").select("doc_id", "lang"),
            col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split1")
          .orderBy("doc_id"),
      Some("SELECT doc_id, lang, " +
        Sampling.sqlDatasetSplit("doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "split1") +
        " AS split FROM documents ORDER BY doc_id NULLS FIRST")),

    // ---- q35: epoch-weighted OVERsampling ----------------------------
    // The up direction the sampling family lacked: "2.25 epochs of zh,
    // 2 of de, 1 of es, 0.4 of fr, half of en" — ⌊w⌋ full copies per
    // doc plus an md5-gated fractional copy, the mixture spec trainers
    // write as epochs-per-source. Weights exercise every branch:
    // fraction-only (en 0.5, fr 0.4), pure integer (de 2, es 1),
    // integer+fraction (zh 2.25), and absent strata drop. A narrow
    // CASE + bounded explode — no shuffle; copy_idx makes the
    // replication itself hash-checkable.
    Q("q35_epoch_mix",
      (s, dir) =>
        Sampling.epochMix(
            Tables(s, dir, "documents").select("doc_id", "lang"),
            col("doc_id"), col("lang"),
            Seq("en" -> 0.5, "de" -> 2.0, "es" -> 1.0,
              "fr" -> 0.4, "zh" -> 2.25), salt = "epoch1")
          .orderBy("doc_id", "copy_idx"),
      Some {
        val copies = Sampling.sqlEpochMixCopies("doc_id", "lang",
          Seq("en" -> 0.5, "de" -> 2.0, "es" -> 1.0,
            "fr" -> 0.4, "zh" -> 2.25), "epoch1")
        s"""WITH c AS (SELECT doc_id, lang, $copies AS copies FROM documents)
          SELECT doc_id, lang, CAST(unnest(range(0, copies)) AS INT) AS copy_idx
          FROM c WHERE copies > 0
          ORDER BY doc_id NULLS FIRST, copy_idx NULLS FIRST"""
      }),

    // ---- multiple COUNT(DISTINCT) in one aggregate -------------------
    // Catalyst plans N distinct aggregates over one input as a single
    // Expand (N+1 projections of each row) + two-phase aggregation —
    // one shuffle total, vs the naive N self-joined single-distinct
    // queries. Shuffled volume scales with |groups|×N, not |rows|.
    Q("q23_multi_distinct",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            countDistinct(col("l_orderkey")).as("nd_ord"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
          CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd_ord,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag NULLS FIRST""")),

    // ---- RANGE window frame (value-based, not row-based) -------------
    // Trailing 90-day spend per customer: the frame is defined by the
    // ORDER BY *value* (day number), so same-day orders are peers and
    // the result is deterministic under any within-day row order —
    // rowsBetween (q07) could not express this. One shuffle on custkey.
    Q("q24_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("d")).rangeBetween(-90, Window.currentRow)
        Tables(s, dir, "orders")
          .withColumn("d", datediff(col("o_orderdate"), lit("1970-01-01")))
          .withColumn("spend_90d",
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("d"), col("spend_90d"))
          .orderBy("o_custkey", "d", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS d,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01',
              CAST(o_orderdate AS DATE))
            RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
        FROM orders
        ORDER BY o_custkey NULLS FIRST, d NULLS FIRST, o_orderkey NULLS FIRST""")),

    // ---- full outer join ---------------------------------------------
    // Daily order volume vs daily ship volume: ship dates run past the
    // last order date, so both sides contribute unmatched rows. Both
    // inputs aggregate BEFORE the join — the full-outer shuffle moves
    // |days| rows, not |orders|+|lineitems|.
    Q("q25_full_outer",
      (s, dir) => {
        def daily(table: String, dateCol: String, out: String) =
          Tables(s, dir, table)
            .groupBy(datediff(col(dateCol), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as(out))
        daily("orders", "o_orderdate", "n_orders")
          .join(daily("lineitem", "l_shipdate", "n_ships"), Seq("day"), "full_outer")
          .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_ships"), lit(0L)).as("n_ships"))
          .orderBy("day")
      },
      Some("""WITH o AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
            CAST(o_orderdate AS DATE)) AS INT) AS day, count(*) AS n_orders
          FROM orders GROUP BY 1),
        l AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
            CAST(l_shipdate AS DATE)) AS INT) AS day, count(*) AS n_ships
          FROM lineitem GROUP BY 1)
        SELECT COALESCE(o.day, l.day) AS day,
          COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
        FROM o FULL OUTER JOIN l ON o.day = l.day
        ORDER BY day NULLS FIRST""")),
  )
}
