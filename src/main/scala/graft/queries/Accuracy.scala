package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{HeavyHitters, Similarity}

/** Accuracy contracts of the approximate operators as driver-checkable
  * rows (round-4 verdict item 5): the HLL error bound and the ANN
  * recall@k were previously only ScalaTest'd, invisible to the
  * CORRECTNESS gate. Each query measures the accuracy metric inside
  * the engine (fully distributed — the only driver-side values are the
  * literals) and emits (metric, bound, ok); the DuckDB oracle is the
  * CONTRACT — constants with ok=true — so a regression that pushes a
  * sketch or index outside its bound flips the row red in
  * CORRECTNESS_r{N}.json, not just in a test report.
  *
  * The measured value itself is deliberately not a column: it is
  * engine- and SF-dependent (a different corpus moves recall), so
  * hash-comparing it against a constant would pin the oracle to one
  * dataset. The bound is the portable contract; the raw values stay
  * asserted (tighter) in ApproxDistinctSpec / SimilaritySpec.
  */
object Accuracy {

  /** recall@k of `approx` against ground-truth `exact`, both shaped
    * (qid, vec_id, ...): fraction of true top-k pairs the approximate
    * index recovered. One broadcast-sized join + a global agg — no
    * collect. */
  private def recallRow(exact: DataFrame, approx: DataFrame,
      metric: String, bound: Double): DataFrame =
    exact.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
        Seq("qid", "vec_id"), "left")
      .agg((sum(coalesce(col("hit"), lit(0L))) /
        count(lit(1)).cast("double")).as("recall"))
      .select(lit(metric).as("metric"), lit(bound).as("bound"),
        (col("recall") >= bound).as("ok"))

  private val Dim = 64
  private val K = 10
  private val QueryPred = "vec_id < 8"

  val all: Seq[Q] = Seq(

    // ---- HLL sketch vs exact distinct (q16's accuracy contract) -----
    // approx_count_distinct's documented default rSD is 5%; the 3·rSD
    // (+1 for integer truncation) envelope is the same bound
    // ApproxDistinctSpec asserts. Both estimates and both exact counts
    // run in ONE aggregate pass over lineitem.
    Q("q26_hll_accuracy",
      (s, dir) => {
        val agg = Tables(s, dir, "lineitem").agg(
          approx_count_distinct(col("l_partkey")).as("est_p"),
          countDistinct(col("l_partkey")).as("ex_p"),
          approx_count_distinct(col("l_orderkey")).as("est_o"),
          countDistinct(col("l_orderkey")).as("ex_o"))
        def row(name: String, est: String, ex: String) =
          agg.select(lit(name).as("metric"), lit(0.15).as("bound"),
            (abs(col(est) - col(ex)) <=
              lit(3 * 0.05) * col(ex) + lit(1)).as("ok"))
        row("hll_orderkey_3rsd", "est_o", "ex_o")
          .unionByName(row("hll_partkey_3rsd", "est_p", "ex_p"))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'hll_orderkey_3rsd' AS metric, CAST(0.15 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'hll_partkey_3rsd', CAST(0.15 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- ANN recall@10 vs brute force (s03/s04's accuracy contract) -
    // Ground truth is the exact top-k (s01's operator); recall counts
    // recovered (qid, neighbor) pairs. Bounds sit safely below the
    // measured values (deterministic: md5-derived portable hyperplanes
    // since r12, vec_id-ordered k-means sample; IVF 0.80 @sf0.01 /
    // 0.99 @sf0.1, multiprobe LSH ≥ 0.9 at every SF) but far above
    // where a broken index (empty buckets, wrong probe set) lands.
    // s03 is also hash-exact now (PortableLsh); this row still gates
    // its APPROXIMATION quality — the oracle replays the same buckets,
    // so a recall collapse would hash-match yet ship bad neighbors.
    Q("s05_ann_recall",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val exact = graft.operators.Frontier.pin(
          Similarity.bruteForceTopK(s, emb, expr(QueryPred), K))
          // ground truth feeds all three recall rows
        val lsh = Similarity.lshTopK(s, emb, expr(QueryPred), K)
        val ivf = Similarity.ivfTopK(s, emb, expr(QueryPred), K)
        val sq8 = Similarity.ivfSq8TopK(s, emb, expr(QueryPred), K)
        val pq = Similarity.ivfPqTopK(s, emb, expr(QueryPred), K)
        // the residual-encoded variant measures at equal bytes; its
        // recall dominates raw PQ (SimilaritySpec pins ≥), so the same
        // floor gates it
        val pqr = Similarity.ivfPqTopK(s, emb, expr(QueryPred), K,
          residual = true)
        // filtered search: ground truth and index both label-scoped
        // (s10/s11); the scope shrinks each cell's candidate pool, so
        // the probe runs at nprobe=8 — same floor as the rest
        val fExact = graft.operators.Frontier.pin(
          Similarity.bruteForceTopK(s, emb, expr(QueryPred), K,
            scope = Seq("label")))
        val fIvf = Similarity.ivfTopK(s, emb, expr(QueryPred), K,
          nprobe = 8, scope = Seq("label"))
        recallRow(fExact, fIvf, "filtered_ivf_recall_at_10", 0.6)
          .unionByName(recallRow(exact, ivf, "ivf_recall_at_10", 0.6))
          .unionByName(recallRow(exact, pq, "ivfpq_recall_at_10", 0.6))
          .unionByName(recallRow(exact, pqr, "ivfpq_res_recall_at_10", 0.6))
          .unionByName(recallRow(exact, sq8, "ivfsq8_recall_at_10", 0.6))
          .unionByName(recallRow(exact, lsh, "lsh_recall_at_10", 0.6))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'filtered_ivf_recall_at_10' AS metric, CAST(0.6 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'ivf_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'ivfpq_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'ivfpq_res_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'ivfsq8_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'lsh_recall_at_10', CAST(0.6 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- GK quantile sketch (q20's approximate sibling) --------------
    // percentile_approx is the Greenwald–Khanna mergeable sketch with
    // the documented guarantee rank(est) ∈ [(p−ε)n, (p+ε)n], ε =
    // 1/accuracy. The contract measures the est's ACTUAL rank with a
    // second aggregate over the same table (one pass each, est rides a
    // broadcast) and checks the rank-error envelope (+1 for ties/
    // truncation) — completing the sketch family's driver gates: HLL
    // (q26), Misra–Gries (q31), Bloom (d18), GK (here).
    Q("q33_quantile_sketch",
      (s, dir) => {
        val acc = 100
        val li = Tables(s, dir, "lineitem")
        val est = li.agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).as("e50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(acc)).as("e95"),
          count(lit(1)).as("n"))
        val ranks = li.crossJoin(broadcast(est)).agg(
          sum(when(col("l_extendedprice") <= col("e50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("l_extendedprice") <= col("e95"), 1L).otherwise(0L)).as("r95"),
          first(col("n")).as("n"))
        def row(metric: String, r: String, p: Double) =
          ranks.select(lit(metric).as("metric"),
            lit(1.0 / acc).as("bound"),
            (abs(col(r) - lit(p) * col("n")) <=
              col("n").cast("double") / acc + 1).as("ok"))
        row("gk_p50_rank_error", "r50", 0.5)
          .unionByName(row("gk_p95_rank_error", "r95", 0.95))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'gk_p50_rank_error' AS metric, CAST(0.01 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'gk_p95_rank_error', CAST(0.01 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- q34: Count-Min sketch token frequencies ---------------------
    // The frequency-estimate sketch next to q31's Misra–Gries: a 4×1024
    // CMS over every token occurrence of `documents`, probed at the
    // exact top-20 tokens. Unlike the other sketches this row is fully
    // HASH-EXACT, not a contract: the md5 hash rows are bit-identical
    // in DuckDB, so the oracle replays the sketch itself — estimates,
    // collisions and all. over_n ≥ 0 for every key is the CMS
    // guarantee made visible in the output (CountMinSpec asserts it;
    // the hash compare pins the exact values).
    Q("q34_cms_frequency",
      (s, dir) => {
        import graft.functions.TextFunctions
        import graft.operators.CountMin
        val (d, w) = (4, 1024)
        val toks = Tables(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("k"))
        val sk = CountMin.sketch(toks, "k", d, w)
        // top is consumed twice (probe keys + final join) — pin the
        // 20-row frontier so the exact groupBy runs once
        val top = graft.operators.Frontier.pin(
          toks.groupBy("k").agg(count(lit(1)).as("exact_n"))
            .orderBy(desc("exact_n"), asc("k")).limit(20))
        CountMin.estimate(sk, top.select("k"), "k", d, w)
          .join(top, "k")
          .select(col("k").as("token"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("over_n"))
          .orderBy("token")
      },
      Some({
        import graft.functions.TextFunctions
        import graft.operators.CountMin
        val (d, w) = (4, 1024)
        s"""WITH tk AS (SELECT unnest(${TextFunctions.sqlTokens("text")}) AS k
            FROM documents),
          rs AS (SELECT unnest(range(0, $d)) AS ri),
          sk AS (SELECT ri, ${CountMin.sqlBucket("k", "ri", w)} AS b,
              count(*) AS c
            FROM tk CROSS JOIN rs GROUP BY ri, b),
          ex AS (SELECT k, count(*) AS exact_n FROM tk GROUP BY k
            ORDER BY exact_n DESC, k LIMIT 20),
          pb AS (SELECT ex.k, rs.ri,
              ${CountMin.sqlBucket("ex.k", "rs.ri", w)} AS b
            FROM ex CROSS JOIN rs),
          est AS (SELECT pb.k, min(COALESCE(sk.c, 0)) AS cms_est
            FROM pb LEFT JOIN sk ON sk.ri = pb.ri AND sk.b = pb.b
            GROUP BY pb.k)
          SELECT ex.k AS token, ex.exact_n, est.cms_est,
            est.cms_est - ex.exact_n AS over_n
          FROM ex JOIN est ON ex.k = est.k ORDER BY token NULLS FIRST"""
      })),

    // ---- q37: sketch-based corpus OVERLAP estimation -----------------
    // "How much does crawl B overlap crawl A" WITHOUT a join: HLL
    // sketches of A's, B's, and A∪B's fingerprint sets in ONE
    // partial-aggregated pass (conditional inputs — nulls don't
    // register), inclusion-exclusion gives |A∩B|. At 100 TB this is
    // the join-free planning number run BEFORE committing to a d01
    // dedup of the union; HLL sketches are mergeable, so per-shard
    // sketches combine without re-reading either corpus. Fixture:
    // A = doc_id%10 < 7, B = doc_id%10 ≥ 3 → overlap is 40% of the
    // corpus at ANY SF (proportions, not absolute ids), which keeps
    // the non-vacuity row (true overlap ≫ the error envelope)
    // SF-independent. The envelope is the compounded 3·rSD of the
    // three estimates, ≤ 3·rsd·(|A|+|B|) + slack.
    Q("q37_overlap_estimate",
      (s, dir) => {
        val fp = graft.functions.TextFunctions.fingerprint(col("text"))
        val inA = col("doc_id") % 10 < 7
        val inB = col("doc_id") % 10 >= 3
        val agg = Tables(s, dir, "documents").agg(
          approx_count_distinct(when(inA, fp)).as("est_a"),
          approx_count_distinct(when(inB, fp)).as("est_b"),
          approx_count_distinct(when(inA || inB, fp)).as("est_u"),
          countDistinct(when(inA, fp)).as("ex_a"),
          countDistinct(when(inB, fp)).as("ex_b"),
          countDistinct(when(inA && inB, fp)).as("ex_i"))
          .withColumn("est_i", col("est_a") + col("est_b") - col("est_u"))
          .withColumn("env",
            lit(3 * 0.05) * (col("ex_a") + col("ex_b")) + lit(3))
        def row(metric: String, ok: org.apache.spark.sql.Column) =
          agg.select(lit(metric).as("metric"), lit(0.15).as("bound"),
            ok.as("ok"))
        row("hll_overlap_within_envelope",
            abs(col("est_i") - col("ex_i")) <= col("env"))
          .unionByName(row("hll_overlap_nonvacuous",
            col("ex_i").cast("double") > col("env")))
          .unionByName(row("hll_overlap_positive", col("est_i") > 0))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'hll_overlap_nonvacuous' AS metric, CAST(0.15 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'hll_overlap_positive', CAST(0.15 AS DOUBLE), true
          UNION ALL
          SELECT 'hll_overlap_within_envelope', CAST(0.15 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- MMR re-rank contract (s12's driver gate) --------------------
    // The three partitioning-invariant guarantees of the greedy MMR
    // selection, measured fully distributed (pairwise sims are
    // |q|·k²/2 rows — trivial at any scale since k is fixed):
    //   1. rank-1 = the exact top-1 (the first greedy pick has no
    //      diversity penalty, so λ·rel alone decides it);
    //   2. relevance retention: Σcos(MMR) ≥ 0.8·Σcos(exact top-k) —
    //      diversity may only trade away a bounded slice of relevance;
    //   3. diversity no worse: mean pairwise sim within the MMR set ≤
    //      within the exact top-k set (the reason the operator exists).
    Q("s13_mmr_contract",
      (s, dir) => {
        graft.functions.VectorFunctions.register(s)
        val emb = Tables(s, dir, "embeddings")
        val exact = graft.operators.Frontier.pin(
          Similarity.bruteForceTopK(s, emb, expr(QueryPred), K))
        val mmr = graft.operators.Frontier.pin(
          Similarity.mmrTopK(s, emb, expr(QueryPred), K))
        def meanPairSim(df: DataFrame, as: String) = {
          def side(n: String) = df
            .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
            .select(col("qid"), col("vec_id").as(s"i$n"),
              col("embedding").as(s"e$n"))
          side("a").join(side("b"), Seq("qid"))
            .filter(col("ia") < col("ib"))
            .agg(avg(expr("cosine_sim(ea, eb)")).as(as))
        }
        // all three checks stay in the engine: 1-row aggs cross-joined
        val t1 = exact.filter(col("rank") === 1)
          .select(col("qid"), col("vec_id").as("ev"))
          .join(mmr.filter(col("rank") === 1)
            .select(col("qid"), col("vec_id").as("mv")), "qid")
          .agg(sum(when(col("ev") === col("mv"), 0).otherwise(1)).as("bad"))
        // broadcast the 1-row sides explicitly: AQE happens to pick a
        // broadcast NLJ today, but a 1-row cross join must never be
        // left to plan as a shuffled cartesian (PlanSpec gates this
        // across every registered query)
        val rel = exact.agg(sum(col("cos")).as("se"))
          .crossJoin(broadcast(mmr.agg(sum(col("cos")).as("sm"))))
        val div = meanPairSim(exact, "de")
          .crossJoin(broadcast(meanPairSim(mmr, "dm")))
        def row(metric: String, bound: Double, src: DataFrame,
            ok: org.apache.spark.sql.Column) =
          src.select(lit(metric).as("metric"), lit(bound).as("bound"),
            ok.as("ok"))
        row("mmr_diversity_no_worse", 0.0, div, col("dm") <= col("de"))
          .unionByName(row("mmr_relevance_retention", 0.8, rel,
            col("sm") >= lit(0.8) * col("se")))
          .unionByName(row("mmr_top1_preserved", 0.0, t1,
            col("bad") === 0))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'mmr_diversity_no_worse' AS metric, CAST(0.0 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'mmr_relevance_retention', CAST(0.8 AS DOUBLE), true
          UNION ALL
          SELECT 'mmr_top1_preserved', CAST(0.0 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- Misra–Gries heavy hitters (the frequent-items sketch) -------
    // k=4 counters over documents.lang: 'en' holds ~44% of the corpus,
    // so the heavy set {freq > n/4} is non-empty (gated by the third
    // row — a vacuously-true guarantee proves nothing). The surviving
    // counter VALUES are partitioning-dependent; the three rows gate
    // exactly the sketch's partitioning-INVARIANT guarantees, which is
    // what makes the query oracle-checkable: every heavy key reported,
    // every reported count a lower bound within n/k, heavy set
    // non-empty. Exact counts and the sketch both run distributed; the
    // only driver values are the literals.
    Q("q31_heavy_hitters",
      (s, dir) => {
        val mg = udaf(new HeavyHitters.HeavyHittersAgg(4))
        val docs = Tables(s, dir, "documents")
        val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
        val ent = docs.agg(mg(col("lang")).as("hh"))
          .select(explode(col("hh")).as("e"))
          .select(col("e.key").as("lang"), col("e.cnt").as("mg_cnt"))
        val joined = docs.groupBy("lang")
          .agg(count(lit(1)).cast("double").as("ex"))
          .crossJoin(broadcast(nDf))
          .join(ent, Seq("lang"), "left")
        def row(metric: String, ok: org.apache.spark.sql.Column) =
          joined.agg(ok.as("ok")).select(lit(metric).as("metric"),
            lit(0.25).as("bound"), col("ok"))
        row("mg_all_heavy_reported",
            sum(when(col("ex") > col("n") / 4 && col("mg_cnt").isNull,
              1).otherwise(0)) === 0)
          .unionByName(row("mg_counts_lower_bounds_within_nk",
            sum(when(col("mg_cnt").isNotNull &&
              (col("mg_cnt") > col("ex") ||
                col("ex") - col("mg_cnt") > col("n") / 4),
              1).otherwise(0)) === 0))
          .unionByName(row("mg_nonvacuous",
            sum(when(col("ex") > col("n") / 4, 1).otherwise(0)) >= 1))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'mg_all_heavy_reported' AS metric, CAST(0.25 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'mg_counts_lower_bounds_within_nk', CAST(0.25 AS DOUBLE), true
          UNION ALL
          SELECT 'mg_nonvacuous', CAST(0.25 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),
  )
}
