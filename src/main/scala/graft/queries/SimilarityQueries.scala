package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{AnnIndex, KnnGraphIndex, PortableIvf, Similarity}

/** Similarity-search queries over `embeddings` (64-dim float).
  *
  * s01 (exact top-k) and s02 (near-dup pairs) use the f32-chain cosine
  * so DuckDB replays them bit-exactly — and since r12 so does EVERY
  * member of the family: s03 via [[PortableLsh]]'s md5-derived sign
  * chains, and s04/s07/s08/s09/s11/s12 via [[PortableIvf]]'s
  * iteration-by-iteration k-means replay (the trainer's arithmetic was
  * order-pinned all along; the oracle text just says so in SQL).
  * no_oracle: 0 — recall vs s01 additionally stays contract-gated
  * (s05), because a hash row proves the engines AGREE, not that the
  * approximation is any good. */
object SimilarityQueries {

  private val Dim = 64
  private val K = 10
  private val QueryPred = "vec_id < 8"

  /** [[QueryPred]] rendered against a table alias, for the
    * [[PortableIvf]] oracle texts (the predicate appears in CTEs where
    * `vec_id` alone would be ambiguous). */
  private val PredOn: String => String = a => s"$a.vec_id < 8"

  /** Shared by s08 and s09: the persisted-index probe is bit-identical
    * to the in-memory IVF-PQ at equal parameters (same frozen model),
    * so ONE oracle text hash-checks both — including, for s09, the
    * build→persist→probe lifecycle. */
  private val IvfPqOracle = PortableIvf.ivfPqOracleSql(Dim, K,
    nCells = 16, nprobe = 4, m = 8, ksub = 32, shortlist = 60, PredOn)

  /** s01's oracle — the exact top-k ground truth. Shared by s17: IVF
    * with every cell probed must degenerate to exactly this. */
  private val ExactKnnOracle =
    s"""WITH n AS (SELECT vec_id, embedding,
          ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
      q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
        FROM n WHERE $QueryPred),
      c AS (SELECT qid, vec_id,
          CAST(${chainDot("qe", "embedding", Dim, 1)} AS DOUBLE) / (qn * nrm) AS cos
        FROM n, q WHERE vec_id <> qid),
      r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
      SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $K
      ORDER BY qid NULLS FIRST, rank NULLS FIRST"""

  /** s10's oracle — label-scoped exact top-k. Shared by s22: filtered
    * IVF with every cell probed must degenerate to exactly this. */
  private val FilteredKnnOracle =
    s"""WITH n AS (SELECT vec_id, label, embedding,
          ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
      q AS (SELECT vec_id AS qid, label, embedding AS qe, nrm AS qn
        FROM n WHERE $QueryPred),
      c AS (SELECT qid, n.vec_id,
          CAST(${chainDot("qe", "n.embedding", Dim, 1)} AS DOUBLE)
            / (qn * n.nrm) AS cos
        FROM n JOIN q ON n.label = q.label AND n.vec_id <> q.qid),
      r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
      SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $K
      ORDER BY qid NULLS FIRST, rank NULLS FIRST"""

  /** s06's oracle — SQ8 codes + exact re-rank. Shared by s18: IVF-SQ8
    * with every cell probed scans the same full code set, so it must
    * produce exactly s06's result. */
  private val Sq8Oracle =
    s"""WITH ma AS (SELECT max(list_max(list_transform(embedding,
          x -> abs(x)))) AS m FROM embeddings),
      z AS (SELECT vec_id, embedding, list_transform(embedding,
          x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / CAST(m AS DOUBLE))
            AS INT)) AS qv
        FROM embeddings, ma),
      q AS (SELECT vec_id AS qid, qv AS qq FROM z WHERE $QueryPred),
      sc AS (SELECT qid, z.vec_id,
          CAST(${chainDot("qq", "qv", Dim, 1)} AS DOUBLE) AS cos
        FROM z, q WHERE z.vec_id <> qid),
      sl AS (SELECT qid, vec_id, row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vec_id) AS r FROM sc),
      cand AS (SELECT qid, vec_id FROM sl WHERE r <= 30),
      n AS (SELECT vec_id, embedding,
          ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
      x AS (SELECT c.qid, c.vec_id,
          CAST(${chainDot("qe.embedding", "e.embedding", Dim, 1)} AS DOUBLE)
            / (qe.nrm * e.nrm) AS cos
        FROM cand c JOIN n qe ON qe.vec_id = c.qid
          JOIN n e ON e.vec_id = c.vec_id),
      r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM x)
      SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $K
      ORDER BY qid NULLS FIRST, rank NULLS FIRST"""

  val all: Seq[Q] = Seq(

    Q("s01_knn_bruteforce",
      (s, dir) => {
        // norms precomputed per side (O(n)), only the dot product runs
        // in pair space — the shape that survives a 100× scale-up
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val q = emb.filter(expr(QueryPred))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("nrm").as("qn"))
        val scored = emb
          .select(col("vec_id"), col("embedding").as("e"), col("nrm").as("en"))
          .join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("cos",
            expr(s"CAST(${chainDot("qe", "e", Dim, 0)} AS DOUBLE)") / (col("qn") * col("en")))
        // partition-local top-k (map-side combined) — only ≤k rows per
        // (partition, qid) reach the exchange, never the full pair set
        Similarity.topKPerQuery(scored, K).orderBy("qid", "rank")
      },
      Some(ExactKnnOracle)),

    Q("s02_embedding_neardup",
      (s, dir) => {
        // all-pairs is the correctness baseline; the scale path is LSH
        // bucketing (s03) which never materializes the pair space.
        // The codegen'd cosine_sim expression gates the 2M-pair space
        // at a slightly looser threshold (|double-acc − f32-chain| ≪
        // 1e-3), then the oracle-exact f32 chain runs only on the few
        // surviving pairs — lossless w.r.t. the 0.35 cut.
        graft.functions.VectorFunctions.register(s)
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        // single-file scans arrive as one partition; the O(n²) probe
        // side must be spread across cores or the loop join runs in
        // one task no matter how many executors exist
        val par = s.sparkContext.defaultParallelism * 2
        val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
          col("nrm").as("na")).repartition(par)
        val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
          col("nrm").as("nb"))
        // Stage 1: the codegen'd cosine_sim gates the 2M-pair loop join
        // (cheap, tight loop). Stage 2: the oracle-exact f32 chain runs
        // only on the ~0.2% surviving candidates. localCheckpoint is
        // the optimizer barrier — without it Catalyst pushes the
        // 192-term chain into the join condition where it evaluates on
        // every pair (measured 20x slower).
        val exactCos =
          expr(s"CAST(${chainDot("ea", "eb", Dim, 0)} AS DOUBLE)") / (col("na") * col("nb"))
        val cands = a.join(b, col("id_a") < col("id_b") &&
            expr("cosine_sim(ea, eb)") >= 0.349)
          .localCheckpoint()
        cands.withColumn("cos", exactCos)
          .filter(col("cos") >= 0.35)
          .select("id_a", "id_b", "cos")
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
        c AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            CAST(${chainDot("a.embedding", "b.embedding", Dim, 1)} AS DOUBLE)
              / (a.nrm * b.nrm) AS cos
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos FROM c WHERE cos >= 0.35
        ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""")),

    // ---- s03: multiprobe LSH — now HASH-EXACT at its production
    // point (r12): hyperplane signs derive from md5 (PortableLsh, no
    // JVM RNG), projections and cosines are f32 ±chains, so the
    // buckets — and the full top-k — replay bit-identically in DuckDB.
    // The q16 graduation applied to the LSH family; s05's lsh recall
    // row still gates the approximation quality.
    Q("s03_knn_lsh",
      (s, dir) =>
        Similarity.lshTopK(s, Tables(s, dir, "embeddings"), expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(graft.operators.PortableLsh.oracleSql(Dim, K, QueryPred))),

    Q("s04_knn_ivf",
      (s, dir) =>
        Similarity.ivfTopK(s, Tables(s, dir, "embeddings"), expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(PortableIvf.ivfOracleSql(Dim, K, nCells = 16, nprobe = 3, PredOn))),

    // ---- s07: IVF-SQ8 — int8 codes inside the IVF cells --------------
    // The composed production index (both scale levers at once: nprobe
    // cells bound the rows scanned, int8 codes bound the bytes per
    // row, exact re-rank restores precision). Hash-exact since r12:
    // the [[PortableIvf]] centroid replay composes with the s06 code
    // oracle, so the WHOLE composition is one DuckDB text; s05's
    // ivfsq8 contract row still gates recall@10 vs the exact s01.
    Q("s07_knn_ivf_sq8",
      (s, dir) =>
        Similarity.ivfSq8TopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(PortableIvf.ivfSq8OracleSql(Dim, K, nCells = 16, nprobe = 3,
        shortlist = 30, PredOn))),

    // ---- s08: IVF-PQ — product-quantized codes inside the IVF cells --
    // The heaviest-compression family member: 8 sub-byte PQ codes per
    // 64-dim vector (vs SQ8's 64 bytes), scored by per-query ADC
    // lookup tables riding the broadcast, exact re-rank on the
    // shortlist. Hash-exact since r12: coarse cells AND per-subspace
    // codebooks replay through [[PortableIvf]] (the ADC fold is a
    // j-ordered f64 list_reduce); s05's pq contract row still gates
    // recall@10 vs exact s01.
    Q("s08_knn_ivf_pq",
      (s, dir) =>
        Similarity.ivfPqTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(IvfPqOracle)),

    // ---- s29: IVF-PQ with RESIDUAL codes (the FAISS default) ---------
    // s08's accuracy upgrade at equal bytes: codebooks train on
    // (v − its cell's centroid), codes encode each vector's residual
    // against its OWN cell, and the ADC score folds the missing
    // dot(q, centroid) back in per (query, probed cell). Previously
    // exercised only inside s05's accuracy contract and s16's
    // retrain body; hash-exact since r12 — the residual arithmetic
    // (per-dim f32 subs, qcellDot's f64 accumulation) replays through
    // the same [[PortableIvf]] text with the residual CTEs added.
    Q("s29_ivfpq_residual",
      (s, dir) =>
        Similarity.ivfPqTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K, residual = true)
          .orderBy("qid", "rank"),
      Some(PortableIvf.ivfPqOracleSql(Dim, K, nCells = 16, nprobe = 4,
        m = 8, ksub = 32, shortlist = 60, PredOn, residual = true))),

    // ---- s09: probe of the PERSISTED ANN index -----------------------
    // The deployed shape of s08 (the d12 story for similarity search):
    // codes live in a cell-partitioned table built once, the probe
    // reads only the nprobe cells per query (dynamic partition pruning
    // — AnnIndexSpec asserts the filter reaches the scan), re-rank
    // pulls raw vectors from the source. Output is bit-identical to
    // s08 at equal parameters (same frozen model) — so since r12 it
    // shares s08's [[PortableIvf]] oracle TEXT, and the driver's hash
    // row now also proves the build→persist→probe lifecycle changes
    // nothing (the strongest form of the "same frozen model" claim).
    Q("s09_ann_index_probe",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        AnnIndex.writeAnnIndex(
          emb.select(col("vec_id"), col("embedding")), "graft_s09_idx")
        AnnIndex.probeAnnIndex(s, "graft_s09_idx", emb, expr(QueryPred), K)
          .orderBy("qid", "rank")
      },
      Some(IvfPqOracle)),

    // ---- s06: int8-quantized ANN with exact re-rank ------------------
    // Unlike s03/s04, quantized search IS oracle-exact: the codes,
    // integer dot scores, shortlist cut and f32 re-rank are all
    // deterministic integer/chain arithmetic DuckDB replays verbatim —
    // so the third ANN family gets a hash row, not a rows-only check.
    Q("s06_knn_quantized",
      (s, dir) =>
        Similarity.quantizedTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K, shortlist = 30)
          .orderBy("qid", "rank"),
      Some(Sq8Oracle)),

    // ---- s10: filtered (scoped) exact search -------------------------
    // Metadata-filtered vector search — the shape every production
    // vector store supports (per-tenant / per-class retrieval): each
    // query sees only candidates whose `label` matches its own. The
    // scope rides the join as an EQUI-key, so s01's broadcast
    // nested-loop becomes a broadcast HASH join on label — the pair
    // space shrinks by the class count instead of scoring everything
    // and discarding. Same f32-chain cosine as s01 → hash-exact.
    Q("s10_filtered_knn",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val q = emb.filter(expr(QueryPred))
          .select(col("vec_id").as("qid"), col("label"),
            col("embedding").as("qe"), col("nrm").as("qn"))
        val scored = emb
          .select(col("vec_id"), col("label"), col("embedding").as("e"),
            col("nrm").as("en"))
          .join(broadcast(q), Seq("label"))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos",
            expr(s"CAST(${chainDot("qe", "e", Dim, 0)} AS DOUBLE)") / (col("qn") * col("en")))
        Similarity.topKPerQuery(scored, K).orderBy("qid", "rank")
      },
      Some(FilteredKnnOracle)),

    // ---- s11: filtered ANN (scope keys inside the IVF probe) ---------
    // s10's scale path: the label scope joins WITH the cell key, so
    // the probe scans only same-label rows of the nprobe cells —
    // pre-filtering, never score-and-discard. Hash-exact since r12
    // (the [[PortableIvf]] replay carries the scope key through the
    // candidate join); s05's filtered contract row still gates
    // recall@10 vs the exact filtered s10 (nprobe raised to 8: the
    // standard mitigation for scopes shrinking the per-cell pool).
    Q("s11_filtered_ivf",
      (s, dir) =>
        Similarity.ivfTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K, nprobe = 8, scope = Seq("label"))
          .orderBy("qid", "rank"),
      Some(PortableIvf.ivfOracleSql(Dim, K, nCells = 16, nprobe = 8,
        PredOn, scope = Some("label")))),

    // ---- s12: MMR diversity re-rank ----------------------------------
    // Maximal marginal relevance over each query's 30-candidate pool:
    // greedy λ·rel − (1−λ)·max-sim-to-selected, so near-duplicate
    // candidates can't crowd the context (RAG selection, few-shot
    // retrieval). Hash-exact since r12: the greedy IS replayable —
    // max over the selected set is order-independent, each step's
    // strict-improvement argmax is a row_number, and [[PortableIvf]]
    // unrolls the k steps as CTE pairs. s13's three contract rows and
    // SimilaritySpec's λ=1 ≡ top-k / partitioning-invariance pins
    // keep gating the semantics.
    Q("s12_mmr_rerank",
      (s, dir) =>
        Similarity.mmrTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(PortableIvf.mmrOracleSql(Dim, K, pool = 30, PredOn))),

    // ---- s30: hybrid (BM25-family + vector) retrieval, RRF-fused -----
    // The production RAG-retrieval shape: the lexical side scores
    // exact-term evidence over the inverted index (df-capped token
    // equi-join, TRUE log-BM25: ln(1 + idf core) × tf saturation, the
    // ln bit-portable via HybridRetrieval.lnChainSql's sqrt chain,
    // DECIMAL-summed per pair), the vector side is
    // s01's chain-cosine top-k, and reciprocal-rank fusion combines
    // the two lists on RANKS (1/(60+r) each side) — never comparing
    // the incommensurable scores. Both sides cut through the bounded
    // TopKAgg; the fused pool is ≤ 2·kEach rows per query. Hash-exact:
    // every factor is either exact-integer arithmetic, one shared f64
    // scalar text, or a DECIMAL sum.
    Q("s30_hybrid_rrf",
      (s, dir) => {
        val lex = graft.operators.HybridRetrieval.lexicalTopK(
          Tables(s, dir, "documents"), expr("doc_id < 8"), kEach = 20)
        val vec = graft.operators.HybridRetrieval.exactVecTopK(
          Tables(s, dir, "embeddings"), expr(QueryPred), Dim, kEach = 20)
        graft.operators.HybridRetrieval.rrfFuse(lex, vec, K)
          .orderBy("qid", "rank")
      },
      Some(graft.operators.HybridRetrieval.oracleSql(Dim, K, kEach = 20,
        c = 60, predDoc = "doc_id < 8", predVec = "vec_id < 8"))),

    // ---- s14: filtered probe of the PERSISTED ANN index --------------
    // s10/s11's scope applied to the deployed index: `label` is stored
    // WITH the codes and stamped in the table properties, the probe
    // reads the stamp and joins on (cell, label) — so the pruned cell
    // scan never scores another scope's codes, and append/compact
    // carry the stamp (an index that silently unscoped after
    // maintenance would leak cross-tenant results). Engine-specific
    // like its s09 parent, so the registered query IS the contract
    // (the d18 pattern): scope containment violations = 0, recall@10
    // vs the scoped exact s10 ≥ 0.6, non-vacuous.
    Q("s14_filtered_ann_index",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        AnnIndex.writeAnnIndex(
          emb.select(col("vec_id"), col("embedding"), col("label")),
          "graft_s14_idx", scope = Seq("label"))
        // the index probe and the brute-force ground truth are
        // independent computations — pin them concurrently (guide
        // §2.6 / Par doc); content unchanged
        var probe: org.apache.spark.sql.DataFrame = null
        var exact: org.apache.spark.sql.DataFrame = null
        graft.operators.Par.run(s, Seq(
          () => probe = graft.operators.Frontier.pin(
            AnnIndex.probeAnnIndex(s, "graft_s14_idx", emb,
              expr(QueryPred), K, nprobe = 8)),
          () => exact = graft.operators.Frontier.pin(
            Similarity.bruteForceTopK(s, emb, expr(QueryPred), K,
              scope = Seq("label")))))
        val lbl = emb.select(col("vec_id"), col("label"))
        val leaks = probe
          .join(lbl.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
          .join(lbl, "vec_id")
          .agg(sum(when(col("label") =!= col("ql"), 1).otherwise(0)).as("bad"))
        val rec = exact.select(col("qid"), col("vec_id"))
          .join(probe.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
            Seq("qid", "vec_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0L))) /
            count(lit(1)).cast("double")).as("recall"))
        val nv = probe.agg(count(lit(1)).as("n"))
        def row(metric: String, bound: Double,
            src: org.apache.spark.sql.DataFrame,
            ok: org.apache.spark.sql.Column) =
          src.select(lit(metric).as("metric"), lit(bound).as("bound"),
            ok.as("ok"))
        row("sidx_non_vacuous", 0.0, nv, col("n") > 0)
          .unionByName(row("sidx_recall_at_10", 0.6, rec,
            col("recall") >= 0.6))
          .unionByName(row("sidx_scope_containment", 0.0, leaks,
            col("bad") === 0))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'sidx_non_vacuous' AS metric, CAST(0.0 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'sidx_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'sidx_scope_containment', CAST(0.0 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- s15: RADIUS search (all neighbors within a cosine bound) ----
    // The range-query sibling of s01's top-k: every corpus vector with
    // cos ≥ τ of each probe, result size data-dependent instead of k.
    // Same scale shape as s01 — probes broadcast, norms precomputed
    // per side, only the dot product runs in pair space, and the τ
    // filter is a narrow post-scan predicate (no top-k state needed at
    // all, so unlike s01 nothing accumulates per partition). The IVF
    // cell route (s04) bounds the scanned fraction when τ is tight;
    // this exact form is the correctness baseline and hash-checks via
    // the f32 chain.
    // ---- s16: the retrain lifecycle closing the drift loop -----------
    // The s09/s14 index's missing actuator: a frozen-model index
    // silently decays under distribution drift (appended vectors land
    // far from the build-time centroids, residual PQ codes round
    // harder, shortlist recall drops) — cellStats/driftRatio MEASURE
    // it, retrainAnnIndexIfDrifted ACTS on it, atomically swapping
    // cells+model as one generation. The fixture appends a shifted
    // copy of the corpus (off-distribution but angularly diverse);
    // the contract pins the whole loop: the drift signal trips the
    // threshold, the retrained index clears the family's 0.6 recall
    // floor (the frozen one measurably does not at sf0.1), retrain
    // never worsens recall, and the signal resets to ~1 afterwards.
    // Engine-specific training → the registered query IS the contract
    // (the s14/d18 pattern).
    Q("s16_ann_retrain",
      (s, dir) => {
        import graft.operators.Frontier
        val idx = "graft_s16_idx"
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        AnnIndex.writeAnnIndex(emb, idx, residual = true)
        val drifted = emb.select((col("vec_id") + 1000000000L).as("vec_id"),
          expr("transform(embedding, x -> CAST(x + CAST(0.2 AS FLOAT) AS FLOAT))")
            .as("embedding"))
        AnnIndex.appendToAnnIndex(drifted, idx)
        val all = Frontier.pin(emb.unionByName(drifted))
        val pred = col("vec_id") >= 1000000000L && col("vec_id") < 1000000008L
        val exact = Frontier.pin(Similarity.bruteForceTopK(s, all, pred, K))
        def recallOf(probe: org.apache.spark.sql.DataFrame) =
          Frontier.pin(exact.select(col("qid"), col("vec_id"))
            .join(probe.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
              Seq("qid", "vec_id"), "left")
            .agg((sum(coalesce(col("hit"), lit(0L))) /
              count(lit(1)).cast("double")).as("recall"),
              count(lit(1)).as("n")))
        def probe() = AnnIndex.probeAnnIndex(s, idx, all, pred, K,
          nprobe = 8, shortlist = 250)
        val before = recallOf(probe())
        val (ratio, retrained) =
          AnnIndex.retrainAnnIndexIfDrifted(s, idx, all, maxDrift = 1.25)
        val after = recallOf(probe())
        val reset = AnnIndex.driftRatio(s, idx, all)
        def row(metric: String, bound: Double,
            src: org.apache.spark.sql.DataFrame,
            ok: org.apache.spark.sql.Column) =
          src.select(lit(metric).as("metric"), lit(bound).as("bound"),
            ok.as("ok"))
        row("retrain_non_vacuous", 0.0, after, col("n") > 0)
          .unionByName(row("retrain_recall_at_10", 0.6, after,
            col("recall") >= 0.6))
          .unionByName(row("retrain_recall_improves", 0.0,
            after.select(col("recall").as("ra"))
              .crossJoin(broadcast(before.select(col("recall").as("rb")))),
            col("ra") >= col("rb")))
          .unionByName(row("retrain_signal_reset", 1.05, after,
            lit(reset <= 1.05)))
          .unionByName(row("retrain_triggered", 1.25, after,
            lit(ratio > 1.25 && retrained)))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'retrain_non_vacuous' AS metric, CAST(0.0 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'retrain_recall_at_10', CAST(0.6 AS DOUBLE), true
          UNION ALL
          SELECT 'retrain_recall_improves', CAST(0.0 AS DOUBLE), true
          UNION ALL
          SELECT 'retrain_signal_reset', CAST(1.05 AS DOUBLE), true
          UNION ALL
          SELECT 'retrain_triggered', CAST(1.25 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    Q("s15_radius_search",
      (s, dir) => {
        val Tau = 0.25
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val q = emb.filter(expr(QueryPred))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("nrm").as("qn"))
        emb.select(col("vec_id"), col("embedding").as("e"), col("nrm").as("en"))
          .join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("cos",
            expr(s"CAST(${chainDot("qe", "e", Dim, 0)} AS DOUBLE)") /
              (col("qn") * col("en")))
          .filter(col("cos") >= Tau)
          .select(col("qid"), col("vec_id"), col("cos"))
          .orderBy("qid", "vec_id")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
          FROM n WHERE $QueryPred)
        SELECT qid, vec_id,
          CAST(${chainDot("qe", "embedding", Dim, 1)} AS DOUBLE) / (qn * nrm) AS cos
        FROM n, q WHERE vec_id <> qid
          AND CAST(${chainDot("qe", "embedding", Dim, 1)} AS DOUBLE) / (qn * nrm) >= 0.25
        ORDER BY qid NULLS FIRST, vec_id NULLS FIRST""")),

    // ---- s17/s18: degeneration twins for the rows-only ANN family ----
    // Round-9 verdict ask #4: s04/s07 carry recall CONTRACTS (s05) but
    // no hash oracle — their k-means cells don't replay in DuckDB. At
    // nprobe = nCells, though, the cell partition is exhaustive and
    // the SAME code path must reproduce the exact search: s17 (IVF)
    // hash-checks against s01's oracle, s18 (IVF-SQ8) against s06's.
    // These registered degenerations pin the candidate-generation and
    // re-rank machinery hash-exactly, leaving only the cell-SELECTION
    // quality to the recall contracts — no_oracle drops from 8 to 8-2
    // worth of uncovered machinery.
    Q("s17_ivf_exhaustive",
      (s, dir) =>
        Similarity.ivfExhaustiveTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(ExactKnnOracle)),

    Q("s18_ivfsq8_exhaustive",
      (s, dir) =>
        // every cell probed: the SQ8 candidate scan covers the whole
        // corpus, exactly s06's computation through s07's cell join
        Similarity.ivfSq8TopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K, nCells = 16, nprobe = 16, shortlist = 30)
          .orderBy("qid", "rank"),
      Some(Sq8Oracle)),

    // s19: the PERSISTED index probe's degeneration — every cell of
    // the s09-style index probed, a wide ADC shortlist, the same f32
    // exact re-rank: the whole persisted path (cell partition, PQ
    // codes, LUT scoring, re-rank join) must land exactly on s01's
    // ground truth. The 40×k shortlist absorbs PQ's scoring error on
    // the full corpus; s09 itself stays the production point
    // (nprobe=4, shortlist=60) with its recall contract.
    Q("s19_ann_index_exhaustive",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        AnnIndex.writeAnnIndex(
          emb.select(col("vec_id"), col("embedding")), "graft_s19_idx")
        AnnIndex.probeAnnIndex(s, "graft_s19_idx", emb, expr(QueryPred), K,
            nprobe = 16, shortlist = 400)
          .orderBy("qid", "rank")
      },
      Some(ExactKnnOracle)),

    // s20: the LSH family's degeneration — zero hyperplanes put every
    // vector in one bucket, so the bucket join is exhaustive and the
    // buffered exact re-rank must land on s01's ground truth. Pins the
    // signature/bucket-join/collision-dedup machinery hash-exactly;
    // s03 stays the production point with s05's lsh recall row.
    Q("s20_lsh_exhaustive",
      (s, dir) =>
        Similarity.lshExhaustiveTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K)
          .orderBy("qid", "rank"),
      Some(ExactKnnOracle)),

    // s21: MMR's λ=1 reduction as a REGISTERED hash row (SimilaritySpec
    // already pins it in-engine): with λ=1 the greedy marginal score is
    // pure relevance and ties break by the pool's (cos DESC, vec_id)
    // order, so selecting from an exact-chain-scored pool reproduces
    // s01's top-k — rank by selection order, cos carried from the pool.
    // Pins the greedy flatMapGroups machinery; s12 stays the diversity
    // point gated by s13's contract rows.
    Q("s21_mmr_lambda1",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val q = emb.filter(expr(QueryPred))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("nrm").as("qn"))
        val pool = Similarity.topKPerQuery(
          emb.select(col("vec_id"), col("embedding").as("e"),
              col("nrm").as("en"))
            .join(broadcast(q), col("vec_id") =!= col("qid"))
            .withColumn("cos",
              expr(s"CAST(${chainDot("qe", "e", Dim, 0)} AS DOUBLE)") /
                (col("qn") * col("en"))), 30)
        Similarity.mmrRerank(pool.select("qid", "vec_id", "cos"),
            Tables(s, dir, "embeddings"), K, lambda = 1.0)
          .select("qid", "vec_id", "rank", "cos")
          .orderBy("qid", "rank")
      },
      Some(ExactKnnOracle)),

    // s22: filtered IVF's degeneration — every cell probed with the
    // label scope riding the join, buffered exact re-rank: must equal
    // the filtered exact search (s10's oracle). Pins the scoped
    // candidate generation; s11 stays the production point gated by
    // s05's filtered_ivf recall row.
    Q("s22_filtered_ivf_exhaustive",
      (s, dir) =>
        Similarity.ivfExhaustiveTopK(s, Tables(s, dir, "embeddings"),
            expr(QueryPred), K, scope = Seq("label"))
          .orderBy("qid", "rank"),
      Some(FilteredKnnOracle)),

    // ---- s23: DELETION from the persisted ANN index (tombstones) -----
    // d21's similarity twin: tombstoneAnn records deleted vec_ids
    // (under the writer lease), every probe anti-joins them, the next
    // compaction/retrain reclaims the codes and clears the set. The
    // registered check runs the EXHAUSTIVE probe (s19's degeneration)
    // after deleting vecs 100-119 from a full-corpus index: with every
    // cell probed and a wide shortlist, the result must equal the
    // exact search over the corpus WITHOUT the deleted vectors —
    // hash-exact, so a tombstone that leaked into (or over-filtered)
    // the candidate set flips rows here.
    Q("s23_tombstone_knn",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        AnnIndex.writeAnnIndex(
          emb.select(col("vec_id"), col("embedding")), "graft_s23_idx")
        AnnIndex.tombstoneAnn(s, "graft_s23_idx",
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
            .select("vec_id"))
        AnnIndex.probeAnnIndex(s, "graft_s23_idx", emb, expr(QueryPred), K,
            nprobe = 16, shortlist = 400)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
          FROM n WHERE $QueryPred),
        c AS (SELECT qid, n.vec_id,
            CAST(${chainDot("qe", "n.embedding", Dim, 1)} AS DOUBLE)
              / (qn * n.nrm) AS cos
          FROM n, q WHERE n.vec_id <> qid
            AND n.vec_id NOT BETWEEN 100 AND 119),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $K
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    // ---- s24/s25: k-NN GRAPH (every vector a query) ------------------
    // Corpus-scale graph construction — the substrate for semantic
    // clustering and graph-based dedup (feed the edges to d05's
    // components). The plan is the key difference from s01-s22:
    // queries are corpus-sized, so NOTHING broadcasts — candidates
    // come from a corpus-corpus shuffle equi-join on the IVF cell key,
    // work ≈ nprobe·n²/nCells with nCells scaling against |cell| at
    // 100 TB. s24 is the degeneration gate: at nprobe = nCells over a
    // 300-vector slice, the graph (buffered + exact-re-ranked) must
    // equal the exact k-NN graph — hash-checked in full. s25 is the
    // production point (nprobe = 4): same slice, recall@5 vs the s24
    // ground truth as driver-checkable contract rows (the s05 pattern).
    Q("s24_knn_graph",
      (s, dir) => {
        val sub = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 300).select("vec_id", "embedding")
        Similarity.knnGraph(s, sub, k = 5, nCells = 16, nprobe = 16,
            buffer = 15)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 300),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    Q("s25_knn_graph_recall",
      (s, dir) => {
        import graft.operators.Frontier
        val sub = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 300).select("vec_id", "embedding")
          .localCheckpoint()
        // the two graph constructions (wide vs narrow probe) are
        // independent — pin them concurrently (guide §2.6 / Par doc)
        var exact: org.apache.spark.sql.DataFrame = null
        var approx: org.apache.spark.sql.DataFrame = null
        graft.operators.Par.run(s, Seq(
          () => exact = Frontier.pin(Similarity.knnGraph(s, sub, k = 5,
            nCells = 16, nprobe = 16, buffer = 15)),
          () => approx = Frontier.pin(Similarity.knnGraph(s, sub, k = 5,
            nCells = 16, nprobe = 4))))
        val rec = Frontier.pin(exact.select(col("qid"), col("vec_id"))
          .join(approx.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
            Seq("qid", "vec_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0L))) /
            count(lit(1)).cast("double")).as("recall"),
            count(lit(1)).as("n")))
        def row(metric: String, bound: Double,
            ok: org.apache.spark.sql.Column) =
          rec.select(lit(metric).as("metric"), lit(bound).as("bound"),
            ok.as("ok"))
        row("graph_non_vacuous", 0.0, col("n") > 0)
          .unionByName(row("graph_recall_at_5", 0.5, col("recall") >= 0.5))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'graph_non_vacuous' AS metric, CAST(0.0 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'graph_recall_at_5', CAST(0.5 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- s26/s27: the MAINTAINED k-NN graph (build/append/delete) ----
    // s24's graph as a persisted, incrementally-maintained artifact
    // (KnnGraphIndex): build over vec_id<300, APPEND [300,400) — the
    // batch gains forward edges, stored vectors gain reverse edges —
    // then probe. At nprobe = nCells the maintained graph is EXACT, so
    // s26 hash-checks build+append against the exact k-NN graph over
    // the UNION — candidate generation in both directions, the edge
    // append fencing, and the probe-time top-k merge are all pinned by
    // DuckDB ground truth. s27: build with edgeBuffer=16 (the stored
    // top-21 per vertex), tombstone the 13 ids vec_id%31==5, probe —
    // the result must equal the exact graph over the REMAINING
    // vectors: any exact answer after D deletions has overall rank
    // ≤ k+D ≤ 18, hence is stored, so the deletion-tolerance bound is
    // pinned in DuckDB (the d21/s23 pattern for the graph, PLUS the
    // buffer guarantee — without it deletion would only deplete lists,
    // never promote the next-best neighbor).
    // (Since r12 the append is followed by a RESIZING compaction —
    // 8 → 16 buckets, the grown-corpus path — so the probe that
    // hash-checks against DuckDB runs on the rebucketed layout: the
    // resize's behavior-invisibility is driver-gated here, its layout
    // contracts re-walked at the new count in KnnGraphIndexSpec. s28
    // keeps probing the UNCOMPACTED build+append state, so the pruned
    // multi-file union stays pinned there.)
    Q("s26_graph_index_append",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 400).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb.filter(col("vec_id") < 300),
          "graft_s26_graph", k = 5, nCells = 16, nprobe = 16)
        KnnGraphIndex.appendToKnnGraph(emb.filter(col("vec_id") >= 300),
          "graft_s26_graph")
        KnnGraphIndex.compactKnnGraph(s, "graft_s26_graph",
          numBuckets = Some(16))
        KnnGraphIndex.probeKnnGraph(s, "graft_s26_graph")
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 400),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    Q("s27_graph_index_delete",
      (s, dir) => {
        import s.implicits._
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 400).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb, "graft_s27_graph",
          k = 5, nCells = 16, nprobe = 16, edgeBuffer = 16)
        KnnGraphIndex.tombstoneGraph(s, "graft_s27_graph",
          emb.filter(col("vec_id") % 31 === 5).select("vec_id"))
        KnnGraphIndex.probeKnnGraph(s, "graft_s27_graph")
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 400 AND vec_id % 31 <> 5),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    // ---- s28: SLICE probe of the maintained graph --------------------
    // The r11 layout lever as its own oracle row: the edge table is
    // bucketBy(qid).sortBy(qid), so a qid-scoped probe pushes its
    // predicate into the sorted parquet scan (row-group pruning — the
    // 100 TB path reads slice-sized bytes, measured FLAT at 10× in
    // SCALE.md) and the top-k consumes the bucketed partitioning with
    // ZERO exchanges (KnnGraphIndexSpec walks the plan). Built at
    // nprobe = nCells the graph is exact, so the PRUNED read path —
    // pushed filter, per-file sort, bucket-aligned append files,
    // probe-time top-k over only the slice's rows — hash-checks
    // against DuckDB's exact graph restricted to the slice. The
    // append before the probe makes the slice span BOTH the build's
    // sorted files and an append's bucket-aligned files, so the
    // pruned multi-file union is what's pinned, not a single clean
    // write.
    Q("s28_graph_slice_probe",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 400).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb.filter(col("vec_id") < 300),
          "graft_s28_graph", k = 5, nCells = 16, nprobe = 16)
        KnnGraphIndex.appendToKnnGraph(emb.filter(col("vec_id") >= 300),
          "graft_s28_graph")
        KnnGraphIndex.probeKnnGraph(s, "graft_s28_graph",
            col("qid") >= 150 && col("qid") < 350)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 400),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id
          WHERE q.vec_id >= 150 AND q.vec_id < 350),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    // ---- s58: FILTERED serve on the MAINTAINED graph -----------------
    // The last index family gains the filtered-serving leg (s39/s40
    // gave it to the lex and cell-scan ANN families): a candidacy
    // predicate over the neighbor id, applied to the stored adjacency
    // BEFORE the top-k cut, riding the same edgeBuffer margin
    // deletions do. A materialized graph cannot pre-filter candidate
    // GENERATION (its edges were cut at build time) — the honest
    // contract is top-k over the stored admissible edges, exact
    // wherever the buffer holds >= k admissible (the s27 deletion
    // bound with exclusions; KnnGraphIndexSpec measures the bound's
    // coverage on this fixture). Built exact (nprobe = nCells), so
    // the oracle replays the two-stage cut verbatim: stored
    // top-(k + buffer) -> predicate -> top-k.
    Q("s58_filtered_graph_serve",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 300).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb, "graft_s58_graph", k = 5,
          nCells = 16, nprobe = 16, edgeBuffer = 15)
        KnnGraphIndex.probeKnnGraph(s, "graft_s58_graph",
            candPred = Some(col("vec_id") % 2 === 0))
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 300),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        stored AS (SELECT qid, vec_id, cos FROM (
          SELECT qid, vec_id, cos, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM c)
          WHERE rank <= 20),
        f AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank
          FROM stored WHERE vec_id % 2 = 0)
        SELECT qid, vec_id, rank, cos FROM f WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),

    // ---- s36: AS-OF probe of the persisted ANN index -----------------
    // d25's time-travel story on the vector side, now driver-gated
    // instead of spec-only: compaction publishes gen g+1 retaining g
    // (gcKeep = 2); the append — EXACT COPIES of the query vectors at
    // +1e9 ids, which would take rank 1 with cos = 1 if visible —
    // mutates only the current generation's cells. Probing asOf = g
    // resolves gen-g cells AND gen-g model together (the one-unit
    // member consistency claim), so the result is bit-identical to
    // s08/s09's PortableIvf oracle over the pre-append corpus. The
    // probe's re-rank side carries the appended vectors, so a leaked
    // snapshot surfaces as a hash flip, not a silent drop.
    Q("s36_ann_asof_probe",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        AnnIndex.writeAnnIndex(
          emb.select(col("vec_id"), col("embedding")), "graft_s36_idx")
        AnnIndex.compactAnnIndex(s, "graft_s36_idx", gcKeep = 2)
        val g0 = graft.operators.Generations
          .currentGen(s, "graft_s36_idx").get - 1
        val extras = emb.filter(expr(QueryPred))
          .select((col("vec_id") + 1000000000L).as("vec_id"),
            col("embedding"))
        AnnIndex.appendToAnnIndex(extras, "graft_s36_idx")
        val embAll = emb.select(col("vec_id"), col("embedding"))
          .unionByName(extras)
        AnnIndex.probeAnnIndex(s, "graft_s36_idx", embAll, expr(QueryPred),
            K, asOf = Some(g0))
          .orderBy("qid", "rank")
      },
      Some(IvfPqOracle)),

    // ---- s37: AS-OF probe of the maintained k-NN graph ---------------
    // The same retention story on the graph: the append gives every
    // stored vertex reverse edges into [300, 400) — leaked into the
    // as-of answer they'd displace true neighbors — so probing the
    // retained pre-append generation must reproduce s24's exact graph
    // over vec_id < 300, hash-checked against the same DuckDB text.
    Q("s37_graph_asof_probe",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 400).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb.filter(col("vec_id") < 300),
          "graft_s37_graph", k = 5, nCells = 16, nprobe = 16)
        KnnGraphIndex.compactKnnGraph(s, "graft_s37_graph", gcKeep = 2)
        val g0 = graft.operators.Generations
          .currentGen(s, "graft_s37_graph").get - 1
        KnnGraphIndex.appendToKnnGraph(emb.filter(col("vec_id") >= 300),
          "graft_s37_graph")
        KnnGraphIndex.probeKnnGraph(s, "graft_s37_graph", asOf = Some(g0))
          .orderBy("qid", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings
          WHERE vec_id < 300),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${chainDot("q.embedding", "n.embedding", Dim, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM c)
        SELECT qid, vec_id, rank, cos FROM r WHERE rank <= 5
        ORDER BY qid NULLS FIRST, rank NULLS FIRST""")),
  )
}
