package graft.operators

/** ENGINE-PORTABLE replay of the k-means ANN family — the
  * [[PortableHll]]/[[PortableLsh]] discipline applied to the one
  * remaining engine-specific corner: CENTROID TRAINING. Until round 12
  * the IVF family (s04/s07/s08/s09/s11) and the MMR re-rank (s12) were
  * rows-only "k-means samples don't replay in DuckDB" queries. That
  * claim was never tested — and it is FALSE, because every float
  * operation in [[Similarity.trainCentroids]] / `trainBooksOn` /
  * `nearestCell(s)` / `CosineSimilarity` / the MMR greedy is already
  * order-pinned:
  *
  *  - the training sample is the `sampleN` lowest vec_ids, iterated in
  *    vec_id order (a total order both engines agree on);
  *  - init centroids are the first `nCells` sample vectors verbatim;
  *  - the assignment distance accumulates f64 over per-dim f32
  *    sub/mul terms, LEFT-ASSOCIATED in dim order, ties to the lowest
  *    cell (strict `<`);
  *  - the update sum accumulates f64 per dim in sample order, and the
  *    new centroid is `(sum / count).toFloat` (one f64 divide, one f32
  *    round) with empty cells carrying the previous centroid;
  *  - query scoring (`cosine_sim`) accumulates f64 over per-dim f32
  *    products in dim order; the MMR pool sim accumulates f64 over
  *    f64-widened products; both tie-break on (score DESC, vec_id).
  *
  * IEEE-754 f32/f64 add, sub, mul, divide and sqrt are bit-exact
  * deterministic in BOTH engines (DuckDB FLOAT arithmetic stays FLOAT;
  * its DOUBLE chain is the same left-associated fold the JVM while-loop
  * performs), so the WHOLE pipeline — sample, Lloyd iterations,
  * corpus assignment, probe selection, candidate join, ADC lookup
  * tables, shortlist cut, exact re-rank, greedy MMR — reproduces
  * bit-identically as plain SQL: the oracle text below has no RNG, no
  * aggregate whose evaluation order matters, and no float expression
  * whose rounding is not pinned by the text itself.
  *
  * Two DuckDB-side subtleties the text guards against:
  *  - every CTE is `AS MATERIALIZED`: iteration i+1 references
  *    iteration i twice (assignment + carry-over), so un-materialized
  *    CTE inlining re-evaluates the whole training prefix 2^iters
  *    times — correct but quadratic-to-exponential, and its allocation
  *    churn can trip the commit limit on an overcommit-strict host;
  *  - float literals are written `CAST(x AS DOUBLE)`: a bare `0.7`
  *    parses as DECIMAL(2,1), making `1.0 - 0.7` EXACTLY 0.3 where the
  *    JVM computes the f64 0.30000000000000004 — a 1-ulp mmr-score
  *    divergence the cast removes.
  *
  * The reference has no similarity search; this closes the r11 verdict
  * thread "drive no_oracle down with portable geometry" (ask #3's
  * sequel): with these six, EVERY registered query is hash-checked.
  */
object PortableIvf {

  /** d²(e, c) as the JVM computes it: per-dim f32 sub then f32 mul
    * (one rounding each), widened exactly to f64, summed left-assoc in
    * dim order. DuckDB FLOAT-FLOAT stays FLOAT, so the text IS the
    * JVM's arithmetic. 1-based list indexing (DuckDB-only text). */
  def d2Chain(e: String, c: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST(($e[$i]-$c[$i])*(($e[$i]-$c[$i])) AS DOUBLE)").mkString(" + ")

  /** `CosineSimilarity`'s dot/norm accumulation: per-dim f32 product
    * widened to f64, left-assoc f64 sum (NOT the pure-f32
    * [[graft.functions.VectorFunctions.chainDot]] chain — the two
    * round differently and both are replayed where used). */
  def simDot(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i]*$b[$i] AS DOUBLE)").mkString(" + ")

  /** The MMR pool-sim accumulation: f64 product of f64-WIDENED f32
    * operands (`vi(x).toDouble * vj(x)` — no f32 rounding on the
    * product), left-assoc f64 sum. */
  def wDot(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"(CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE))").mkString(" + ")

  import graft.functions.VectorFunctions.{chainDot, chainNorm}

  /** Lloyd's on the lowest-`sampleN` sample, replayed iteration by
    * iteration. Returns (CTE text, final-centroids CTE name): the
    * final CTE has rows (cell, cent LIST(FLOAT)) bit-identical to
    * [[Similarity.trainCentroids]]'s broadcast array. */
  def centroidsCte(dim: Int, nCells: Int, iters: Int,
      sampleN: Int, trainRel: String = "embeddings"): (String, String) = {
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""samp AS MATERIALIZED (
      SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS rn
      FROM $trainRel QUALIFY rn <= $sampleN)""",
      s"""c0 AS MATERIALIZED (SELECT rn - 1 AS cell, embedding AS cent
      FROM samp WHERE rn <= $nCells)""")
    for (it <- 1 to iters) {
      val p = s"c${it - 1}"
      // assignment: strict-< argmin == (d2, cell) row_number
      parts += s"""a$it AS MATERIALIZED (
      SELECT rn, embedding, cell FROM (
        SELECT s.rn, s.embedding, c.cell,
          row_number() OVER (PARTITION BY s.rn
            ORDER BY ${d2Chain("s.embedding", "c.cent", dim)}, c.cell) AS pr
        FROM samp s CROSS JOIN $p c) WHERE pr = 1)"""
      // update: f64 elementwise fold in sample (rn = vec_id) order
      parts += s"""u$it AS MATERIALIZED (
      SELECT cell,
        list_reduce(list(list_transform(embedding, x -> CAST(x AS DOUBLE))
            ORDER BY rn),
          (a, b) -> list_transform(range(1, ${dim + 1}), i -> a[i] + b[i])) AS sums,
        count(*) AS cnt
      FROM a$it GROUP BY cell)"""
      // mean: one f64 divide, one f32 round; empty cell keeps previous
      parts += s"""c$it AS MATERIALIZED (
      SELECT p.cell,
        CASE WHEN u.cell IS NULL THEN p.cent
             ELSE list_transform(u.sums, x -> CAST(x / u.cnt AS FLOAT)) END AS cent
      FROM $p p LEFT JOIN u$it u ON p.cell = u.cell)"""
    }
    (parts.mkString(",\n    "), s"c$iters")
  }

  /** Corpus cell assignment + query probe CTEs against centroid CTE
    * `cents` — shared by all IVF oracles. `predOn(alias)` renders the
    * query predicate against that alias. */
  private def assignAndProbe(dim: Int, nprobe: Int, cents: String,
      predOn: String => String,
      corpusRel: String = "embeddings"): String =
    s"""asg AS MATERIALIZED (SELECT vec_id, cell FROM (
      SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${d2Chain("e.embedding", "c.cent", dim)}, c.cell) AS pr
      FROM $corpusRel e CROSS JOIN $cents c) WHERE pr = 1),
    prb AS MATERIALIZED (SELECT qid, cell FROM (
      SELECT e.vec_id AS qid, c.cell, row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${d2Chain("e.embedding", "c.cent", dim)}, c.cell) AS pr
      FROM $corpusRel e CROSS JOIN $cents c
      WHERE ${predOn("e")}) WHERE pr <= $nprobe)"""

  /** The final exact-chain re-rank + rank/ordering tail shared by the
    * shortlist oracles (the s06/s17 `x`/`r` pattern verbatim). */
  private def exactReRankTail(dim: Int, k: Int,
      corpusRel: String = "embeddings"): String =
    s"""n AS MATERIALIZED (SELECT vec_id, embedding,
        ${chainNorm("embedding", dim, 1)} AS nrm FROM $corpusRel),
    x AS MATERIALIZED (SELECT c.qid, c.vec_id,
        CAST(${chainDot("qe.embedding", "e.embedding", dim, 1)} AS DOUBLE)
          / (qe.nrm * e.nrm) AS cos
      FROM cand c JOIN n qe ON qe.vec_id = c.qid
        JOIN n e ON e.vec_id = c.vec_id),
    r AS MATERIALIZED (SELECT qid, vec_id, cos, CAST(row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM x)
    SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $k
    ORDER BY qid NULLS FIRST, rank NULLS FIRST"""

  /** [[Similarity.ivfTopK]]'s oracle (s04; with `scope` s11): trained
    * cells, nprobe probes, the cell(+scope) candidate equi-join, and
    * `cosine_sim`-replay scoring with the TopKAgg tie-break. */
  def ivfOracleSql(dim: Int, k: Int, nCells: Int, nprobe: Int,
      predOn: String => String, scope: Option[String] = None,
      iters: Int = 3, sampleN: Int = 2048): String = {
    val (cc, fin) = centroidsCte(dim, nCells, iters, sampleN)
    val scol = scope.map(s => s", e.$s").getOrElse("")
    val ssel = scope.map(s => s", $s").getOrElse("")
    val sjoin = scope.map(s => s" AND a.$s = p.$s").getOrElse("")
    s"""WITH $cc,
    asg AS MATERIALIZED (SELECT vec_id, cell$ssel FROM (
      SELECT e.vec_id, c.cell$scol,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${d2Chain("e.embedding", "c.cent", dim)}, c.cell) AS pr
      FROM embeddings e CROSS JOIN $fin c) WHERE pr = 1),
    prb AS MATERIALIZED (SELECT qid, cell$ssel FROM (
      SELECT e.vec_id AS qid, c.cell$scol,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${d2Chain("e.embedding", "c.cent", dim)}, c.cell) AS pr
      FROM embeddings e CROSS JOIN $fin c
      WHERE ${predOn("e")}) WHERE pr <= $nprobe),
    cand AS MATERIALIZED (SELECT DISTINCT p.qid, a.vec_id
      FROM asg a JOIN prb p ON a.cell = p.cell$sjoin
      WHERE a.vec_id <> p.qid),
    sc AS MATERIALIZED (SELECT c.qid, c.vec_id,
        ${simDot("qe.embedding", "qe.embedding", dim)} AS nx,
        ${simDot("e.embedding", "e.embedding", dim)} AS ny,
        ${simDot("qe.embedding", "e.embedding", dim)} AS dt
      FROM cand c JOIN embeddings qe ON qe.vec_id = c.qid
        JOIN embeddings e ON e.vec_id = c.vec_id),
    x AS MATERIALIZED (SELECT qid, vec_id,
        CASE WHEN nx = 0 OR ny = 0 THEN 0.0
             ELSE dt / (sqrt(nx) * sqrt(ny)) END AS cos FROM sc),
    r AS MATERIALIZED (SELECT qid, vec_id, cos, CAST(row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM x)
    SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $k
    ORDER BY qid NULLS FIRST, rank NULLS FIRST"""
  }

  /** [[Similarity.ivfSq8TopK]]'s oracle (s07): trained cells + the s06
    * global-scale int8 codes; integer code-dot scores inside the
    * probed cells, shortlist cut, exact chain re-rank. */
  def ivfSq8OracleSql(dim: Int, k: Int, nCells: Int, nprobe: Int,
      shortlist: Int, predOn: String => String,
      iters: Int = 3, sampleN: Int = 2048): String = {
    val (cc, fin) = centroidsCte(dim, nCells, iters, sampleN)
    s"""WITH $cc,
    ${assignAndProbe(dim, nprobe, fin, predOn)},
    ma AS MATERIALIZED (SELECT max(list_max(list_transform(embedding,
        x -> abs(x)))) AS m FROM embeddings),
    z AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
        x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / CAST(m AS DOUBLE))
          AS INT)) AS qv
      FROM embeddings, ma),
    sc AS MATERIALIZED (SELECT p.qid, a.vec_id,
        CAST(${chainDot("zq.qv", "zc.qv", dim, 1)} AS DOUBLE) AS cos
      FROM asg a JOIN prb p ON a.cell = p.cell
        JOIN z zc ON zc.vec_id = a.vec_id
        JOIN z zq ON zq.vec_id = p.qid
      WHERE a.vec_id <> p.qid),
    sl AS MATERIALIZED (SELECT qid, vec_id, row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, vec_id) AS r FROM sc),
    cand AS MATERIALIZED (SELECT qid, vec_id FROM sl WHERE r <= $shortlist),
    ${exactReRankTail(dim, k)}"""
  }

  /** Per-subspace PQ codebooks (the `trainBooksOn` replay): subspace j
    * of the training frame `src` (the raw sample, or its coarse
    * residuals for `residual = true`), trained exactly like the
    * coarse quantizer but partitioned by (j, cell). Returns (CTE
    * text, final CTE name) with rows (j, cell, cent LIST(FLOAT) of
    * dim/m). */
  def booksCte(dim: Int, m: Int, ksub: Int, iters: Int,
      src: String = "samp"): (String, String) = {
    val dsub = dim / m
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""ssub AS MATERIALIZED (
      SELECT s.rn, t.j, list_transform(range(t.j*$dsub+1, t.j*$dsub+${dsub + 1}),
          i -> s.embedding[i]) AS sub
      FROM $src s CROSS JOIN (SELECT unnest(range($m)) AS j) t)""",
      s"""b0 AS MATERIALIZED (SELECT j, rn - 1 AS cell, sub AS cent
      FROM ssub WHERE rn <= $ksub)""")
    for (it <- 1 to iters) {
      val p = s"b${it - 1}"
      parts += s"""ba$it AS MATERIALIZED (
      SELECT j, rn, sub, cell FROM (
        SELECT s.j, s.rn, s.sub, c.cell,
          row_number() OVER (PARTITION BY s.j, s.rn
            ORDER BY ${d2Chain("s.sub", "c.cent", dsub)}, c.cell) AS pr
        FROM ssub s JOIN $p c USING (j)) WHERE pr = 1)"""
      parts += s"""bu$it AS MATERIALIZED (
      SELECT j, cell,
        list_reduce(list(list_transform(sub, x -> CAST(x AS DOUBLE)) ORDER BY rn),
          (a, b) -> list_transform(range(1, ${dsub + 1}), i -> a[i] + b[i])) AS sums,
        count(*) AS cnt
      FROM ba$it GROUP BY j, cell)"""
      parts += s"""b$it AS MATERIALIZED (
      SELECT p.j, p.cell,
        CASE WHEN u.cell IS NULL THEN p.cent
             ELSE list_transform(u.sums, x -> CAST(x / u.cnt AS FLOAT)) END AS cent
      FROM $p p LEFT JOIN bu$it u ON p.j = u.j AND p.cell = u.cell)"""
    }
    (parts.mkString(",\n    "), s"b$iters")
  }

  /** [[Similarity.ivfPqTopK]]'s oracle (s08/s09 at `residual = false`;
    * s29 at `residual = true`): coarse cells, per-subspace codebooks,
    * corpus codes, per-query ADC lookup tables (f32-product/f64-sum
    * subspace dots), the j-ordered f64 ADC fold, shortlist cut, exact
    * re-rank. Residual mode trains the codebooks on (sample − its
    * cell's centroid), encodes each corpus vector's residual against
    * ITS OWN cell (per-dim f32 subs, like `residualOf`), and folds the
    * per-(query, probed-cell) `dot(q, centroid)` term back into the
    * ADC score — exactly `qcellDot`'s f64 accumulation. */
  /** `trainRel`/`corpusRel` split the replay's two relation roles for
    * maintained-index lifecycles (p11): the MODEL trains on the
    * relation the index was BUILT over, while assignment, candidate
    * codes, queries and the exact re-rank run over the SURVIVING
    * corpus (base ∪ appended − deleted) — the frozen-model semantics
    * of the persisted index. Defaults keep every existing oracle text
    * byte-identical. */
  /** `candSql`: serve-time candidacy predicate over the candidate id
    * (`a.vec_id`), ANDed into the ADC scoring rows BEFORE the
    * shortlist cut — the replay of [[graft.operators.AnnIndex]]'s
    * filtered probe (s40): the shortlist must be spent on admissible
    * candidates, never truncated post-hoc. None keeps the text
    * byte-identical to every earlier oracle. */
  def ivfPqOracleSql(dim: Int, k: Int, nCells: Int, nprobe: Int,
      m: Int, ksub: Int, shortlist: Int, predOn: String => String,
      residual: Boolean = false,
      iters: Int = 3, sampleN: Int = 2048,
      trainRel: String = "embeddings",
      corpusRel: String = "embeddings",
      candSql: Option[String] = None): String = {
    val dsub = dim / m
    val (cc, cfin) = centroidsCte(dim, nCells, iters, sampleN, trainRel)
    val (bc, bfin) = booksCte(dim, m, ksub, iters,
      src = if (residual) "rsamp" else "samp")
    def residualList(v: String, c: String) =
      s"list_transform(range(1, ${dim + 1}), i -> $v[i] - $c[i])"
    // residual mode: the sample's residuals (vs the FINAL coarse
    // centroids) feed codebook training; each corpus vector encodes
    // its residual against its own cell
    val rsampCte = if (!residual) "" else s""",
    sasg AS MATERIALIZED (SELECT rn, cell FROM (
      SELECT s.rn, c.cell, row_number() OVER (PARTITION BY s.rn
          ORDER BY ${d2Chain("s.embedding", "c.cent", dim)}, c.cell) AS pr
      FROM samp s CROSS JOIN $cfin c) WHERE pr = 1),
    rsamp AS MATERIALIZED (SELECT s.rn,
        ${residualList("s.embedding", "c.cent")} AS embedding
      FROM samp s JOIN sasg a ON a.rn = s.rn JOIN $cfin c ON c.cell = a.cell)"""
    val codeSrc = if (!residual) s"$corpusRel e" else
      s"""(SELECT e.vec_id, ${residualList("e.embedding", "c.cent")} AS embedding
        FROM $corpusRel e JOIN asg a2 ON a2.vec_id = e.vec_id
          JOIN $cfin c ON c.cell = a2.cell) e"""
    // the ADC score's base: 0.0 for raw, dot(q, probed centroid) for
    // residual (one term per (query, probed cell), qcellDot's text)
    val qcCte = if (!residual) "" else s""",
    qcv AS MATERIALIZED (SELECT p.qid, p.cell,
        ${simDot("e.embedding", "c.cent", dim)} AS qc
      FROM prb p JOIN $corpusRel e ON e.vec_id = p.qid
        JOIN $cfin c ON c.cell = p.cell)"""
    val (qcJoin, qcExpr) =
      if (!residual) ("", "list_reduce(list(t.val ORDER BY t.j), (a, b) -> a + b)")
      else (" JOIN qcv q ON q.qid = p.qid AND q.cell = p.cell",
        "any_value(t.qc) + list_reduce(list(t.val ORDER BY t.j), (a, b) -> a + b)")
    val qcSel = if (!residual) "" else ", q.qc"
    s"""WITH $cc$rsampCte,
    $bc,
    ${assignAndProbe(dim, nprobe, cfin, predOn, corpusRel)}$qcCte,
    esub AS MATERIALIZED (
      SELECT e.vec_id, t.j, list_transform(range(t.j*$dsub+1, t.j*$dsub+${dsub + 1}),
          i -> e.embedding[i]) AS sub
      FROM $codeSrc CROSS JOIN (SELECT unnest(range($m)) AS j) t),
    ecode AS MATERIALIZED (SELECT vec_id, j, cell AS code FROM (
      SELECT s.vec_id, s.j, c.cell,
        row_number() OVER (PARTITION BY s.vec_id, s.j
          ORDER BY ${d2Chain("s.sub", "c.cent", dsub)}, c.cell) AS pr
      FROM esub s JOIN $bfin c USING (j)) WHERE pr = 1),
    qsub AS MATERIALIZED (
      SELECT e.vec_id, t.j, list_transform(range(t.j*$dsub+1, t.j*$dsub+${dsub + 1}),
          i -> e.embedding[i]) AS sub
      FROM $corpusRel e CROSS JOIN (SELECT unnest(range($m)) AS j) t
      WHERE ${predOn("e")}),
    qlut AS MATERIALIZED (SELECT s.vec_id AS qid, s.j, c.cell AS code,
        ${simDot("s.sub", "c.cent", dsub)} AS val
      FROM qsub s JOIN $bfin c USING (j)),
    sc AS MATERIALIZED (SELECT t.qid, t.vec_id,
        $qcExpr AS cos
      FROM (SELECT p.qid, a.vec_id, l.j, l.val$qcSel
        FROM asg a JOIN prb p ON a.cell = p.cell$qcJoin
          JOIN ecode ec ON ec.vec_id = a.vec_id
          JOIN qlut l ON l.qid = p.qid AND l.j = ec.j AND l.code = ec.code
        WHERE a.vec_id <> p.qid${candSql.fold("")(p => s" AND ($p)")}) t
      GROUP BY t.qid, t.vec_id),
    sl AS MATERIALIZED (SELECT qid, vec_id, row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, vec_id) AS r FROM sc),
    cand AS MATERIALIZED (SELECT qid, vec_id FROM sl WHERE r <= $shortlist),
    ${exactReRankTail(dim, k, corpusRel)}"""
  }

  /** [[Similarity.mmrTopK]]'s oracle (s12): the `cosine_sim`-replay
    * brute-force pool, f64-widened pairwise pool sims, and the greedy
    * selection UNROLLED one CTE pair per step — `max` over the
    * selected set is order-independent, the score arithmetic is the
    * JVM's f64 text (lambda literals CAST to DOUBLE — see the class
    * doc), and the strict-improvement argmax over the rel-sorted pool
    * is a (score DESC, rel DESC, vec_id) row_number. */
  def mmrOracleSql(dim: Int, k: Int, pool: Int,
      predOn: String => String): String =
    s"""WITH sc0 AS MATERIALIZED (
      SELECT q.vec_id AS qid, e.vec_id,
        ${simDot("q.embedding", "e.embedding", dim)} AS dt,
        ${simDot("q.embedding", "q.embedding", dim)} AS nx,
        ${simDot("e.embedding", "e.embedding", dim)} AS ny
      FROM embeddings e, embeddings q
      WHERE ${predOn("q")} AND e.vec_id <> q.vec_id),
    pool AS MATERIALIZED (SELECT qid, vec_id, rel FROM (
      SELECT qid, vec_id,
        CASE WHEN nx = 0 OR ny = 0 THEN 0.0
             ELSE dt / (sqrt(nx) * sqrt(ny)) END AS rel,
        row_number() OVER (PARTITION BY qid ORDER BY
          CASE WHEN nx = 0 OR ny = 0 THEN 0.0
               ELSE dt / (sqrt(nx) * sqrt(ny)) END DESC, vec_id) AS r
      FROM sc0) WHERE r <= $pool),
    ${mmrChainSql(dim, k, "CAST(0.7 AS DOUBLE)")}"""

  /** The greedy-MMR CTE chain over a caller-provided `pool` CTE
    * exposing (qid, vec_id, rel) — [[mmrOracleSql]]'s tail, exposed so
    * relevance can come from ANY ranked list (s62 feeds the fused RRF
    * score — diversity over the hybrid serve, not just raw cosine).
    * Pairwise pool similarities still come from `embeddings`. The
    * caller's WITH must define `pool` before splicing this in. */
  def mmrChainSql(dim: Int, k: Int, lam: String): String = {
    val steps = (2 to k).flatMap { t =>
      Seq(
        s"""ms$t AS MATERIALIZED (
      SELECT ps.qid, ps.a AS vec_id, max(ps.sim) AS maxsim
      FROM psim ps JOIN g${t - 1} g ON g.qid = ps.qid
      WHERE list_contains(g.sel, ps.b) AND NOT list_contains(g.sel, ps.a)
      GROUP BY ps.qid, ps.a)""",
        s"""st$t AS MATERIALIZED (
      SELECT qid, vec_id, rel, score FROM (
        SELECT p.qid, p.vec_id, p.rel,
          $lam * p.rel - (CAST(1.0 AS DOUBLE) - $lam) * m.maxsim AS score,
          row_number() OVER (PARTITION BY p.qid
            ORDER BY $lam * p.rel - (CAST(1.0 AS DOUBLE) - $lam) * m.maxsim DESC,
              p.rel DESC, p.vec_id) AS pr
        FROM pool p JOIN ms$t m ON m.qid = p.qid AND m.vec_id = p.vec_id)
      WHERE pr = 1)""",
        s"""g$t AS MATERIALIZED (
      SELECT g.qid, list_append(g.sel, s.vec_id) AS sel
      FROM g${t - 1} g JOIN st$t s ON s.qid = g.qid)""")
    }
    val outUnion = (1 to k).map(t =>
      s"SELECT qid, vec_id, $t AS rank, rel AS cos, score AS mmr FROM st$t")
      .mkString("\n      UNION ALL ")
    s"""pv AS MATERIALIZED (SELECT p.qid, p.vec_id, p.rel, e.embedding,
        sqrt(${wDot("e.embedding", "e.embedding", dim)}) AS nrm
      FROM pool p JOIN embeddings e ON e.vec_id = p.vec_id),
    psim AS MATERIALIZED (SELECT a.qid, a.vec_id AS a, b.vec_id AS b,
        CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
             ELSE (${wDot("a.embedding", "b.embedding", dim)}) / (a.nrm * b.nrm)
        END AS sim
      FROM pv a JOIN pv b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
    st1 AS MATERIALIZED (SELECT qid, vec_id, rel,
        $lam * rel - (CAST(1.0 AS DOUBLE) - $lam) * 0.0 AS score FROM (
      SELECT qid, vec_id, rel, row_number() OVER (PARTITION BY qid
          ORDER BY $lam * rel - (CAST(1.0 AS DOUBLE) - $lam) * 0.0 DESC,
            rel DESC, vec_id) AS pr
      FROM pool) WHERE pr = 1),
    g1 AS MATERIALIZED (SELECT qid, [vec_id] AS sel FROM st1),
    ${steps.mkString(",\n    ")}
    SELECT qid, vec_id, CAST(rank AS INT) AS rank, cos, mmr FROM (
      $outUnion)
    ORDER BY qid NULLS FIRST, rank NULLS FIRST"""
  }
}
