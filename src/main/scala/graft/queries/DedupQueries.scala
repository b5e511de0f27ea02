package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Generations, KnnGraphIndex}

/** Dedup operator queries over `documents`, all DuckDB-exact. d03's
  * oracle is the *exact* all-pairs Jaccard — the LSH+verify path must
  * reproduce it (r=2/b=64 ⇒ miss probability ≈1e-8 per pair at the
  * J=0.5 threshold); d04's replays the whole SimHash pipeline on the
  * portable md5-derived token hash. */
object DedupQueries {

  /** d20's synthetic long-passage fixture: six docs sharing an
    * identical 32-token (4-tile) passage behind unique 8-token
    * (1-tile) prefixes — tile-ALIGNED so the tiling detects it — to
    * exercise the maximal-span merge cross-engine. Inlined as literals
    * in both the Spark frame and the DuckDB VALUES list so the two
    * sides cannot drift. */
  private val SynthPassageDocs: Seq[(Long, String)] = {
    val passage = (0 until 32).map(t => s"psg$t").mkString(" ")
    (0 until 6).map(i => (2000000000L + i,
      (0 until 8).map(j => s"pre${i}x$j").mkString(" ") + " " + passage))
  }

  /** documents ∪ (documents with shifted ids) — yields real duplicate
    * groups so survivor selection is exercised. */
  private def doubled(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  /** The d11/d12 ingest-batch fixture: 250 lightly-edited replays of
    * the corpus (near-dups, must drop) + 50 genuinely new docs (must
    * survive), ids at +1e9 (disjoint from the corpus at any SF). */
  private def ingestBatch(docs: org.apache.spark.sql.DataFrame) = {
    val near = docs.filter(col("doc_id") < 250)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz edit marker token pad")).as("text"))
    val fresh = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(lit("brand new document number "), col("doc_id").cast("string"),
          lit(" with totally unseen vocabulary alpha beta gamma delta" +
            " epsilon zeta eta theta")).as("text"))
    near.unionByName(fresh)
  }

  /** The d13 second-night batch (ids at +2e9): 50 EXACT copies of
    * batch A's fresh docs (near-dups of nothing in the original
    * corpus — they drop iff the survivors of ingest A were really
    * appended to the index) + 100 lightly-edited replays of corpus
    * docs 300–399 (probe the ORIGINAL index entries, proving they
    * survived the append) + 50 genuinely novel docs (night-2 fresh
    * content — must SURVIVE, so the output is non-empty and a probe
    * that over-drops flips rows too). */
  private def ingestBatchB(docs: org.apache.spark.sql.DataFrame) = {
    val copies = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(lit("brand new document number "), col("doc_id").cast("string"),
          lit(" with totally unseen vocabulary alpha beta gamma delta" +
            " epsilon zeta eta theta")).as("text"))
    val replays = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(col("text"), lit(" zz edit marker token pad")).as("text"))
    val fresh = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(lit("second night novel document "), col("doc_id").cast("string"),
          lit(" with different unseen vocabulary nu xi omicron pi rho" +
            " sigma tau upsilon phi chi")).as("text"))
    copies.unionByName(replays).unionByName(fresh)
  }

  /** d13 oracle: replay BOTH ingests exactly. Pairs come from the
    * exact all-pairs Jaccard over hist ∪ A ∪ B; A's survivors are the
    * A docs with no cross-pair to hist; B's survivors (the output) are
    * the B docs with no cross-pair to hist OR to a surviving-A doc —
    * i.e. to the maintained index contents after the append. Non-
    * surviving A docs were never appended, so they cannot disqualify
    * a B doc. */
  private val sqlTwoIngestSurvivors =
    s"""WITH d3 AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000, text || ' zz edit marker token pad'
          FROM documents WHERE doc_id < 250
        UNION ALL SELECT doc_id + 1000000000, 'brand new document number ' ||
            CAST(doc_id AS VARCHAR) || ' with totally unseen vocabulary' ||
            ' alpha beta gamma delta epsilon zeta eta theta'
          FROM documents WHERE doc_id >= 250 AND doc_id < 300
        UNION ALL SELECT doc_id + 2000000000, 'brand new document number ' ||
            CAST(doc_id AS VARCHAR) || ' with totally unseen vocabulary' ||
            ' alpha beta gamma delta epsilon zeta eta theta'
          FROM documents WHERE doc_id >= 250 AND doc_id < 300
        UNION ALL SELECT doc_id + 2000000000, text || ' zz edit marker token pad'
          FROM documents WHERE doc_id >= 300 AND doc_id < 400
        UNION ALL SELECT doc_id + 2000000000, 'second night novel document ' ||
            CAST(doc_id AS VARCHAR) || ' with different unseen vocabulary' ||
            ' nu xi omicron pi rho sigma tau upsilon phi chi'
          FROM documents WHERE doc_id >= 400 AND doc_id < 450),
      ${Dedup.sqlJaccardCtes("d3")},
      dupA AS (SELECT DISTINCT id_b AS doc_id FROM jp
        WHERE id_a < 1000000000
          AND id_b >= 1000000000 AND id_b < 2000000000),
      survA AS (SELECT doc_id FROM d3
        WHERE doc_id >= 1000000000 AND doc_id < 2000000000
          AND doc_id NOT IN (SELECT doc_id FROM dupA)),
      dupB AS (SELECT DISTINCT id_b AS doc_id FROM jp
        WHERE id_b >= 2000000000
          AND (id_a < 1000000000 OR
               id_a IN (SELECT doc_id FROM survA)))
      SELECT doc_id FROM d3
      WHERE doc_id >= 2000000000
        AND doc_id NOT IN (SELECT doc_id FROM dupB)
      ORDER BY doc_id NULLS FIRST"""

  /** Shared oracle for d11/d12: exact all-pairs Jaccard on the
    * hist ∪ batch union, survivors = batch docs with no cross-group
    * pair. */
  private val sqlIngestSurvivors =
    s"""WITH d2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000, text || ' zz edit marker token pad'
          FROM documents WHERE doc_id < 250
        UNION ALL SELECT doc_id + 1000000000, 'brand new document number ' ||
            CAST(doc_id AS VARCHAR) || ' with totally unseen vocabulary' ||
            ' alpha beta gamma delta epsilon zeta eta theta'
          FROM documents WHERE doc_id >= 250 AND doc_id < 300),
      ${Dedup.sqlJaccardCtes("d2")},
      dup AS (SELECT DISTINCT id_b AS doc_id FROM jp
        WHERE id_a < 1000000000 AND id_b >= 1000000000)
      SELECT doc_id FROM d2
      WHERE doc_id >= 1000000000 AND doc_id NOT IN (SELECT doc_id FROM dup)
      ORDER BY doc_id NULLS FIRST"""
  /** d25 oracle: the AS-OF probe replays ingest B against the ORIGINAL
    * corpus only — batch A's appended survivors are invisible to the
    * pinned pre-append generation, so A's copies SURVIVE here where
    * d13's current-index probe drops them (same batch, different
    * snapshot — the discriminating rows of the time-travel read). */
  private val sqlAsOfSurvivors =
    s"""WITH db AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 2000000000, 'brand new document number ' ||
            CAST(doc_id AS VARCHAR) || ' with totally unseen vocabulary' ||
            ' alpha beta gamma delta epsilon zeta eta theta'
          FROM documents WHERE doc_id >= 250 AND doc_id < 300
        UNION ALL SELECT doc_id + 2000000000, text || ' zz edit marker token pad'
          FROM documents WHERE doc_id >= 300 AND doc_id < 400
        UNION ALL SELECT doc_id + 2000000000, 'second night novel document ' ||
            CAST(doc_id AS VARCHAR) || ' with different unseen vocabulary' ||
            ' nu xi omicron pi rho sigma tau upsilon phi chi'
          FROM documents WHERE doc_id >= 400 AND doc_id < 450),
      ${Dedup.sqlJaccardCtes("db")},
      dup AS (SELECT DISTINCT id_b AS doc_id FROM jp
        WHERE id_a < 1000000000 AND id_b >= 2000000000)
      SELECT doc_id FROM db
      WHERE doc_id >= 2000000000 AND doc_id NOT IN (SELECT doc_id FROM dup)
      ORDER BY doc_id NULLS FIRST"""

  private val sqlDoubled =
    """d2 AS (SELECT doc_id, text FROM documents
       UNION ALL SELECT doc_id + 10000, text FROM documents)"""

  val all: Seq[Q] = Seq(

    Q("d01_exact_dedup",
      (s, dir) => Dedup.exactDedup(doubled(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $sqlDoubled,
        f AS (SELECT doc_id, ${TextFunctions.sqlFingerprint("text")} AS fp FROM d2),
        g AS (SELECT doc_id, fp,
            row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn,
            count(*) OVER (PARTITION BY fp) AS group_size FROM f)
        SELECT doc_id, fp, group_size FROM g WHERE rn = 1
        ORDER BY doc_id NULLS FIRST""")),

    Q("d02_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables(s, dir, "documents"))
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlNgramJaccard("documents") +
        " ORDER BY id_a NULLS FIRST, id_b NULLS FIRST")),

    // Exact set-similarity join via prefix filtering (SSJoin): the
    // scalable EXACT path — provably-complete candidate pruning, so
    // the result is identical to d02's uncapped all-pairs Jaccard and
    // hash-checks against the SAME oracle (the s17 pattern: one
    // algorithm pinned by another's ground truth).
    Q("d22_prefix_jaccard",
      (s, dir) =>
        Dedup.prefixJaccardPairs(Tables(s, dir, "documents"))
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlNgramJaccard("documents") +
        " ORDER BY id_a NULLS FIRST, id_b NULLS FIRST")),

    // Bench-facing skew-guarded variant of d02: shingles with document
    // frequency > 8 are pruned from the universe before the self-join
    // (bounds the per-key fan-out at 8² instead of corpus²; see
    // Dedup.ngramJaccardPairs scaladoc + SCALE.md §d08). The oracle
    // mirrors the cap, so the row is hash-exact, and at sf0.01 the cap
    // is inert (max df = 3) — output identical to d02 — while the
    // pruning plan is what would run at 100 TB.
    Q("d08_jaccard_capped",
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), dfCap = 8)
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlNgramJaccard("documents", dfCap = 8) +
        " ORDER BY id_a NULLS FIRST, id_b NULLS FIRST")),

    // Asymmetric near-dup: containment |∩|/min(|A|,|B|) catches a
    // short doc quoted verbatim inside a long one (containment ≈ 1,
    // Jaccard ≈ |A|/|B| ≈ 0) — the pair class every Jaccard pass is
    // blind to. Same df-capped shingle join as d08 (banding can't
    // source these candidates: collision probability tracks Jaccard,
    // and the interesting pairs are exactly the low-Jaccard ones).
    // Exact integer inter/min → the double division hash-checks.
    Q("d15_containment",
      (s, dir) =>
        Dedup.containmentPairs(Tables(s, dir, "documents"), minC = 0.6,
            dfCap = 8)
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlContainment("documents", minC = 0.6, dfCap = 8) +
        " ORDER BY id_a NULLS FIRST, id_b NULLS FIRST")),

    Q("d03_minhash_lsh",
      (s, dir) =>
        Dedup.minhashLshPairs(Tables(s, dir, "documents"))
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlNgramJaccard("documents") +
        " ORDER BY id_a NULLS FIRST, id_b NULLS FIRST")),

    // SimHash is fully oracle-checked since the token hash moved to the
    // portable md5-derived 64-bit value: DuckDB replays hash → per-bit
    // vote → block-collision candidates → bit_count verify exactly.
    Q("d04_simhash_pairs",
      (s, dir) =>
        Dedup.simhashPairs(Tables(s, dir, "documents"))
          .orderBy("id_a", "id_b"),
      Some(Dedup.sqlSimhashPairs("documents"))),

    // component = min doc_id of each near-dup cluster (the survivor);
    // Spark runs distributed min-label propagation over the LSH pairs,
    // the oracle replays it as a DuckDB recursive CTE over the exact
    // pairs (identical edges: LSH+verify == exact at this threshold)
    Q("d05_dedup_components",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.duplicateClusters(docs, Dedup.minhashLshPairs(docs))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${Dedup.sqlJaccardCtes("documents")},
        edges AS (SELECT id_a AS src, id_b AS dst FROM jp
          UNION ALL SELECT id_b, id_a FROM jp),
        reach AS (
          SELECT doc_id AS id, doc_id AS label FROM documents
          UNION
          SELECT e.dst AS id, r.label AS label
          FROM reach r JOIN edges e ON r.id = e.src)
        SELECT id AS doc_id, min(label) AS component FROM reach
        GROUP BY id ORDER BY doc_id NULLS FIRST""")),

    // SemDedup-shaped corpus filter over embeddings: drop every vector
    // that has a LOWER-id near-neighbor (cosine >= 0.35) — lower id
    // survives, one anti-join selects the kept corpus. Pair generation
    // here is the all-pairs correctness baseline (same two-stage gate
    // as s02); at 100 TB the pairs come from the LSH buckets (s03
    // machinery) instead, the anti-join is unchanged.
    Q("d06_embedding_dedup",
      (s, dir) => {
        import graft.functions.VectorFunctions._
        graft.functions.VectorFunctions.register(s)
        val Dim = 64
        val emb = Tables(s, dir, "embeddings")
          .withColumn("nrm", expr(chainNorm("embedding", Dim, 0)))
        val par = s.sparkContext.defaultParallelism * 2
        val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
          col("nrm").as("na")).repartition(par)
        val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
          col("nrm").as("nb"))
        val exactCos =
          expr(s"CAST(${chainDot("ea", "eb", Dim, 0)} AS DOUBLE)") / (col("na") * col("nb"))
        // stage 1: codegen'd cosine_sim gates the pair loop; stage 2:
        // the oracle-exact f32 chain on survivors only (localCheckpoint
        // keeps Catalyst from inlining the 192-term chain into the join)
        val dupIds = a.join(b, col("id_a") < col("id_b") &&
            expr("cosine_sim(ea, eb)") >= 0.349)
          .localCheckpoint()
          .withColumn("cos", exactCos)
          .filter(col("cos") >= 0.35)
          .select(col("id_b").as("dup_id")).distinct()
        Tables(s, dir, "embeddings")
          .join(dupIds, col("vec_id") === col("dup_id"), "left_anti")
          .select("vec_id")
          .orderBy("vec_id")
      },
      Some({
        import graft.functions.VectorFunctions._
        val Dim = 64
        s"""WITH n AS (SELECT vec_id, embedding,
            ${chainNorm("embedding", Dim, 1)} AS nrm FROM embeddings),
          c AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              CAST(${chainDot("a.embedding", "b.embedding", Dim, 1)} AS DOUBLE)
                / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON a.vec_id < b.vec_id),
          dup AS (SELECT DISTINCT id_b FROM c WHERE cos >= 0.35)
          SELECT vec_id FROM embeddings
          WHERE vec_id NOT IN (SELECT id_b FROM dup)
          ORDER BY vec_id NULLS FIRST"""
      })),

    // Cross-document span duplication (the "dedup at the substring
    // level" signal from exact-substring training-data dedup): per doc,
    // the fraction of its distinct 8-gram spans that appear in at least
    // one OTHER document. One shuffle on the span key with map-side
    // combine, one join back — never all-pairs. Half the corpus is
    // planted as duplicates so both contaminated (frac 1.0) and clean
    // docs exist.
    Q("d07_span_duplication",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") < 250)
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
        val sh = Dedup.shingles(planted, k = 8)
        val perSpan = sh.groupBy("sh").agg(count(lit(1)).as("nd"))
        sh.join(perSpan, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_spans"), col("n_shared"),
            (col("n_shared").cast("double") / col("n_spans").cast("double"))
              .as("shared_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000000, text FROM documents WHERE doc_id < 250),
        ${Dedup.sqlShinglesCte("d2", 8)},
        ps AS (SELECT sh, count(*) AS nd FROM sh GROUP BY sh),
        p AS (SELECT doc_id, count(*) AS n_spans,
            CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
          FROM sh JOIN ps USING (sh) GROUP BY doc_id)
        SELECT doc_id, n_spans, n_shared,
          CAST(n_shared AS DOUBLE) / CAST(n_spans AS DOUBLE) AS shared_frac
        FROM p ORDER BY doc_id NULLS FIRST""")),

    // ---- d10: benchmark decontamination ------------------------------
    // Eval-overlap check (GPT-3 §C / PaLM appendix shape): every 17th
    // doc plays the benchmark set; each training doc reports how many
    // of its distinct 8-gram spans appear in any eval doc. Eval docs
    // are fully contaminated by construction (they contain themselves),
    // so both branches of the flag are exercised. The eval n-gram
    // universe is broadcast — the corpus side never shuffles except
    // for the final per-doc count.
    Q("d10_decontamination",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.decontaminate(docs, docs.filter(col("doc_id") % 17 === 0))
          .orderBy("doc_id")
      },
      Some(Dedup.sqlDecontaminate("documents", "doc_id % 17 = 0"))),

    // ---- d17: quality-preferring cluster survivors -------------------
    // The survivor POLICY a trainer actually wants: per duplicate
    // cluster (d05's components over the d03 pairs), keep the highest
    // quality-score copy — not the lowest id, which is an arbitrary
    // convention. One max_by aggregate over the clustered frame; ties
    // break to the lowest id so the row set stays deterministic.
    Q("d17_cluster_survivors",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.clusterSurvivors(docs, Dedup.minhashLshPairs(docs),
            TextFunctions.quality(col("text"), col("n_chars")))
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE ${Dedup.sqlJaccardCtes("documents")},
        edges AS (SELECT id_a AS src, id_b AS dst FROM jp
          UNION ALL SELECT id_b, id_a FROM jp),
        reach AS (
          SELECT doc_id AS id, doc_id AS label FROM documents
          UNION
          SELECT e.dst AS id, r.label AS label
          FROM reach r JOIN edges e ON r.id = e.src),
        comp AS (SELECT id AS doc_id, min(label) AS component
          FROM reach GROUP BY id),
        scored AS (SELECT d.doc_id, c.component,
            ${TextFunctions.sqlQuality("text", "n_chars")} AS q,
            count(*) OVER (PARTITION BY c.component) AS gs
          FROM documents d JOIN comp c ON d.doc_id = c.doc_id),
        rn AS (SELECT *, row_number() OVER (PARTITION BY component
            ORDER BY q DESC, doc_id) AS r FROM scored)
        SELECT component, doc_id, q AS quality,
          CAST(gs AS BIGINT) AS group_size
        FROM rn WHERE r = 1 ORDER BY component NULLS FIRST""")),

    // ---- d16: span-level decontamination -----------------------------
    // The surgical variant of d10: at a 1% contamination rate the d10
    // gate throws away 99%-clean documents; d16 removes exactly the
    // tokens covered by a contaminated 8-gram and keeps the rest.
    // Every doc comes back — eval docs collapse to "" (they contain
    // themselves), clean docs pass through verbatim, partially-hit
    // docs lose only the covered spans — so all three redaction
    // regimes hash-check in one row set.
    Q("d16_span_redaction",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.redactContaminatedSpans(docs,
            docs.filter(col("doc_id") % 17 === 0))
          .orderBy("doc_id")
      },
      Some(Dedup.sqlRedactContaminatedSpans("documents", "doc_id % 17 = 0") +
        " ORDER BY doc_id NULLS FIRST")),

    // ---- d11: incremental NEAR-dup dedup (batch vs historical index) --
    // The near-dup companion of d09: a new batch probes the corpus's
    // LSH band-bucket index; batch docs with a historical near-dup
    // (exact-verified J >= 0.5) are dropped. Fixture: 250 lightly
    // edited replays (long ones drop — a 5-token pad on a 60-token doc
    // keeps J ≈ 0.9; SHORT ones legitimately survive, J < 0.5 at ~10
    // tokens) + 50 genuinely new docs (unseen vocabulary, survive).
    // The oracle replays it as exact all-pairs Jaccard on the
    // hist ∪ batch union restricted to cross-group pairs — within-
    // batch dups deliberately don't disqualify (see operator doc).
    // Batch ids live at +1e9 so the two id spaces stay disjoint at any
    // supported SF (doc_id is int64; a hard-coded small offset would
    // collide once the corpus outgrows it and silently corrupt the
    // oracle's id-range group classification). Fixture pairs must also
    // stay far from the J=0.5 threshold (here J≈0.9): the hash-exact
    // gate relies on LSH recovering every oracle pair, and r=2/b=64
    // miss odds are ~1e-8 only when J is well above minJ.
    Q("d11_incremental_neardup",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.incrementalNearDupSurvivors(docs, ingestBatch(docs))
          .orderBy("doc_id")
      },
      Some(sqlIngestSurvivors)),

    // ---- d12: same ingest, probing the PERSISTED bucketed index -----
    // The deployed shape of d11: the history's band buckets and
    // signatures are written ONCE as tables bucketed on their join
    // keys (writeNearDupIndex); the nightly batch probes them in
    // place — the corpus-sized side never re-shuffles (LayoutSpec
    // pins the exchange-free scan). Output is identical to d11, so it
    // shares the oracle: same fixture, same survivors, hash-exact.
    Q("d12_neardup_index_probe",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.writeNearDupIndex(
          docs.select(col("doc_id"), col("text")), "graft_d12_idx")
        Dedup.incrementalNearDupSurvivorsIndexed(s, "graft_d12_idx",
            ingestBatch(docs))
          .orderBy("doc_id")
      },
      Some(sqlIngestSurvivors)),

    // ---- d13: index MAINTENANCE — two nights of ingest ---------------
    // The full production loop d12 only demos: night 1 probes the
    // corpus index and APPENDS its survivors (appendToNearDupIndex,
    // bucket layout preserved); night 2's batch then probes an index
    // containing corpus + night-1 survivors. Batch B's exact copies of
    // A's fresh docs drop ONLY if the append really landed (they match
    // nothing in the original corpus), and B's corpus replays drop
    // ONLY if the original entries survived the append — both failure
    // modes of a broken maintenance path flip rows in this output.
    // Oracle = the two-ingest replay over exact all-pairs Jaccard.
    Q("d13_index_maintenance",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.writeNearDupIndex(
          docs.select(col("doc_id"), col("text")), "graft_d13_idx")
        val batchA = ingestBatch(docs)
        val survA = Dedup.incrementalNearDupSurvivorsIndexed(
          s, "graft_d13_idx", batchA)
        Dedup.appendToNearDupIndex(batchA.join(survA, "doc_id"), "graft_d13_idx")
        Dedup.incrementalNearDupSurvivorsIndexed(s, "graft_d13_idx",
            ingestBatchB(docs))
          .orderBy("doc_id")
      },
      Some(sqlTwoIngestSurvivors)),

    // ---- d14: index COMPACTION between ingests -----------------------
    // The d13 loop with the third lifecycle step: after night 1's
    // append, the index is compacted (both bucketed tables rewritten
    // in place, collapsing the per-append file accumulation) before
    // night 2 probes it. Compaction must be behavior-INVISIBLE — same
    // two-ingest oracle as d13, hash-exact — while the physical layout
    // (one file per bucket, exchange-free probe) is pinned by
    // LayoutSpec. A compaction that dropped/duplicated signatures or
    // broke the bucket alignment flips rows here. Since r12 the
    // compaction also RESIZES the bucket count (8 → 16, the grown-
    // corpus path): night 2's probe runs against the rebucketed
    // layout, so the resize's behavior-invisibility is driver-gated,
    // not just spec-asserted.
    Q("d14_index_compaction",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.writeNearDupIndex(
          docs.select(col("doc_id"), col("text")), "graft_d14_idx")
        val batchA = ingestBatch(docs)
        val survA = Dedup.incrementalNearDupSurvivorsIndexed(
          s, "graft_d14_idx", batchA)
        Dedup.appendToNearDupIndex(batchA.join(survA, "doc_id"), "graft_d14_idx")
        Dedup.compactNearDupIndex(s, "graft_d14_idx", numBuckets = Some(16))
        Dedup.incrementalNearDupSurvivorsIndexed(s, "graft_d14_idx",
            ingestBatchB(docs))
          .orderBy("doc_id")
      },
      Some(sqlTwoIngestSurvivors)),

    // ---- d25: AS-OF probe — time travel on the maintained index ------
    // The reproducibility read: the compaction publishes generation
    // g+1 and RETAINS generation g (gcKeep = 2); in-place appends then
    // only touch the current generation, so g is a frozen snapshot of
    // the pre-append index. Night 2's batch probes asOf = g and must
    // see the ORIGINAL corpus only: batch A's appended survivors are
    // invisible, so A's exact copies SURVIVE here — the same batch
    // drops them in d13's current-index probe. One query pins the
    // whole retention story: freeze-at-flip semantics, keep-window GC
    // honoring the stamp across the append's begin, and the as-of
    // resolution — hash-exact against the single-ingest oracle.
    Q("d25_asof_probe",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.writeNearDupIndex(
          docs.select(col("doc_id"), col("text")), "graft_d25_idx")
        Dedup.compactNearDupIndex(s, "graft_d25_idx", gcKeep = 2)
        val g0 = Generations.currentGen(s, "graft_d25_idx").get - 1
        val batchA = ingestBatch(docs)
        val survA = Dedup.incrementalNearDupSurvivorsIndexed(
          s, "graft_d25_idx", batchA)
        Dedup.appendToNearDupIndex(batchA.join(survA, "doc_id"),
          "graft_d25_idx")
        Dedup.incrementalNearDupSurvivorsIndexed(s, "graft_d25_idx",
            ingestBatchB(docs), asOf = Some(g0))
          .orderBy("doc_id")
      },
      Some(sqlAsOfSurvivors)),

    // ---- d09: incremental dedup (daily ingest vs historical corpus) --
    // The production shape of exact dedup at 100 TB: a new batch is
    // fingerprint-anti-joined against the corpus's fingerprint index —
    // one shuffle per side on fp, no broadcast (the corpus side is the
    // big one), partial-agg distinct on the index. Fixture: the batch
    // replays every even doc verbatim (must drop) and ships odd docs
    // with new content (must survive). Batch ids live at +1e9 — see
    // d11's note on SF-proof id-space disjointness.
    Q("d09_incremental_dedup",
      (s, dir) => {
        val hist = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = hist.select((col("doc_id") + 1000000000L).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" fresh update"))).as("text"))
        val index = hist
          .select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
        batch.withColumn("fp", TextFunctions.fingerprint(col("text")))
          .join(index, Seq("fp"), "left_anti")
          .select(col("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH b AS (SELECT doc_id + 1000000000 AS doc_id,
          CASE WHEN doc_id % 2 = 0 THEN text
               ELSE text || ' fresh update' END AS text FROM documents),
        idx AS (SELECT DISTINCT ${TextFunctions.sqlFingerprint("text")} AS fp
          FROM documents)
        SELECT doc_id, ${TextFunctions.sqlFingerprint("text")} AS fp
        FROM b WHERE fp NOT IN (SELECT fp FROM idx)
        ORDER BY doc_id NULLS FIRST""")),

    // ---- d18: Bloom-filter decontamination contract ------------------
    // d10 with the eval universe compressed into a Bloom filter (the
    // 100 TB shape: a full eval-suite 8-gram set broadcasts in GBs,
    // the filter in MBs — and the corpus side probes a narrow UDF
    // instead of building join keys at all). Bloom flags are
    // deterministic but engine-specific, so the registered query is
    // the CONTRACT, measured against the exact d10 gate fully
    // in-engine: (1) no false negatives — impossible by construction,
    // a red row means the filter was built or probed wrong; (2) doc-
    // level FP rate among exact-clean docs ≤ 5% (fpp=1e-4 across ~60
    // spans/doc predicts ~0.6%); (3) non-vacuous — the fixture really
    // contains contaminated docs, so row 1 proves something.
    Q("d18_bloom_decontamination",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val evalSet = docs.filter(col("doc_id") % 17 === 0)
        val exact = graft.operators.Frontier.pin(
          Dedup.decontaminate(docs, evalSet)
            .select(col("doc_id"), col("contaminated").as("ex")))
        val bloom = Dedup.decontaminateBloom(docs, evalSet)
          .select(col("doc_id"), col("contaminated").as("bl"))
        val j = exact.join(bloom, "doc_id")
        def row(metric: String, bound: Double, src: org.apache.spark.sql.DataFrame,
            ok: org.apache.spark.sql.Column) =
          src.select(lit(metric).as("metric"), lit(bound).as("bound"),
            ok.as("ok"))
        row("bloom_fp_rate_le_5pct", 0.05,
            j.filter(!col("ex")).agg((sum(when(col("bl"), 1).otherwise(0)) /
              count(lit(1)).cast("double")).as("fp")),
            col("fp") <= 0.05)
          .unionByName(row("bloom_no_false_negatives", 0.0,
            j.agg(sum(when(col("ex") && !col("bl"), 1).otherwise(0))
              .as("miss")), col("miss") === 0))
          .unionByName(row("bloom_non_vacuous", 0.0,
            j.agg(sum(when(col("ex"), 1).otherwise(0)).as("pos")),
            col("pos") > 0))
          .orderBy("metric")
      },
      Some("""SELECT * FROM (
          SELECT 'bloom_fp_rate_le_5pct' AS metric, CAST(0.05 AS DOUBLE) AS bound, true AS ok
          UNION ALL
          SELECT 'bloom_no_false_negatives', CAST(0.0 AS DOUBLE), true
          UNION ALL
          SELECT 'bloom_non_vacuous', CAST(0.0 AS DOUBLE), true)
        ORDER BY metric NULLS FIRST""")),

    // ---- d19: duplicate-SPAN removal (self-dedup, keep-one) ----------
    // The train-train exact-substring signal d07 only MEASURES: every
    // cross-site duplicated 8-token tile is removed at all but its
    // canonical (lowest doc_id, lowest position) occurrence, and each
    // doc's text is rebuilt from the survivors. Differs from d16 in
    // both the span source (the corpus itself, not an eval set) and
    // the policy (keep one copy, not mask all). Fixture plants full
    // copies of docs < 250 at +1e9, so planted copies collapse to ""
    // (their canonical is always the original) while originals keep
    // their text minus any naturally shared boilerplate.
    Q("d19_span_removal",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") < 250)
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
        Dedup.removeDuplicateSpans(planted, k = 8).orderBy("doc_id")
      },
      Some(s"""WITH d2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000000, text FROM documents
          WHERE doc_id < 250),
        x AS (${Dedup.sqlRemoveDuplicateSpans("d2", 8)})
        SELECT * FROM x ORDER BY doc_id NULLS FIRST""")),

    // ---- d20: MAXIMAL-span duplicate removal (ExactSubstr merge) -----
    // d19 with adjacent duplicated tiles coalesced into maximal
    // per-doc runs before the keep-one choice, so a long shared
    // passage survives contiguously at exactly ONE site instead of
    // shredding tile-by-tile across canonical docs. Fixture adds six
    // synthetic docs sharing an aligned 4-tile passage behind unique
    // 1-tile prefixes: the lowest-id synthetic doc keeps the passage
    // whole, the other five keep only their prefixes — the contiguity
    // the tile policy cannot promise (DedupSpec pins the shredding
    // counter-example).
    Q("d20_maximal_spans",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = docs
          .unionByName(docs.filter(col("doc_id") < 250)
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
          .unionByName(SynthPassageDocs.toDF("doc_id", "text"))
        Dedup.removeDuplicateSpansMerged(planted, k = 8).orderBy("doc_id")
      },
      Some(s"""WITH d2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000000, text FROM documents
          WHERE doc_id < 250
          UNION ALL SELECT * FROM (VALUES
            ${SynthPassageDocs.map { case (id, t) => s"($id, '$t')" }
              .mkString(",\n            ")}) v(doc_id, text)),
        x AS (${Dedup.sqlRemoveDuplicateSpansMerged("d2", 8)})
        SELECT * FROM x ORDER BY doc_id NULLS FIRST""")),

    // ---- d21: DELETION from the maintained index (tombstones) --------
    // The lifecycle step appends/compactions don't cover: a takedown
    // (right-to-erasure, licensing revocation) must stop a deleted
    // doc's index entries from suppressing future matches IMMEDIATELY,
    // without a corpus-sized rewrite. tombstoneNearDup records the ids
    // (under the writer lease); every probe anti-joins them; the next
    // compaction reclaims the rows physically and clears the set
    // (TombstoneSpec pins reclamation + idempotent clearing). Here:
    // docs 0-49 are deleted from a full-corpus index, then a batch of
    // lightly-edited copies of docs 0-99 probes it — copies of deleted
    // docs survive (their evidence is gone) unless a RETAINED near-dup
    // still matches them; copies of retained docs drop. Oracle = exact
    // Jaccard over (corpus minus deleted) + batch.
    Q("d21_tombstone_probe",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.writeNearDupIndex(
          docs.select(col("doc_id"), col("text")), "graft_d21_idx")
        Dedup.tombstoneNearDup(s, "graft_d21_idx",
          docs.filter(col("doc_id") < 50).select("doc_id"))
        val batch = docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            concat(col("text"), lit(" zz edit marker token pad")).as("text"))
        Dedup.incrementalNearDupSurvivorsIndexed(s, "graft_d21_idx", batch)
          .orderBy("doc_id")
      },
      Some(s"""WITH d2 AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 50
          UNION ALL SELECT doc_id + 1000000000, text || ' zz edit marker token pad'
            FROM documents WHERE doc_id < 100),
        ${Dedup.sqlJaccardCtes("d2")},
        dup AS (SELECT DISTINCT id_b AS doc_id FROM jp
          WHERE id_a < 1000000000 AND id_b >= 1000000000)
        SELECT doc_id FROM d2
        WHERE doc_id >= 1000000000 AND doc_id NOT IN (SELECT doc_id FROM dup)
        ORDER BY doc_id NULLS FIRST""")),

    // ---- d23: SEMANTIC dedup over the maintained k-NN graph ----------
    // The composition the graph exists for (s24's comment made real):
    // thresholded graph edges ARE duplicate evidence — feed them to
    // d05's large-star/small-star components and label every vector
    // with its semantic-duplicate cluster. Built at nprobe = nCells
    // the graph is exact, so the WHOLE chain — maintained-index build,
    // bucketed probe, cos >= tau edge gate, O(log n) component rounds —
    // hash-checks against DuckDB: exact top-k graph, same threshold,
    // recursive-CTE reachability (d05's oracle pattern). At 100 TB the
    // pair space never materializes beyond the graph's k rows per
    // vertex, and components stay the keyed star algorithm.
    Q("d23_graph_semantic_dedup",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") < 400).select("vec_id", "embedding")
        KnnGraphIndex.writeKnnGraph(emb, "graft_d23_graph",
          k = 5, nCells = 16, nprobe = 16)
        val pairs = KnnGraphIndex.probeKnnGraph(s, "graft_d23_graph")
          .filter(col("cos") >= 0.35)
          .select(col("qid").as("id_a"), col("vec_id").as("id_b"))
        Dedup.duplicateClusters(
            emb.select(col("vec_id").as("doc_id")), pairs)
          .select(col("doc_id").as("vec_id"), col("component"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE n AS (SELECT vec_id, embedding,
            ${graft.functions.VectorFunctions.chainNorm("embedding", 64, 1)} AS nrm
          FROM embeddings WHERE vec_id < 400),
        c AS (SELECT q.vec_id AS qid, n.vec_id,
            CAST(${graft.functions.VectorFunctions.chainDot("q.embedding", "n.embedding", 64, 1)} AS DOUBLE)
              / (q.nrm * n.nrm) AS cos
          FROM n q JOIN n ON n.vec_id <> q.vec_id),
        r AS (SELECT qid, vec_id, cos, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM c),
        g AS (SELECT qid, vec_id FROM r WHERE rank <= 5 AND cos >= 0.35),
        edges AS (SELECT qid AS src, vec_id AS dst FROM g
          UNION ALL SELECT vec_id, qid FROM g),
        reach AS (
          SELECT vec_id AS id, vec_id AS label FROM embeddings
          WHERE vec_id < 400
          UNION
          SELECT e.dst AS id, rr.label AS label
          FROM reach rr JOIN edges e ON rr.id = e.src)
        SELECT id AS vec_id, min(label) AS component FROM reach
        GROUP BY id ORDER BY vec_id NULLS FIRST""")),

    // ---- d24: SEMANTIC decontamination (embedding space) -------------
    // d10 catches verbatim benchmark leakage via shared 8-grams; a
    // PARAPHRASED eval item shares no 8-gram but its embedding still
    // sits next to the benchmark's. Same eval convention as d10
    // (vec_id % 17 = 0 is the held-out set), the rest of the corpus is
    // scored against it: any cosine >= 0.35 neighbor flags the vector.
    // Eval side broadcast (benchmarks are bounded at any corpus
    // scale), corpus side one narrow scan — the d06 two-stage gate
    // (codegen float under a guard band, chain-exact at the cut) makes
    // the decision boundary oracle-exact.
    Q("d24_semantic_decontamination",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        Dedup.semanticDecontaminate(
            emb.filter(col("vec_id") % 17 =!= 0),
            emb.filter(col("vec_id") % 17 === 0))
          .orderBy("vec_id")
      },
      Some(s"""WITH ev AS (SELECT vec_id AS eid, embedding AS ee,
            ${graft.functions.VectorFunctions.chainNorm("ee", 64, 1)} AS en
          FROM embeddings WHERE vec_id % 17 = 0),
        c AS (SELECT vec_id, embedding,
            ${graft.functions.VectorFunctions.chainNorm("embedding", 64, 1)} AS nrm
          FROM embeddings WHERE vec_id % 17 <> 0),
        h AS (SELECT c.vec_id, count(*) AS n_hits FROM c JOIN ev ON
            CAST(${graft.functions.VectorFunctions.chainDot("c.embedding", "ev.ee", 64, 1)} AS DOUBLE)
              / (c.nrm * ev.en) >= 0.35
          GROUP BY c.vec_id)
        SELECT c.vec_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_eval_hits,
          COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM c LEFT JOIN h ON c.vec_id = h.vec_id
        ORDER BY c.vec_id NULLS FIRST""")),
  )
}
