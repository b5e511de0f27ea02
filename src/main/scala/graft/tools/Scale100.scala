package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, KnnGraphIndex, Similarity}

/** Dev-only: the 30–100× spot-stress (r10 verdict ask #6) for the TWO
  * operators whose scale arguments are asymptotic claims that 10×
  * measurements cannot pin down:
  *
  *  - d22's prefix-filtered exact Jaccard — the claim is that prefix
  *    fan-out keeps candidate pairs near-linear in the corpus (not the
  *    quadratic an exact all-pairs join degenerates to);
  *  - the k-NN graph build under the nCells ∝ n knob — the claim is
  *    pair work ≈ nprobe·n²/nCells stays ∝ n when nCells scales.
  *
  * Fixtures follow ScaleStress's recipe exactly (salted ids, per-copy
  * token suffixes → disjoint shingle universes, perturbed embeddings)
  * at M ∈ {10, 30, 100} over sf0.1, and the maintained graph's FIXED
  * slice probe is re-measured at each M (the r11 bucketed-layout
  * flatness claim). Output feeds the SCALE.md exponent table:
  * exponent = log(t_M / t_10) / log(M / 10) — ~1.0 means linear.
  *
  * Usage: Scale100 <sfDir> [Ms…]  (default 10 30 100) */
object Scale100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    // one (M, op) per JVM is the credible protocol: accumulated
    // lineage-pin blocks and shared-box noise made multi-stage runs
    // swing 7x run-to-run. Usage: Scale100 <sfDir> [Ms...] [op]
    // — a trailing non-numeric arg selects one op
    // (d22|s25|s26|d12|s09|none); the default "all" runs every op.
    val rest = args.drop(1)
    val (mArgs, opArgs) = rest.partition(_.forall(_.isDigit))
    val ms = if (mArgs.nonEmpty) mArgs.map(_.toInt).toSeq
      else Seq(10, 30, 100)
    require(opArgs.length <= 1, s"at most one op arg: ${opArgs.toSeq}")
    val op = opArgs.headOption.getOrElse("all")
    require(Set("all", "none", "d22", "s25", "s26", "d12", "s09", "s30",
      "s31", "s38", "s40", "s41", "s45", "s47", "s48", "s49", "s50",
      "s51h", "s52", "s54", "s57h", "s60", "s61", "s62", "s63",
      "s64", "s63h", "s64h", "s31h").contains(op),
      s"unknown op '$op' (all|none|d22|s25|s26|d12|s09|s30|s31|s38|" +
        "s40|s41|s45|s47|s48|s49|s50|s51h|s52|s54|s57h|s60|s61|s62|" +
        "s63|s64|s63h|s64h|s31h)")
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_scale")

    def indicators(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      val ex = p.linesIterator.count(_.contains("Exchange"))
      s"exchanges=$ex cartesian=${p.contains("CartesianProduct")} " +
        s"bnlj=${p.contains("BroadcastNestedLoop")}"
    }

    def scaled(m: Int, name: String, build: Int => DataFrame): String = {
      val path = new java.io.File(root, s"m$m/$name.parquet").getAbsolutePath
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        // fold in batches of 20 — a 100-way unionByName in one plan
        // blows analysis time without changing the rows
        (0 until m).grouped(20).map(ks =>
            ks.map(build).reduce(_ unionByName _))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(path)
      }
      path
    }

    ms.foreach { m =>
      val docs0 = Tables(spark, sfDir, "documents")
      val emb0 = Tables(spark, sfDir, "embeddings")
      val docs = spark.read.parquet(scaled(m, "documents", k =>
        docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
          (if (k == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", s"$$1z$k")).as("text"),
          col("lang"), col("n_chars"))))
      val emb = spark.read.parquet(scaled(m, "embeddings", k =>
        emb0.select((col("vec_id") + k * 10000000000L).as("vec_id"),
          expr(s"transform(embedding, x -> CAST(x + CAST($k AS FLOAT)" +
            s" * CAST(0.0001 AS FLOAT) AS FLOAT))").as("embedding"),
          col("label")))).select(col("vec_id"), col("embedding"))

      def time(name: String, mk: () => DataFrame): Unit = {
        var best = Double.MaxValue
        var ind = ""
        (1 to 2).foreach { _ =>
          // the clock starts BEFORE mk(): operators that pin an
          // intermediate frame (Frontier.pin is EAGER) do their work
          // at build time, and a count-only timer would miss it
          val t0 = System.nanoTime()
          val df = mk()
          df.count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          ind = indicators(df)
        }
        println(f"[s100] m=$m%-4d $name%-14s ${best}%8.2fs  $ind")
      }

      if (op == "all" || op == "d22")
        time("d22", () => Dedup.prefixJaccardPairs(
          docs.select(col("doc_id"), col("text"))))
      if (op == "all" || op == "s25")
        time("s25_graph", () =>
          Similarity.knnGraph(spark, emb, k = 10, nCells = 16 * m,
            nprobe = 2))

      if (op == "all" || op == "s26") {
        // the maintained graph: build once, then the FIXED 300-vector
        // slice probe that must stay flat under the bucketed layout
        val gName = s"graft_s100_graph_m$m"
        val t0 = System.nanoTime()
        KnnGraphIndex.writeKnnGraph(emb, gName, k = 10, nCells = 16 * m,
          nprobe = 2, edgeBuffer = 10)
        println(f"[s100] m=$m%-4d s26_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val batch = emb.filter(col("vec_id") < 300)
          .select((col("vec_id") + 88000000000L).as("vec_id"),
            col("embedding")).localCheckpoint()
        val t1 = System.nanoTime()
        KnnGraphIndex.appendToKnnGraph(batch, gName)
        println(f"[s100] m=$m%-4d s26_append     ${(System.nanoTime() - t1) / 1e9}%8.2fs  (build)")
        time("slice_probe", () => KnnGraphIndex.probeKnnGraph(spark, gName,
          col("qid") >= 88000000000L))
      }

      // the two r11 probe-flatness claims still pinned only at 10×
      // (r11 verdict ask #4): the bucketed near-dup probe (d12) and
      // the DPP ANN probe (s09), each against an index over the M×
      // corpus with the layout knob scaled ∝ M (numBuckets / nCells —
      // the resize sizing rule), probed with a FIXED-size batch.
      if (op == "all" || op == "d12") {
        val iName = s"graft_s100_nd_m$m"
        val t0 = System.nanoTime()
        Dedup.writeNearDupIndex(docs.select(col("doc_id"), col("text")),
          iName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d d12_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val batch = docs.filter(col("doc_id") < 25)
          .select((col("doc_id") + 77000000000L).as("doc_id"),
            concat(col("text"), lit(" zz probe pad")).as("text"))
          .unionByName(spark.range(25)
            .select((col("id") + 78000000000L).as("doc_id"),
              concat(lit("scale100 fixed novel probe doc "),
                col("id").cast("string"),
                lit(" alpha beta gamma delta epsilon zeta eta theta"))
                .as("text")))
          .localCheckpoint()
        time("d12_probe", () => Dedup.incrementalNearDupSurvivorsIndexed(
          spark, iName, batch))
        // the POINT-PROBE regime (takedown-scale): 2 docs → 128 bucket
        // keys ≪ numBuckets = 8·M, so bucket pruning reads ~keys many
        // constant-size buckets whatever the corpus — the flat regime
        // of the pushdown (the 50-doc probe above measures the
        // scan-bound regime where keys ≥ buckets)
        val point = docs.filter(col("doc_id") < 2)
          .select((col("doc_id") + 79000000000L).as("doc_id"),
            concat(col("text"), lit(" zz point pad")).as("text"))
          .localCheckpoint()
        time("d12_point", () => Dedup.incrementalNearDupSurvivorsIndexed(
          spark, iName, point))
      }
      // hybrid retrieval (r12 verdict ask #7): the one-shot lexical
      // build shape should be ~linear in the corpus; the MAINTAINED
      // index probe should be FLAT — the scaled fixture suffixes every
      // copy's tokens (z$k), so the fixed base-copy query terms' posting
      // lists do not grow with M and the bounded tok-pushdown reads
      // fixed bytes from an M×-sized postings table (numBuckets ∝ M,
      // the resize sizing rule).
      if (op == "all" || op == "s30")
        time("s30_oneshot", () => graft.operators.HybridRetrieval
          .lexicalTopK(docs.select(col("doc_id"), col("text")),
            col("doc_id") < 8, 20))
      if (op == "all" || op == "s31") {
        val lName = s"graft_s100_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s31_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s31_probe", () => graft.operators.LexIndex.probeLexIndex(
          spark, lName, queries, kEach = 20))
      }
      // the FULL serve path (s38): both indexes persisted at M× with
      // their layout knobs ∝ M, the fused probe's cost = lex pushdown
      // (fixed bytes — base-copy query terms' posting lists don't grow)
      // + nprobe constant-size ANN cells + ≤2·kEach-row fusion — the
      // whole query-time story should be flat like its two halves.
      if (op == "all" || op == "s38") {
        val lName = s"graft_s100_hyb_lex_m$m"
        val aName = s"graft_s100_hyb_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s38_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s38_probe", () => {
          val lex = graft.operators.LexIndex.probeLexIndex(
            spark, lName, queries, kEach = 20)
          val vec = graft.operators.AnnIndex.probeAnnIndex(
              spark, aName, emb, col("vec_id") < 8, k = 20)
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          graft.operators.HybridRetrieval.rrfFuse(lex, vec, 10)
        })
      }
      // the FILTERED serve path (s40): the candidacy scope must not
      // change the flat probe shape — it only narrows the already
      // bounded posting-list rows and the pruned-cell ADC scan, so the
      // filtered probe should track s38's times from below.
      if (op == "all" || op == "s40") {
        val lName = s"graft_s100_fhyb_lex_m$m"
        val aName = s"graft_s100_fhyb_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s40_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s40_probe", () => {
          val lex = graft.operators.LexIndex.probeLexIndex(
            spark, lName, queries, kEach = 20,
            candPred = Some(col("doc_id") % 2 === 0))
          val vec = graft.operators.AnnIndex.probeAnnIndex(
              spark, aName, emb, col("vec_id") < 8, k = 20,
              candPred = Some(col("vec_id") % 2 === 0))
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          graft.operators.HybridRetrieval.rrfFuse(lex, vec, 10)
        })
      }
      // phrase retrieval (s41): probe cost is bounded by the 8 query
      // phrases' term posting lists (pushdown + anchor grouping) — the
      // bounded-probe argument again, measured on positional postings.
      if (op == "all" || op == "s41") {
        val lName = s"graft_s100_ph_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s41_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val phrases = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("phrase_id"),
            concat_ws(" ", slice(graft.functions.TextFunctions
              .tokens(col("text")), 1, 2)).as("phrase"))
          .localCheckpoint()
        time("s41_probe", () => graft.operators.LexIndex.probePhrase(
          spark, lName, phrases))
      }
      // phrase-MUST hybrid serve (s45): probePhrase's per-query matches
      // gate BOTH persisted legs. Probe cost = the phrase intersection
      // (bounded by the 8 phrases' term posting lists) + the two gated
      // index probes — all three bounded-by-query paths, so the
      // composition should stay near-flat like s38/s41.
      if (op == "all" || op == "s45") {
        val lName = s"graft_s100_pm_lex_m$m"
        val aName = s"graft_s100_pm_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s45_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val phrases = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("phrase_id"),
            concat_ws(" ", slice(graft.functions.TextFunctions
              .tokens(col("text")), 1, 2)).as("phrase"))
          .localCheckpoint()
        time("s45_probe", () => {
          val pm = graft.operators.Frontier.pin(
            graft.operators.LexIndex.probePhrase(spark, lName, phrases)
              .select(col("phrase_id").as("qid"), col("doc_id")))
          val lex = graft.operators.LexIndex.probeLexIndex(
            spark, lName, queries, kEach = 20, candPairs = Some(pm))
          val vec = graft.operators.AnnIndex.probeAnnIndex(
              spark, aName, emb, col("vec_id") < 8, k = 20,
              candPairs = Some(pm.select(col("qid"),
                col("doc_id").as("vec_id"))))
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          graft.operators.HybridRetrieval.rrfFuse(lex, vec, 10)
        })
      }
      // boolean SHOULD candidacy + ranked serve (s47): probeShould's
      // cost is the 24 SHOULD terms' posting lists (bounded pushdown,
      // fixed bytes — the scaled fixture's suffixed copies never grow
      // the base terms' lists), the scoring probe is s31's flat path
      // gated by the candidacy semi-join → the composition should
      // stay near-flat.
      if (op == "all" || op == "s47") {
        val lName = s"graft_s100_sh_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s47_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val terms = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") - 8).as("qid"),
            explode(slice(graft.functions.TextFunctions
              .tokens(col("text")), 2, 3)).as("tok"))
          .localCheckpoint()
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s47_probe", () => {
          val sm = graft.operators.Frontier.pin(
            graft.operators.LexIndex.probeShould(spark, lName, terms, 2)
              .select(col("qid"), col("doc_id")))
          graft.operators.LexIndex.probeLexIndex(
            spark, lName, queries, kEach = 20, candPairs = Some(sm))
        })
      }
      // proximity probe (s48): two bounded posting lists per query
      // meet on (qid, doc_id); the min-distance folds inside the row.
      if (op == "all" || op == "s48") {
        val lName = s"graft_s100_px_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s48_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tk = graft.functions.TextFunctions.tokens(col("text"))
        val pairs = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") - 8).as("qid"),
            element_at(tk, 2).as("tok_a"), element_at(tk, 5).as("tok_b"))
          .localCheckpoint()
        time("s48_probe", () => graft.operators.LexIndex.probeProximity(
          spark, lName, pairs, slop = 3))
      }
      // the FULL boolean grammar through the two-index serve (s49):
      // MUST ∧ SHOULD≥2 ∧ ¬MUST_NOT ∧ filter, both legs gated — every
      // constituent is a bounded-by-query path, and the boolean
      // algebra itself is pair-set operations on those probes'
      // per-query outputs, so the capstone should inherit the
      // near-flat shape of s45/s47.
      if (op == "all" || op == "s49") {
        val lName = s"graft_s100_bq_lex_m$m"
        val aName = s"graft_s100_bq_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s49_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val phrases = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("phrase_id"),
            concat_ws(" ", slice(tkx, 1, 2)).as("phrase")).localCheckpoint()
        val negs = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("phrase_id"),
            concat_ws(" ", slice(tkx, 3, 1)).as("phrase")).localCheckpoint()
        val terms = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") - 8).as("qid"),
            explode(slice(tkx, 2, 3)).as("tok")).localCheckpoint()
        time("s49_probe", () => {
          val pm = graft.operators.LexIndex.probePhrase(spark, lName,
              phrases)
            .select(col("phrase_id").as("qid"), col("doc_id"))
          val sm = graft.operators.LexIndex.probeShould(spark, lName,
              terms, 2)
            .select(col("qid"), col("doc_id"))
          val nm = graft.operators.LexIndex.probePhrase(spark, lName, negs)
            .select(col("phrase_id").as("qid"), col("doc_id"))
          val bq = graft.operators.Frontier.pin(
            pm.join(sm, Seq("qid", "doc_id"))
              .join(nm, Seq("qid", "doc_id"), "left_anti"))
          val lex = graft.operators.LexIndex.probeLexIndex(spark, lName,
            queries, kEach = 20, candPred = Some(col("doc_id") % 2 === 0),
            candPairs = Some(bq))
          val vec = graft.operators.AnnIndex.probeAnnIndex(spark, aName,
              emb, col("vec_id") < 8, k = 20,
              candPred = Some(col("vec_id") % 2 === 0),
              candPairs = Some(bq.select(col("qid"),
                col("doc_id").as("vec_id"))))
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          graft.operators.HybridRetrieval.rrfFuse(lex, vec, 10)
        })
      }
      // vocabulary surfaces on the HEAPS-HONEST fixture (r15 finding
      // #1's ladder fix): the suffix fixture above grows the
      // VOCABULARY at exactly the corpus rate, so its s50/s52
      // exponents could not distinguish vocab-bound from
      // postings-scan-bound work. Here the copies REUSE the base
      // text verbatim (ids salted): postings grow ×M while the
      // dictionary stays CONSTANT — the regime that exposed the old
      // per-probe postings scan. With the maintained vocab members,
      // fuzzy (s51h) and autocomplete (s57h) read dfcap ∪ deltas and
      // must run near-FLAT against the ×M postings; real corpora
      // (Heaps' law) sit between the two fixtures.
      if (op == "s51h" || op == "s57h") {
        val heaps = spark.read.parquet(scaled(m, "documents_heaps", k =>
          docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            col("text"), col("lang"), col("n_chars"))))
        val lName = s"graft_s100_hv_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          heaps.select(col("doc_id"), col("text")), lName,
          numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d ${op}_build     ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        if (op == "s51h") {
          val terms = heaps
            .filter(col("doc_id") >= 8 && col("doc_id") < 16)
            .select((col("doc_id") - 8).as("qid"),
              explode(array(element_at(tkx, 1), element_at(tkx, 3)))
                .as("t"))
            .select(col("qid"),
              expr("concat(left(t, 1), substring(t, 3))").as("term"))
            .distinct().localCheckpoint()
          time("s51h_fuzzy", () => graft.operators.LexIndex.probeFuzzy(
            spark, lName, terms))
        } else {
          val prefixes = heaps.filter(col("doc_id") < 8)
            .select(col("doc_id").as("qid"),
              substring(element_at(tkx, 1), 1, 1).as("prefix"))
            .localCheckpoint()
          time("s57h_suggest", () => graft.operators.LexIndex
            .suggestTerms(spark, lName, prefixes, k = 8))
        }
      }
      // n-term proximity (s63): three bounded posting-list sides on
      // one pushed scan; the window fold is row-local.
      if (op == "s63") {
        val lName = s"graft_s100_pn_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s63_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        val clauses = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") - 8).as("qid"), posexplode(
            array(element_at(tkx, 2), element_at(tkx, 5),
              element_at(tkx, 7))))
          .select(col("qid"), col("pos").as("off"), col("col").as("tok"))
          .localCheckpoint()
        time("s63_probe", () => graft.operators.LexIndex.probeProximityN(
          spark, lName, clauses, slop = 6))
      }
      // highlighted serve (s64): ranked probe + best-window fold over
      // the top-k hits' position arrays + the In-pushdown snippet
      // fetch — every stage bounded by the query/hit sets.
      if (op == "s64") {
        val lName = s"graft_s100_hl_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s64_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s64_probe", () => {
          val ranked = graft.operators.Frontier.pin(
            graft.operators.LexIndex.probeLexIndex(spark, lName, queries,
              kEach = 10))
          val bw = graft.operators.LexIndex.bestWindows(spark, lName,
            ranked.select("qid", "doc_id"), queries, w = 5)
          val hits = ranked.join(bw, Seq("qid", "doc_id"))
            .select(col("qid"), col("doc_id"), col("lex_rank"),
              col("n_terms"), col("win_start").as("first_pos"))
          graft.operators.HybridRetrieval.snippets(hits,
            docs.select(col("doc_id"), col("text")),
            phraseLen = 5, ctx = 2)
        })
      }
      // s63/s64 on the HEAPS-HONEST fixture (the r16 verdict's
      // straddle adjudication): both ops READ the positions column,
      // and on the suffix fixture row groups whose tok min/max
      // straddle the probed terms' lexicographic neighbors pay their
      // wide positions pages even when every row filters out (s64
      // measured 0.42 there). The suffix fixture's ×M vocabulary
      // manufactures that adjacency; here the copies reuse the base
      // text verbatim (vocab constant), so the probed terms' posting
      // lists grow ×M but their lexicographic neighborhoods do not —
      // the regime a real corpus (Heaps' law) approaches.
      // the plain scoring probe on the heaps fixture — the BASELINE
      // the s63h/s64h positional ops compare against: on this fixture
      // the query terms' own posting lists grow ×M (every copy repeats
      // the base text), so the probe's bounded work grows with the
      // DATA it retrieves; a positional op whose exponent matches this
      // baseline pays nothing for positions beyond that genuine growth
      if (op == "s31h") {
        val heaps = spark.read.parquet(scaled(m, "documents_heaps", k =>
          docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            col("text"), col("lang"), col("n_chars"))))
        val lName = s"graft_s100_h31_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          heaps.select(col("doc_id"), col("text")), lName,
          numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s31h_build     ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = heaps.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s31h_probe", () => graft.operators.LexIndex.probeLexIndex(
          spark, lName, queries, kEach = 10))
      }
      if (op == "s63h" || op == "s64h") {
        val heaps = spark.read.parquet(scaled(m, "documents_heaps", k =>
          docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            col("text"), col("lang"), col("n_chars"))))
        val lName = s"graft_s100_h${op.drop(1)}_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          heaps.select(col("doc_id"), col("text")), lName,
          numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d ${op}_build     ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        if (op == "s63h") {
          val clauses = heaps
            .filter(col("doc_id") >= 8 && col("doc_id") < 16)
            .select((col("doc_id") - 8).as("qid"), posexplode(
              array(element_at(tkx, 2), element_at(tkx, 5),
                element_at(tkx, 7))))
            .select(col("qid"), col("pos").as("off"), col("col").as("tok"))
            .localCheckpoint()
          time("s63h_probe", () => graft.operators.LexIndex
            .probeProximityN(spark, lName, clauses, slop = 6))
        } else {
          val queries = heaps.filter(col("doc_id") < 8)
            .select(col("doc_id"), col("text")).localCheckpoint()
          time("s64h_probe", () => {
            val ranked = graft.operators.Frontier.pin(
              graft.operators.LexIndex.probeLexIndex(spark, lName,
                queries, kEach = 10))
            val bw = graft.operators.LexIndex.bestWindows(spark, lName,
              ranked.select("qid", "doc_id"), queries, w = 5)
            val hits = ranked.join(bw, Seq("qid", "doc_id"))
              .select(col("qid"), col("doc_id"), col("lex_rank"),
                col("n_terms"), col("win_start").as("first_pos"))
            graft.operators.HybridRetrieval.snippets(hits,
              heaps.select(col("doc_id"), col("text")),
              phraseLen = 5, ctx = 2)
          })
        }
      }
      // prefix search (s50): the expansion stage reads the MAINTAINED
      // term dictionary (dfcap ∪ deltas — ∝ vocabulary, which the
      // suffixed fixture grows ∝ M, the worst case; the s51h/s57h ops
      // measure the constant-vocab regime), pruned by the pushed
      // startsWith disjunction and capped at maxExpansions; the
      // matching stage is the capped expansions' posting lists via
      // the In(tok) pushdown. The honest claim on THIS fixture is
      // vocabulary-bound, not corpus-bound.
      if (op == "all" || op == "s50") {
        val lName = s"graft_s100_pf_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s50_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        val prefixes = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"),
            substring(element_at(tkx, 1), 1, 1).as("prefix"))
          .localCheckpoint()
        time("s50_probe", () => graft.operators.LexIndex.probePrefix(
          spark, lName, prefixes, maxExpansions = 4))
      }
      // fuzzy end to end (s52): the symmetric-delete join is
      // vocabulary-bound by design (both sides expand deletion
      // variants; candidates meet on an equi-join) — the suffixed
      // fixture grows the vocabulary ∝ M, so this measures the
      // WORST-case vocab growth; the downstream corrected-rank is
      // s31's flat path.
      if (op == "all" || op == "s52") {
        val lName = s"graft_s100_fz_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s52_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        val terms = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") - 8).as("qid"),
            explode(array(element_at(tkx, 1), element_at(tkx, 3))).as("t"))
          .select(col("qid"),
            expr("concat(left(t, 1), substring(t, 3))").as("term"))
          .distinct().localCheckpoint()
        time("s52_probe", () => {
          val sugg = graft.operators.LexIndex.probeFuzzy(spark, lName,
            terms)
          val best = sugg.withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("qid", "term")
                .orderBy(col("df").desc, col("suggestion"))))
            .filter(col("rn") === 1)
          val corrected = best.groupBy("qid")
            .agg(concat_ws(" ",
              sort_array(collect_set(col("suggestion")))).as("text"))
            .select(col("qid").as("doc_id"), col("text"))
          graft.operators.LexIndex.probeLexIndex(spark, lName, corrected,
            kEach = 20)
        })
      }
      // the search page (s54): phrase-MUST rank + snippet fetch. The
      // snippet stage pushes the ≤k·|queries| hit ids into the
      // doc-text scan as In(doc_id) — with per-copy id ranges the
      // parquet file stats prune every non-base copy, so the fetch
      // must stay flat while the corpus grows ∝ M.
      if (op == "all" || op == "s54") {
        val lName = s"graft_s100_sp_lex_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s54_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val tkx = graft.functions.TextFunctions.tokens(col("text"))
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val phrases = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("phrase_id"),
            concat_ws(" ", slice(tkx, 1, 2)).as("phrase")).localCheckpoint()
        time("s54_probe", () => {
          val pm = graft.operators.Frontier.pin(
            graft.operators.LexIndex.probePhrase(spark, lName, phrases)
              .select(col("phrase_id").as("qid"), col("doc_id"),
                col("first_pos")))
          val ranked = graft.operators.LexIndex.probeLexIndex(spark,
            lName, queries, kEach = 20,
            candPairs = Some(pm.select("qid", "doc_id")))
          val hits = ranked.join(pm, Seq("qid", "doc_id"))
          graft.operators.HybridRetrieval.snippets(hits,
            docs.select(col("doc_id"), col("text")),
            phraseLen = 2, ctx = 3)
        })
      }
      // passage rollup (s60): the chunk index is corpus-∝ at BUILD
      // (more chunks), but the probe is the same bounded-posting-list
      // path over chunk postings + a two-window rollup over the
      // ≤ 40·|queries| hit rows — flat like s31.
      if (op == "all" || op == "s60") {
        val lName = s"graft_s100_pr_lex_m$m"
        val chunks = graft.operators.HybridRetrieval.chunkDocs(
          docs.select(col("doc_id"), col("text")),
          window = 64, stride = 48, offset = 10000000L)
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(chunks, lName,
          numBuckets = 8 * m)
        println(f"[s100] m=$m%-4d s60_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s60_probe", () => {
          val hits = graft.operators.LexIndex.probeLexIndex(spark, lName,
              queries, kEach = 40)
            .withColumn("parent", expr("(doc_id - 10000000L) DIV 1000"))
            .withColumn("cidx",
              expr("CAST((doc_id - 10000000L) % 1000 AS INT)"))
          val w1 = org.apache.spark.sql.expressions.Window
            .partitionBy("qid", "parent")
            .orderBy(col("lex_scaled").desc, col("cidx"))
          val w2 = org.apache.spark.sql.expressions.Window
            .partitionBy("qid")
            .orderBy(col("lex_scaled").desc, col("parent"))
          hits.withColumn("rn", row_number().over(w1))
            .filter(col("rn") === 1)
            .withColumn("rank", row_number().over(w2))
            .filter(col("rank") <= 10)
        })
      }
      // reranked serve (s61): the rerank stage is ≤ k·|queries| text
      // pairs whatever the corpus — the In-pushdown doc fetch prunes
      // to the hit files, the mapPartitions pass is pair-bounded — so
      // the composition should track s38 from just above.
      if (op == "all" || op == "s61") {
        val lName = s"graft_s100_rr_lex_m$m"
        val aName = s"graft_s100_rr_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s61_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s61_probe", () => {
          val lex = graft.operators.LexIndex.probeLexIndex(spark, lName,
            queries, kEach = 20)
          val vec = graft.operators.AnnIndex.probeAnnIndex(spark, aName,
              emb, col("vec_id") < 8, k = 20)
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          val fused = graft.operators.Frontier.pin(
            graft.operators.HybridRetrieval.rrfFuse(lex, vec, 10))
          val rr = graft.operators.Rerank.rerank(spark, fused, queries,
            docs.select(col("doc_id"), col("text")),
            graft.operators.DiceReranker)
          fused.join(rr, Seq("qid", "doc_id"))
            .withColumn("rr_rank", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("qid")
                .orderBy(col("rerank_micro").desc, col("rank"))))
        })
      }
      // diversified serve (s62): the fused pool is <= kEach rows per
      // query, the greedy MMR is pool-local inside flatMapGroups, and
      // the pairwise sims join the pool against the embeddings table
      // on vec_id — pool-bounded work on top of s38's flat serve.
      if (op == "all" || op == "s62") {
        val lName = s"graft_s100_dv_lex_m$m"
        val aName = s"graft_s100_dv_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.LexIndex.writeLexIndex(
          docs.select(col("doc_id"), col("text")), lName, numBuckets = 8 * m)
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s62_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id"), col("text")).localCheckpoint()
        time("s62_probe", () => {
          val lex = graft.operators.LexIndex.probeLexIndex(spark, lName,
            queries, kEach = 20)
          val vec = graft.operators.AnnIndex.probeAnnIndex(spark, aName,
              emb, col("vec_id") < 8, k = 20)
            .select(col("qid"), col("vec_id").as("doc_id"),
              col("rank").as("vec_rank"))
          val fused = graft.operators.HybridRetrieval.rrfFuse(lex, vec, 20)
          graft.operators.Similarity.mmrRerank(
            fused.select(col("qid"), col("doc_id").as("vec_id"),
              col("rrf").as("cos")), emb, k = 10, lambda = 0.5)
        })
      }
      if (op == "all" || op == "s09") {
        val aName = s"graft_s100_ann_m$m"
        val t0 = System.nanoTime()
        graft.operators.AnnIndex.writeAnnIndex(emb, aName, nCells = 16 * m)
        println(f"[s100] m=$m%-4d s09_build      ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
        time("s09_probe", () => graft.operators.AnnIndex.probeAnnIndex(
          spark, aName, emb, col("vec_id") < 8, k = 10))
      }
    }
    spark.stop()
  }
}
