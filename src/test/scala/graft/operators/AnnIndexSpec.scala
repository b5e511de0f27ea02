package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted ANN index's three contracts: the probe is
  * bit-identical to the in-memory IVF-PQ operator at equal parameters
  * (same deterministic training → same model → same codes/scores), the
  * cell-partitioned layout actually prunes (dynamic partition pruning
  * reaches the scan), and an append encodes with the FROZEN model so
  * probes find new vectors without a rebuild. */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("probe == in-memory ivfPqTopK at equal parameters; DPP prunes cells") {
    AnnIndex.writeAnnIndex(emb, "graft_test_ann")
    val probe = AnnIndex.probeAnnIndex(spark, "graft_test_ann", emb,
      col("vec_id") < 8, k = 10)
    val inMem = Similarity.ivfPqTopK(spark, emb, col("vec_id") < 8, 10)
    val a = probe.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getDouble(3))).toSet
    val b = inMem.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getDouble(3))).toSet
    assert(a == b, s"persisted probe diverged: ${a.size} vs ${b.size} rows")
    // the scan of the codes table carries a dynamic partition-pruning
    // filter on cell — unprobed cell directories are never listed
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // geometry stamps recorded (resolved through the generation pointer)
    val props = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(
        Generations.resolve(spark, "graft_test_ann", "cells")))
      .properties
    assert(props.get(AnnIndex.MProp).contains("8"))
    assert(props.get(AnnIndex.KsubProp).contains("32"))
  }

  test("candidacy filter applies BEFORE the shortlist cut, not as a post-truncation") {
    // the s40 contract: the filter must narrow who competes for the
    // shortlist, so admissible docs that an unfiltered top-shortlist
    // would have squeezed out ARE retrievable. Post-filtering would
    // make the filtered result a subset of the unfiltered shortlist.
    AnnIndex.writeAnnIndex(emb, "graft_test_ann_f")
    val pred = col("vec_id") % 2 === 0
    // a TIGHT unfiltered shortlist forces the distinction: the top-6
    // unfiltered candidates include odd vec_ids, so a post-filter
    // could keep at most the few even survivors
    val filtered = AnnIndex.probeAnnIndex(spark, "graft_test_ann_f", emb,
        col("vec_id") < 8, k = 5, shortlist = 6, candPred = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unfiltered = AnnIndex.probeAnnIndex(spark, "graft_test_ann_f", emb,
        col("vec_id") < 8, k = 5, shortlist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered.nonEmpty, "filtered probe returned nothing — vacuous")
    assert(filtered.forall(_._2 % 2 == 0),
      s"a hit violates the candidacy predicate: $filtered")
    assert(filtered.exists(p => !unfiltered.contains(p)),
      "every filtered hit was already in the unfiltered shortlist — " +
        "the fixture cannot distinguish pre- from post-filtering")
  }

  test("per-query candPairs apply BEFORE the shortlist cut, per query") {
    import spark.implicits._
    // the s45 contract, candPairs flavor: each query's own admissible
    // set competes for ITS shortlist. Query 0 may only see odd ids,
    // query 1 only even — a global filter could not express this, and
    // a post-shortlist filter would leave only the few survivors of
    // the unfiltered top-6.
    AnnIndex.writeAnnIndex(emb, "graft_test_ann_cp")
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    val pairs = (ids.filter(_ % 2 == 1).map(v => (0L, v)) ++
      ids.filter(v => v % 2 == 0 && v != 1L).map(v => (1L, v)))
      .toSeq.toDF("qid", "vec_id")
    val got = AnnIndex.probeAnnIndex(spark, "graft_test_ann_cp", emb,
        col("vec_id") < 2, k = 5, shortlist = 6, candPairs = Some(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ.getOrElse(0L, Set.empty).nonEmpty &&
      byQ.getOrElse(1L, Set.empty).nonEmpty, s"vacuous: $byQ")
    assert(byQ(0L).forall(_ % 2 == 1), s"query 0 leaked even ids: $byQ")
    assert(byQ(1L).forall(_ % 2 == 0), s"query 1 leaked odd ids: $byQ")
    // pre-shortlist placement: at least one hit per query would have
    // been squeezed out of the UNFILTERED top-6 shortlist
    val unfiltered = AnnIndex.probeAnnIndex(spark, "graft_test_ann_cp",
        emb, col("vec_id") < 2, k = 6, shortlist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.exists(p => !unfiltered.contains(p)),
      "every gated hit was already in the unfiltered shortlist — " +
        "the fixture cannot distinguish pre- from post-filtering")
  }

  test("append encodes with the frozen model; probes find the new vectors") {
    val base = emb.select("vec_id", "embedding")
    AnnIndex.writeAnnIndex(base, "graft_test_ann_app")
    // the appended batch: exact copies of vectors 0..3 under new ids —
    // their nearest neighbors by construction
    val batch = base.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    AnnIndex.appendToAnnIndex(batch, "graft_test_ann_app")
    val all = base.unionByName(batch)
    val got = AnnIndex.probeAnnIndex(spark, "graft_test_ann_app", all,
        col("vec_id") < 4, k = 10)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each original query's rank-1 neighbor is its appended clone
    (0L until 4L).foreach { q =>
      assert(got(q) == q + 1000000L,
        s"query $q rank-1 = ${got(q)}, expected its appended clone")
    }
  }

  test("residual index: probe == in-memory residual ivfPqTopK; append encodes residually") {
    val base = emb.select("vec_id", "embedding")
    AnnIndex.writeAnnIndex(base, "graft_test_ann_res", residual = true)
    val probe = AnnIndex.probeAnnIndex(spark, "graft_test_ann_res", base,
      col("vec_id") < 8, k = 10)
    val inMem = Similarity.ivfPqTopK(spark, base, col("vec_id") < 8, 10,
      residual = true)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getDouble(3))).toSet
    assert(set(probe) == set(inMem),
      "residual persisted probe diverged from the in-memory operator")
    // the stamp survives and gates the append's encoding: an appended
    // exact clone must still land at rank 1 (codes comparable)
    val batch = base.filter(col("vec_id") < 2)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    AnnIndex.appendToAnnIndex(batch, "graft_test_ann_res")
    val all = base.unionByName(batch)
    val got = AnnIndex.probeAnnIndex(spark, "graft_test_ann_res", all,
        col("vec_id") < 2, k = 10)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 2L).foreach { q =>
      assert(got(q) == q + 3000000L,
        s"query $q rank-1 = ${got(q)}, expected its appended clone")
    }
  }

  test("compaction collapses per-append files; probe identical; DPP intact") {
    val base = emb.select("vec_id", "embedding")
    AnnIndex.writeAnnIndex(base, "graft_test_ann_cmp")
    // three nightly appends: fixture vectors under fresh ids
    val appends = (0 until 3).map(n => base
      .filter(col("vec_id") >= n * 4 && col("vec_id") < (n + 1) * 4)
      .select((col("vec_id") + 2000000L + n * 100L).as("vec_id"),
        col("embedding")))
    appends.foreach(AnnIndex.appendToAnnIndex(_, "graft_test_ann_cmp"))
    val all = appends.foldLeft(base)(_ unionByName _)
    def probe() = AnnIndex.probeAnnIndex(spark, "graft_test_ann_cmp", all,
      col("vec_id") < 4, k = 10)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = collect(probe())

    def perCellFiles: Seq[Int] = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(
          Generations.resolve(spark, "graft_test_ann_cmp", "cells"))).location
      Option(new java.io.File(new java.net.URI(loc.getPath).getPath)
        .listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    }
    assert(perCellFiles.exists(_ > 1), "appends should accrete files")

    AnnIndex.compactAnnIndex(spark, "graft_test_ann_cmp")
    assert(perCellFiles.nonEmpty && perCellFiles.forall(_ == 1),
      s"per-cell files after compaction: $perCellFiles")
    val compacted = probe()
    assert(collect(compacted) == before, "compaction changed the probe result")
    // the rewritten table still partition-prunes via the broadcast
    // query-cell join, and the geometry stamps survived the swap
    val plan = compacted.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    val props = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(
        Generations.resolve(spark, "graft_test_ann_cmp", "cells"))).properties
    assert(props.get(AnnIndex.MProp).contains("8"))
  }

  test("as-of probe: a retained generation is the frozen pre-append index") {
    val base = emb.select("vec_id", "embedding")
    val name = "graft_test_ann_asof"
    AnnIndex.writeAnnIndex(base, name)
    // the compaction publishes the current generation and retains its
    // predecessor — the frozen snapshot the as-of probe pins
    AnnIndex.compactAnnIndex(spark, name, gcKeep = 2)
    val g0 = Generations.currentGen(spark, name).get - 1
    val batch = base.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val all = base.unionByName(batch)
    def top1(asOf: Option[Long]) =
      AnnIndex.probeAnnIndex(spark, name, all, col("vec_id") < 4, k = 10,
          asOf = asOf)
        .filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frozen = top1(Some(g0))
    AnnIndex.appendToAnnIndex(batch, name)
    // the live probe sees the appended clones as rank-1; the as-of
    // probe answers from the snapshot — codes, model, geometry all
    // from generation g0, appends invisible
    (0L until 4L).foreach { q =>
      assert(top1(None)(q) == q + 1000000L,
        s"live probe: query $q should rank its appended clone first")
    }
    assert(top1(Some(g0)) == frozen,
      "the as-of probe drifted from the frozen pre-append answer")
  }

  test("cellStats: drifted vectors move the rebuild signal") {
    import spark.implicits._
    val base = emb.select("vec_id", "embedding")
    AnnIndex.writeAnnIndex(base, "graft_test_ann_st")
    val baseline = AnnIndex.cellStats(spark, "graft_test_ann_st", base)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(baseline.values.map(_._1).sum == base.count())
    // an out-of-distribution batch (vectors far outside the trained
    // region) must raise the mean distance of whatever cells absorb it
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val far = (0 until 8).map(i =>
      (4000000L + i, Seq.fill(dim)(50.0f + i))).toDF("vec_id", "embedding")
    val shifted = AnnIndex.cellStats(spark, "graft_test_ann_st",
        base.unionByName(far))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(shifted.values.map(_._1).sum == base.count() + 8)
    val moved = shifted.exists { case (c, (_, mean)) =>
      baseline.get(c).forall(b => mean > b._2 * 1.5)
    }
    assert(moved, s"drift did not move any cell's mean: $baseline vs $shifted")
  }

  test("retrain lifecycle: drift trips the signal, retrain == fresh rebuild, signal resets") {
    val base = emb.select("vec_id", "embedding")
    AnnIndex.writeAnnIndex(base, "graft_test_ann_rt", residual = true)
    // the corpus the model was trained on measures ratio 1 by definition
    assert(math.abs(AnnIndex.driftRatio(spark, "graft_test_ann_rt", base) - 1.0) < 1e-9)
    // off-distribution batch: shifted copies (far from every build-time
    // centroid, angular diversity preserved)
    val drifted = base.select((col("vec_id") + 1000000000L).as("vec_id"),
      expr("transform(embedding, x -> CAST(x + CAST(0.2 AS FLOAT) AS FLOAT))")
        .as("embedding"))
    AnnIndex.appendToAnnIndex(drifted, "graft_test_ann_rt")
    val all = base.unionByName(drifted).localCheckpoint()
    val (ratio, retrained) = AnnIndex.retrainAnnIndexIfDrifted(
      spark, "graft_test_ann_rt", all, maxDrift = 1.25)
    assert(ratio > 1.25, s"drifted append did not trip the signal: $ratio")
    assert(retrained, "threshold exceeded but no retrain ran")
    // the signal resets: the retrained model fits the current corpus
    val reset = AnnIndex.driftRatio(spark, "graft_test_ann_rt", all)
    assert(math.abs(reset - 1.0) < 1e-9, s"signal did not reset: $reset")
    // retrain ≡ fresh rebuild: same deterministic training over the
    // same corpus → same model → bit-identical probes
    AnnIndex.writeAnnIndex(all, "graft_test_ann_rt2", residual = true)
    def probeSet(name: String) =
      AnnIndex.probeAnnIndex(spark, name, all, col("vec_id") < 4, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    assert(probeSet("graft_test_ann_rt") == probeSet("graft_test_ann_rt2"),
      "retrained index diverged from a fresh build on the same corpus")
    // an un-drifted corpus does not trigger a retrain
    val (r2, did2) = AnnIndex.retrainAnnIndexIfDrifted(
      spark, "graft_test_ann_rt", all, maxDrift = 1.25)
    assert(!did2 && r2 < 1.05, s"spurious retrain at ratio $r2")
  }

  // The ANN twin of the r11 bucket-resize ask: the cell count is
  // SEMANTIC (the frozen quantizer's regions), so the resize rides the
  // retrain — one generation swap, re-trained model + re-encoded codes
  // published together. Exhaustive probes (nprobe = nCells, corpus
  // shortlist) are model-independent exact search, so they must be
  // identical across the resize; the stamped nCells and the physical
  // cell directories must actually move.
  test("retrain resize: cell count moves inside one swap; exhaustive probe invariant") {
    val base = emb.select("vec_id", "embedding")
      .filter(col("vec_id") < 400).localCheckpoint()
    val name = "graft_test_ann_resize"
    AnnIndex.writeAnnIndex(base, name, nCells = 4)
    def exhaustive() = AnnIndex.probeAnnIndex(spark, name, base,
        col("vec_id") < 4, k = 10, nprobe = 64, shortlist = 4000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    def stamped() = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(
          Generations.resolve(spark, name, "cells")))
      .properties(AnnIndex.NCellsProp).toInt
    def cellDirs() = spark.table(Generations.resolve(spark, name, "cells"))
      .select("cell").distinct().count()
    val before = exhaustive()
    assert(stamped() == 4 && cellDirs() <= 4)
    AnnIndex.retrainAnnIndex(spark, name, base, nCells = Some(16))
    assert(stamped() == 16, "nCells stamp did not move with the resize")
    assert(cellDirs() > 4, "cell layout did not actually widen")
    assert(exhaustive() == before,
      "exhaustive probe changed across the cell-count resize")
    // and the resized model is what future appends encode against
    val more = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") >= 400 && col("vec_id") < 410)
      .select("vec_id", "embedding")
    AnnIndex.appendToAnnIndex(more, name)
    val found = AnnIndex.probeAnnIndex(spark, name, base.unionByName(more),
        col("vec_id") === 400, k = 5, nprobe = 64, shortlist = 4000)
      .count()
    assert(found == 5L, "post-resize append invisible to probes")
  }

  test("probing a non-index table fails fast") {
    intercept[Exception] {
      AnnIndex.probeAnnIndex(spark, "graft_no_such_index", emb,
        col("vec_id") < 2)
    }
  }

  test("scoped index: containment survives append AND compaction") {
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"), col("label"))
    AnnIndex.writeAnnIndex(base, "graft_test_ann_scope",
      scope = Seq("label"))
    // label map includes the to-be-appended vectors up front so the
    // containment check covers them once they land
    val labels = base.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap ++
      (0 until 4).map(i => (5000000L + i).toLong -> i % 2)
    def assertScoped(tag: String): Unit = {
      val rows = AnnIndex.probeAnnIndex(spark, "graft_test_ann_scope",
        emb, col("vec_id") < 8, k = 10, nprobe = 8)
        .select("qid", "vec_id").collect()
      assert(rows.nonEmpty, s"$tag: empty probe")
      rows.foreach(r => assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"$tag: cross-label leak qid=${r.getLong(0)} vec=${r.getLong(1)}"))
    }
    assertScoped("after build")
    // an append must carry the scope column — and stays scoped
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val extra = (0 until 4).map(i =>
      (5000000L + i, Seq.fill(dim)(0.1f * (i + 1)), i % 2))
      .toDF("vec_id", "embedding", "label")
    AnnIndex.appendToAnnIndex(extra, "graft_test_ann_scope")
    assertScoped("after append")
    // appending WITHOUT the scope column fails fast, not silently
    intercept[Exception] {
      AnnIndex.appendToAnnIndex(
        extra.select("vec_id", "embedding"), "graft_test_ann_scope")
    }
    // compaction must carry the scope stamp — a lost stamp silently
    // unscopes every later probe (the bug this test pins out)
    AnnIndex.compactAnnIndex(spark, "graft_test_ann_scope")
    assertScoped("after compaction")
    // and so must a retrain (new model, new codes — same tenancy)
    AnnIndex.retrainAnnIndex(spark, "graft_test_ann_scope",
      base.unionByName(extra))
    assertScoped("after retrain")
  }
}
