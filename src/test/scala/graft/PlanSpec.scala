package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BandJoin

/** Physical-plan discipline checks (the 100 TB contract, SCALE.md):
  * filters and projections must reach the parquet scan, top-k must not
  * global-sort, aggregates must partial-combine, and the band join must
  * stay an equi-join — these are the properties that survive a 1000×
  * scale-up, asserted on the plans themselves so a refactor can't
  * silently regress them. */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), scan)
    // pruned scan: only the 2 referenced columns in ReadSchema
    assert(scan.contains("l_orderkey") && scan.contains("l_quantity"), scan)
    assert(!scan.contains("l_extendedprice"), s"unpruned scan:\n$scan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val q06 = SparkEntry.queries("q06_topk_customers")(spark, sf)
    assert(formatted(q06).contains("TakeOrderedAndProject"), formatted(q06))
  }

  test("exact dedup partial-aggregates before its single exchange") {
    val d01 = SparkEntry.queries("d01_exact_dedup")(spark, sf)
    val plan = formatted(d01)
    val firstAgg = plan.indexOf("partial_")
    assert(firstAgg >= 0, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("band join is an equi-join: no cartesian/broadcast-NLJ anywhere") {
    val df = BandJoin.selfBandPairs(Tables(spark, sf, "events"),
      "user_id", "ts", "event_id", 600L)
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("funnel (v06) is one conditional aggregate, not self-joins") {
    val plan = formatted(SparkEntry.queries("v06_funnel")(spark, sf))
    assert(!plan.contains("Join"), s"funnel must not self-join:\n$plan")
    assert(plan.contains("partial_min"), s"expected map-side combine:\n$plan")
    // one hash shuffle (by user) + the output sort's range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("multi-distinct aggregate (q23) plans one Expand, not N self-joins") {
    val plan = formatted(SparkEntry.queries("q23_multi_distinct")(spark, sf))
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("range-frame window (q24) shuffles once on the partition key") {
    val plan = formatted(SparkEntry.queries("q24_range_frame")(spark, sf))
    assert(plan.contains("specifiedwindowframe(RangeFrame, -90"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("token familiarity (t07) partial-aggregates both passes") {
    val plan = formatted(SparkEntry.queries("t07_token_familiarity")(spark, sf))
    assert(plan.contains("partial_count"), plan)
    // the frequency model and the per-doc score each shuffle once;
    // the scalar total rides a broadcast — no extra wide edges
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 3, plan)
  }

  test("df-capped jaccard (d08) prunes via broadcast, df pass partial-aggregates") {
    val plan = formatted(SparkEntry.queries("d08_jaccard_capped")(spark, sf))
    // the hot-shingle frame (tiny by construction) must ride a
    // broadcast into the anti-join — a shuffled anti-join would add a
    // full-width exchange of the shingle table just to prune it
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"hot-shingle prune not broadcast:\n$plan")
    // the df count that feeds it map-side combines
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("decontamination (d10) broadcasts the eval n-grams, corpus side stays narrow") {
    val plan = formatted(SparkEntry.queries("d10_decontamination")(spark, sf))
    // the eval n-gram universe (tiny vs the corpus) must ride a
    // broadcast; a sort-merge join here would shuffle every corpus
    // n-gram just to probe a benchmark-sized set
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus side shuffled for the probe:\n$plan")
    // the per-doc contamination count map-side combines
    assert(plan.contains("partial_count"), plan)
  }

  test("tf-idf (t10) partial-aggregates tf, df and the top-k; no window sort") {
    val plan = formatted(SparkEntry.queries("t10_tfidf_terms")(spark, sf))
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the scalar n_docs rides a broadcast (1-row BNLJ is the intended
    // plan for a scalar cross join; anything else re-shuffles tf)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // per-doc top-3 runs the bounded KeywordTopK Aggregator: the plan
    // must show its partial (map-side) phase and no Window node — a
    // row_number window would shuffle+sort every scored (doc, term)
    assert(plan.contains("partial_keywordtopkagg"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("incremental near-dup (d11) stays equi-join end to end") {
    val plan = formatted(SparkEntry.queries("d11_incremental_neardup")(spark, sf))
    // candidates must come from the (band, bh) equi-join against the
    // index — any cartesian/BNLJ here means the bucket probe degraded
    // to all-pairs
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("temperature mix (q27) gates with a narrow filter, rates ride a broadcast") {
    val plan = formatted(SparkEntry.queries("q27_temperature_mix")(spark, sf))
    // the per-stratum rate frame is tiny and must broadcast — a
    // shuffled join would re-shuffle the corpus just to attach one int
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("stratified quota (q28) partial-aggregates; no per-stratum window sort") {
    val plan = formatted(SparkEntry.queries("q28_stratified_quota")(spark, sf))
    // the bounded top-k Aggregator must keep its partition-local
    // combine (≤ k rows per partition per stratum reach the shuffle);
    // a Window here would sort whole strata through single reducers
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("corpus prep (p01) scans the corpus a bounded number of times") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    // count rows read from FILES (stages containing a FileScanRDD)
    // across EVERY job p01 triggers — the checkpoint materializations
    // and the final collect. Without the localCheckpoint pins on the
    // dedup/decontamination frontiers, each downstream consumer
    // re-evaluates the whole upstream lineage and this count blows up
    // to ≥4× the corpus (the sf0.1 3×-stage-sum regression).
    val fileRecords = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (ev.stageInfo.rddInfos.exists(_.name.contains("FileScanRDD")))
          fileRecords.addAndGet(ev.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    // the listener bus is async: drain it deterministically with
    // waitUntilEmpty (private[spark], hence reflection) — BEFORE
    // attaching, so a previous test's straggler stages can't leak into
    // the counter, and AFTER the collect, so every p01 stage is
    // counted. Falls back to a quiet-window poll if the method moves.
    def drainBus(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethods.find(_.getName.endsWith("listenerBus"))
        .get.invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .get.invoke(bus)
    } catch {
      case _: Throwable =>
        var prev = -1L; var stable = 0
        while (stable < 10) {
          val cur = fileRecords.get
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
          Thread.sleep(100)
        }
    }
    drainBus()
    spark.sparkContext.addSparkListener(listener)
    val total = try {
      SparkEntry.queries("p01_corpus_prep")(spark, sf).collect()
      drainBus()
      fileRecords.get
    } finally spark.sparkContext.removeSparkListener(listener)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    // expected file reads: quality gate ×2 inside the one dedup job
    // (agg + survivor join-back) + the eval-set probe ×1 — everything
    // downstream reads the checkpointed frontiers, never the files
    assert(total <= 3 * n + 16,
      s"corpus scanned too often: $total file-rows read for n=$n")
  }

  test("corpus shuffle (q29) has no global window; rank rides the two-phase scan") {
    val df = SparkEntry.queries("q29_corpus_shuffle")(spark, sf)
    val plan = formatted(df)
    // a row_number() over an un-partitioned window would sort the whole
    // corpus through one reducer — the plan the operator exists to avoid
    assert(!plan.contains("Window"), plan)
  }

  test("shuffled pack (p02) composes both two-phase scans without a window") {
    // shuffle assigns positions, packing prefix-sums over them — BOTH
    // global orderings must ride the two-phase scan; any Window node
    // means one of them regressed to a single-reducer sort
    val plan = formatted(SparkEntry.queries("p02_shuffled_pack")(spark, sf))
    assert(!plan.contains("Window"), plan)
  }

  test("quantized ANN (s06) partial-aggregates both top-k stages; no window") {
    val plan = formatted(SparkEntry.queries("s06_knn_quantized")(spark, sf))
    // shortlist cut and final re-rank both run the bounded Aggregator
    // (map-side combine); the scalar quantization scale rides a 1-row
    // broadcast — no corpus re-shuffle, no window sorts
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("recall contract (s05) keeps the exact top-k partial-aggregated") {
    val plan = formatted(SparkEntry.queries("s05_ann_recall")(spark, sf))
    // ground truth + both indexes all run the bounded top-k Aggregator;
    // partial_ proves the per-partition combine is still in the plan
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("budget pack (p03) chains three two-phase scans without a window") {
    // token budget, shuffle position and pack prefix are all global
    // orderings — any Window node means one regressed to a
    // single-reducer sort (q30's per-stratum window trap included)
    val plan = formatted(SparkEntry.queries("p03_budget_pack")(spark, sf))
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("span redaction (d16) broadcasts both the eval universe and the hit sets") {
    val plan = formatted(SparkEntry.queries("d16_span_redaction")(spark, sf))
    // two broadcast joins (eval n-grams onto positional spans, hit
    // position sets back onto the corpus); the corpus is never
    // shuffled by doc — the only exchange is the per-doc hit agg
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("heavy hitters (q31) partial-aggregates the sketch") {
    val plan = formatted(SparkEntry.queries("q31_heavy_hitters")(spark, sf))
    // the MG buffer combines map-side: at most k entries per partition
    // cross the exchange, not one per distinct key
    assert(plan.contains("partial_"), plan)
    // the 1-row corpus count rides a broadcast, never a cartesian
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dataset split (q32) is a narrow projection - no exchange at all") {
    val df = SparkEntry.queries("q32_dataset_split")(spark, sf)
    // drop the presentation orderBy: the OPERATOR is split assignment
    val op = Tables(spark, sf, "documents").select("doc_id")
    val plan = formatted(graft.operators.Sampling.datasetSplit(
      op, org.apache.spark.sql.functions.col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.2), "s"))
    assert(!plan.contains("Exchange"), plan)
    assert(df.columns.contains("split"))
  }

  test("bigram LM (t12) partial-aggregates both passes; no window") {
    val plan = formatted(SparkEntry.queries("t12_bigram_lm")(spark, sf))
    // model pass (bigram counts) and score pass (per-doc sum) both
    // map-side combine; the per-term micro-prob keeps the sum integral
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("span removal (d19) is pure shuffle-on-key: no cartesian, no window") {
    val plan = formatted(SparkEntry.queries("d19_span_removal")(spark, sf))
    // canonical pick (count + min-struct) partial-aggregates on tile
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("maximal-span removal (d20) keys every edge: partitioned window, no cartesian") {
    val plan = formatted(SparkEntry.queries("d20_maximal_spans")(spark, sf))
    // tile frequency and the span keep-one pick partial-aggregate
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // the run grouping is the only window shape, and every printed
    // instance (the runs subtree feeds two consumers, so it appears in
    // several branches over a reused exchange) is doc_id-PARTITIONED —
    // bounded by doc length, never a global single-reducer sort
    val specs = "windowspecdefinition\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(specs == Set("doc_id"),
      s"unexpected window partitioning $specs:\n$plan")
  }

  test("LM partition (t13) partial-aggregates both model passes; the scalar rides a broadcast") {
    val plan = formatted(SparkEntry.queries("t13_lm_partition")(spark, sf))
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("partial_sum"), plan)
    // the corpus-mean scalar joins back as a broadcast 1-row NLJ — the
    // intended plan for a scalar cross join; a shuffled cartesian or a
    // window would be the scale killers here
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("CMS (q34) partial-aggregates the sketch; estimates ride a broadcast") {
    val plan = formatted(SparkEntry.queries("q34_cms_frequency")(spark, sf))
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("CDC apply (q36) collapses the log without a window; snapshot side un-exchanged") {
    val plan = formatted(SparkEntry.queries("q36_cdc_apply")(spark, sf))
    // latest-per-key via max_by partial-aggregates; the snapshot is
    // gated by a broadcast anti-join (no snapshot shuffle)
    assert(plan.contains("partial_max_by"), plan)
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("epoch mix (q35) is narrow: explode + gate, no exchange before the sort") {
    val df = SparkEntry.queries("q35_epoch_mix")(spark, sf)
    val plan = formatted(df)
    // the only exchange is the presentation orderBy's range partition
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
