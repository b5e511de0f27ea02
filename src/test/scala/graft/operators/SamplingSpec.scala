package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The properties that make hash-gate sampling the 100 TB choice:
  * decisions are a pure function of (key, salt) — invariant under
  * repartitioning (and hence task retry/AQE re-plans), redrawn by
  * salt — and realized rates concentrate around the requested
  * fraction. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20000L
  private def keys = spark.range(n).select(col("id"))

  test("sample is invariant under repartitioning (retry-stable)") {
    val a = keys.filter(Sampling.keep(col("id"), 0.3, "s1"))
      .collect().map(_.getLong(0)).toSet
    val b = keys.repartition(13).filter(Sampling.keep(col("id"), 0.3, "s1"))
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("realized rate concentrates around the fraction") {
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val got = keys.filter(Sampling.keep(col("id"), f, "s2")).count()
      val sd = math.sqrt(n * f * (1 - f))
      assert(math.abs(got - n * f) <= 5 * sd + 1, s"f=$f got=$got")
    }
  }

  test("different salts redraw; same salt correlates across frames") {
    val s1 = keys.filter(Sampling.keep(col("id"), 0.5, "a"))
      .collect().map(_.getLong(0)).toSet
    val s2 = keys.filter(Sampling.keep(col("id"), 0.5, "b"))
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
    // overlap of two independent 50% draws ~ 25%, far from 50%
    val overlap = (s1 & s2).size.toDouble / n
    assert(overlap > 0.2 && overlap < 0.3, s"overlap=$overlap")
    // correlated sampling: an unrelated frame with the same keys+salt
    // makes identical decisions (how joined tables stay aligned)
    val other = spark.range(n).select(col("id"))
      .filter(Sampling.keep(col("id"), 0.5, "a"))
      .collect().map(_.getLong(0)).toSet
    assert(other == s1)
  }

  test("fraction edges: 0 keeps nothing, 1 keeps everything") {
    assert(keys.filter(Sampling.keep(col("id"), 0.0, "x")).count() == 0)
    assert(keys.filter(Sampling.keep(col("id"), 1.0, "x")).count() == n)
  }

  test("dataset split: total partition, stable under corpus growth") {
    val docs = Tables(spark, sf, "documents").select("doc_id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Sampling.datasetSplit(docs, col("doc_id"), fr, "s1")
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // total: every row assigned, only the declared labels appear
    assert(byDoc.size == docs.count())
    assert(byDoc.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly honored fractions (binomial tolerance on 500 docs)
    val train = byDoc.values.count(_ == "train").toDouble / byDoc.size
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    // growth stability: computing on any subset never moves a row —
    // the held-out set stays held out as the corpus grows
    val sub = Sampling.datasetSplit(docs.filter(col("doc_id") < 100),
        col("doc_id"), fr, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, sp) => assert(byDoc(id) == sp) }
    // remainder falls to the last split: fractions summing under 1
    val rem = Sampling.datasetSplit(docs, col("doc_id"),
        Seq("a" -> 0.5, "b" -> 0.2), "s1")
      .collect().map(_.getString(1))
    assert(rem.count(_ == "b").toDouble / rem.length > 0.4) // 0.2 + 0.3 rest
    intercept[IllegalArgumentException] {
      Sampling.datasetSplit(docs, col("doc_id"),
        Seq("a" -> 0.9, "b" -> 0.2), "s1")
    }
  }

  test("epochMix: per-row copy counts, gate consistency, partitioning invariance") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 3).cast("string").as("st"))
    val w = Seq("0" -> 2.0, "1" -> 1.4, "2" -> 0.3)
    val out = Sampling.epochMix(df, col("id"), col("st"), w, "es1")
    val per = out.groupBy("id", "st").agg(count(lit(1)).as("c"),
      max("copy_idx").as("mx"), min("copy_idx").as("mn"))
    // copy_idx is a dense 0..c-1 range per row
    assert(per.filter(col("mn") =!= 0 || col("mx") =!= col("c") - 1)
      .count() == 0)
    // stratum 0: every row exactly twice; 1: 1 or 2; 2: only gated rows
    assert(per.filter(col("st") === "0" && col("c") =!= 2).count() == 0)
    assert(per.filter(col("st") === "1" && (col("c") < 1 || col("c") > 2))
      .count() == 0)
    assert(per.filter(col("st") === "2" && col("c") =!= 1).count() == 0)
    // fractional copies agree with keep()'s subset (same salt)
    val extra = per.filter(col("st") === "1" && col("c") === 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val gated = df.filter(col("st") === "1" &&
        Sampling.keep(col("id"), 0.4, "es1"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(extra == gated)
    // realized fractional rates are in a plausible band
    val n2 = per.filter(col("st") === "2").count().toDouble / (1000 / 3)
    assert(n2 > 0.2 && n2 < 0.4, s"st2 rate $n2")
    // pure function of content: identical multiset under repartition
    val b = Sampling.epochMix(df.repartition(17), col("id"), col("st"),
      w, "es1")
    assert(out.unionAll(b).groupBy("id", "st", "copy_idx")
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count() == 0)
  }

  test("temperature rebalance: rarest stratum kept whole, rates ≈ √(c_min/c_s)") {
    // skewed strata: 16000 'big', 3000 'mid', 1000 'rare'
    val df = spark.range(n).select(col("id"),
      when(col("id") < 16000, "big")
        .when(col("id") < 19000, "mid").otherwise("rare").as("strat"))
    val kept = Sampling.temperatureRebalance(df, col("id"), col("strat"), "t1")
      .groupBy("strat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 1000L, s"rate-1.0 stratum must keep all rows: $kept")
    for ((s, c) <- Seq("big" -> 16000L, "mid" -> 3000L)) {
      val want = c * math.sqrt(1000.0 / c)
      val sd = math.sqrt(want * (1 - math.sqrt(1000.0 / c)))
      assert(math.abs(kept(s) - want) <= 5 * sd + 1, s"$s kept=${kept(s)} want≈$want")
    }
    // decisions are key-pure: repartitioning changes nothing
    val a = Sampling.temperatureRebalance(df, col("id"), col("strat"), "t1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureRebalance(df.repartition(13), col("id"), col("strat"), "t1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("deterministic shuffle: a permutation, window-equivalent, partitioning-invariant") {
    val df = spark.range(0, 3000).select(col("id"), (col("id") % 7).as("tag"))
    def run(d: org.apache.spark.sql.DataFrame, parts: Int) =
      Sampling.deterministicShuffle(d, col("id"), "sh1", parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = run(df, 8)
    // positions are exactly 0..n-1 (a permutation, no gaps/dups)
    assert(got.values.toSeq.sorted == (0L until 3000L), "not a permutation")
    // equals the single-reducer window formulation it replaces
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(substring(md5(concat(col("id").cast("string"), lit(":sh1"))), 1, 13),
        col("id"))
    val ref = df.withColumn("p", row_number().over(w) - 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(2).toLong)).toMap
    assert(got == ref)
    // pure function of the input set: partition count / input layout
    // can't move anything (retry/AQE stability)
    assert(run(df.repartition(13), 3) == got)
    // extra columns pass through untouched
    val cols = Sampling.deterministicShuffle(df, col("id"), "sh1").columns.toSeq
    assert(cols == Seq("id", "tag", "shuffle_pos"), cols.toString)
    // empty input → empty permutation (no div-by-zero, no lost schema)
    val empty = Sampling.deterministicShuffle(
      df.filter(col("id") < 0), col("id"), "sh1")
    assert(empty.count() == 0 && empty.columns.last == "shuffle_pos")
  }

  test("token budget: greedy prefix per stratum, window-equivalent, no Window node") {
    // few, huge strata — the trainer shape the per-stratum window
    // would serialize through one reducer each
    val df = spark.range(0, 5000).select(col("id"),
      (col("id") % 3).cast("string").as("dom"),
      (col("id") % 17 + 1).as("ntok"))
    val budget = 2000L
    def run(d: org.apache.spark.sql.DataFrame, parts: Int = 0) =
      Sampling.tokenBudgetSample(d, col("id"), col("dom"), col("ntok"),
          budget, "tb-test", parts)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    val got = run(df, 8)
    // equals the windowed formulation it replaces
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy(substring(md5(concat(col("id").cast("string"), lit(":tb-test"))),
        1, 13), col("id"))
    val ref = df.withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == ref)
    // greedy-prefix maximality: each stratum's kept sum is ≤ budget and
    // within one max-doc of it (the next-ranked doc would overflow)
    val perDom = got.groupBy(_._2).view.mapValues(_.toSeq.map(_._3).sum)
    perDom.foreach { case (dom, tot) =>
      assert(tot <= budget && tot > budget - 17, s"$dom kept $tot")
    }
    assert(perDom.keySet == Set("0", "1", "2"))
    // pure function of the input set: partitioning/layout can't move it
    assert(run(df.repartition(13), 3) == got)
    // the in-engine plan never sorts a stratum through one reducer
    val plan = Sampling.tokenBudgetSample(df, col("id"), col("dom"),
      col("ntok"), budget, "tb-test").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // budget edges: 0 keeps nothing; ∞ keeps everything with exact sums
    assert(run(df.limit(0), 2).isEmpty)
    assert(Sampling.tokenBudgetSample(df, col("id"), col("dom"), col("ntok"),
      0L, "tb-test").count() == 0)
    val all = Sampling.tokenBudgetSample(df, col("id"), col("dom"), col("ntok"),
      Long.MaxValue, "tb-test")
    assert(all.count() == 5000)
    assert(all.groupBy("stratum").agg(max("cum_tokens").as("m"))
      .collect().map(_.getLong(1)).sum ==
      df.agg(sum("ntok")).head().getLong(0))
  }

  test("token budget carryover: night N+1 resumes night N's scan exactly") {
    val df = spark.range(0, 4000).select(col("id"),
      (col("id") % 3).cast("string").as("dom"),
      (col("id") % 11 + 1).as("ntok"))
    val night1 = df.filter(col("id") < 300)
    val night2 = df.filter(col("id") >= 300)
    val budget = 1500L
    def keep(d: org.apache.spark.sql.DataFrame,
        base: Map[String, Long] = Map.empty) =
      Sampling.tokenBudgetSample(d, col("id"), col("dom"), col("ntok"),
          budget, "tb-co", carryover = base)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val k1 = keep(night1)
    // every night-1 row consumes budget, kept or not — the scan is one
    // monotone prefix over nights
    val used1 = night1.groupBy("dom").agg(sum("ntok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k2 = keep(night2, used1)
    // reference: ONE windowed scan over both nights in arrival order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy(col("night"),
        substring(md5(concat(col("id").cast("string"), lit(":tb-co"))), 1, 13),
        col("id"))
    val ref = night1.withColumn("night", lit(1))
      .unionByName(night2.withColumn("night", lit(2)))
      .withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert((k1 ++ k2) == ref,
      s"carryover diverged: ${(k1 ++ k2).size} vs ${ref.size}")
    // the fixture is non-degenerate: night 1 leaves headroom in some
    // stratum (night 2 admits someone) but not unlimited (someone drops)
    assert(k2.nonEmpty)
    assert(k2.size < night2.count())
  }

  test("weighted sample (A-ES): inclusion tracks weight, exact k, partitioning-invariant") {
    // two weight classes per stratum: w=6 vs w=0.5 — the heavy class
    // must dominate the sample far beyond its population share
    val df = spark.range(0, 4000).select(col("id"),
      (col("id") % 2).cast("string").as("st"),
      when(col("id") % 8 < 2, 6.0).otherwise(0.5).as("w"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, col("id"), col("st"), col("w"),
          k = 200, salt = "wsx")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val got = run(df)
    // exactly k per stratum, ranks dense 1..k
    got.groupBy(_._1).foreach { case (st, rows) =>
      assert(rows.length == 200, s"$st: ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1 to 200), s"$st ranks")
    }
    // heavy class = 25% of rows but must take well over half the
    // sample (w ratio 12:1); and the light class still appears (a
    // gradient, not a cliff)
    val heavy = got.count(_._2 % 8 < 2).toDouble / got.length
    assert(heavy > 0.6 && heavy < 1.0, s"heavy share $heavy")
    // deterministic pure function of the input set
    assert(run(df.repartition(13)).toSet == got.toSet)
    // no Window in the engine plan (bounded aggregator top-k)
    val plan = Sampling.weightedSample(df, col("id"), col("st"), col("w"),
      200, "wsx").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("stratified quota: exactly min(k, |stratum|) rows, window-equivalent, retry-stable") {
    val df = spark.range(n).select(col("id"),
      when(col("id") % 100 === 0, "rare").otherwise("common").as("strat"))
    def draw(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedQuota(d, col("id"), col("strat"), k = 50, "q1")
        .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(1))).toSet
    val got = draw(df)
    assert(got.count(_._1 == "common") == 50)
    assert(got.count(_._1 == "rare") == 50) // 200 candidates, quota binds
    // equals the window formulation (the plan it replaces)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("strat")
      .orderBy(substring(md5(concat(col("id").cast("string"), lit(":q1"))), 1, 13),
        col("id"))
    val ref = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 50)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    assert(got == ref)
    // decisions are key-pure: partitioning can't change the draw
    assert(draw(df.repartition(13)) == got)
    // a quota above the stratum size returns the whole stratum
    val small = Sampling.stratifiedQuota(
      df.filter(col("strat") === "rare"), col("id"), col("strat"), 1000, "q1")
    assert(small.count() == n / 100)
  }
}
