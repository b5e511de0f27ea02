package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data mixtures.
  *
  * `df.sample()` / `rand()` are nondeterministic under task retry and
  * AQE re-planning: a retried partition draws different rows, so two
  * runs of the same pipeline ship different datasets — unacceptable
  * for a training corpus that must be auditable. The gate here is a
  * pure function of the row key: keep iff the first 16 bits of
  * md5(key:salt) fall under floor(fraction·2¹⁶). Deterministic across
  * retries, partitionings and engines (md5 hex is identical
  * everywhere — DuckDB replays the gate verbatim, so sampled outputs
  * hash-check exactly). Changing `salt` redraws the sample;
  * correlated sampling across tables (same salt+key → same decision)
  * is how you keep joined pairs together.
  *
  * Rates are approximate per stratum (binomial over the hash buckets)
  * with error ~1/√(n·p) — at 100 TB row counts the realized rate is
  * the requested rate to many decimals.
  */
object Sampling {

  /** Lexicographic hex compare == numeric compare for fixed-width
    * lowercase hex, so the gate stays a codegen'd string comparison. */
  private def hexThreshold(fraction: Double): String =
    f"${math.max(0, math.min(65536, math.round(fraction * 65536))).toInt}%04x"

  /** Keep-predicate for one fraction. */
  def keep(key: Column, fraction: Double, salt: String): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4) <
      lit(hexThreshold(fraction))

  /** SQL twin of [[keep]] (DuckDB + Spark dialects agree on every
    * function used). */
  def sqlKeep(keyExpr: String, fraction: Double, salt: String): String =
    if (fraction >= 1.0) "TRUE"
    else if (fraction <= 0.0) "FALSE"
    else s"substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 4) < '${hexThreshold(fraction)}'"

  /** Deterministic train/val/test split: a TOTAL partition of the
    * input (every row lands in exactly one split — sampling's gate
    * decides keep-or-drop, a split decides WHERE), assigned by which
    * band of the 16-bit md5 prefix the row's key falls in. The
    * cumulative thresholds make the bands disjoint and exhaustive by
    * construction, so the invariant needs no runtime check; a row's
    * split never changes under retries, repartitioning, or corpus
    * growth (new rows land somewhere, old rows never move — the
    * property that keeps a held-out set held out across corpus
    * versions). One narrow `CASE` column — no shuffle, no state.
    * Fractions must sum to ≤ 1; any remainder falls to the LAST
    * split (the conventional catch-all). */
  def datasetSplit(df: DataFrame, key: Column,
      fractions: Seq[(String, Double)], salt: String): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1: $fractions")
    val h = substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4)
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cases = fractions.init.zip(cum.init).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), c)) =>
        acc.when(h < lit(hexThreshold(c)), name)
    }
    df.withColumn("split", cases.otherwise(fractions.last._1))
  }

  /** SQL twin of [[datasetSplit]] (appends the `split` projection). */
  def sqlDatasetSplit(keyExpr: String, fractions: Seq[(String, Double)],
      salt: String): String = {
    val h = s"substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 4)"
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val whens = fractions.init.zip(cum.init).map { case ((name, _), c) =>
      s"WHEN $h < '${hexThreshold(c)}' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${fractions.last._1}' END"
  }

  /** Mixture sampling: per-stratum keep fractions (e.g. language →
    * mixture weight). Rows in strata missing from `fractions` are
    * dropped. One narrow filter — no shuffle, no state. */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
      fractions: Seq[(String, Double)], salt: String): DataFrame = {
    val pred = fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      acc || (stratum === lit(s) && keep(key, f, salt))
    }
    df.filter(pred)
  }

  /** Temperature-rebalanced mixture (the multilingual-corpus sampler:
    * stratum s keeps rate (c_min/c_s)^α with α = 1/2, so the rarest
    * stratum keeps everything and big strata are downsampled TOWARD —
    * not all the way to — balance). Rates are DATA-DEPENDENT: one tiny
    * per-stratum count pass (broadcast back), then the same pure
    * md5-of-key gate as [[mixtureSample]] — a narrow filter, stable
    * under retries/AQE. α = 1/2 specifically because IEEE sqrt and
    * division are correctly rounded, so both engines compute the same
    * 16-bit threshold floor(√(c_min/c_s)·2¹⁶) bit-for-bit (pow(x, α)
    * for general α is libm-dependent and would not hash-check).
    * Threshold 2¹⁶ (rate 1.0) short-circuits: `hex()` of it would be 5
    * chars and lpad-to-4 would TRUNCATE to '1000', silently dropping
    * 15/16 of the rarest stratum. */
  def temperatureRebalance(df: DataFrame, key: Column, stratum: Column,
      salt: String): DataFrame = {
    // internal names prefixed so they can't collide with caller columns
    val counts = df.groupBy(stratum.as("_tr_strat")).agg(count(lit(1)).as("c"))
    val cmin = counts.agg(min(col("c")).as("cmin"))
    val rates = counts.crossJoin(broadcast(cmin))
      .withColumn("_tr_thr",
        floor(sqrt(col("cmin").cast("double") / col("c").cast("double"))
          * 65536).cast("int"))
      .select(col("_tr_strat"), col("_tr_thr"))
    df.join(broadcast(rates), stratum === col("_tr_strat"))
      .filter(col("_tr_thr") === 65536 ||
        substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4) <
          lower(lpad(hex(col("_tr_thr")), 4, "0")))
      .drop("_tr_strat", "_tr_thr")
  }

  /** Exact per-stratum quotas: the first `k` rows of each stratum in
    * md5-hash order — a deterministic uniform draw with a HARD quota
    * (rate-based sampling like [[mixtureSample]]/[[temperatureRebalance]]
    * only hits quotas in expectation; balanced eval subsets need
    * exactly k). Ordering key = first 13 hex chars of md5(key:salt):
    * 52 bits, exactly representable in double, so the in-engine
    * numeric compare and the oracle's fixed-width-hex string compare
    * induce the SAME order; ties (52-bit birthday at ~10⁸ rows per
    * stratum) break by id in both. Runs on the bounded top-k
    * Aggregator — each partition keeps ≤ k candidates per stratum and
    * the shuffle moves ≤ k·strata rows, not the corpus (the
    * `row_number().over(partitionBy(stratum))` window would sort every
    * stratum through one reducer each). Output: (qid=stratum, vec_id=
    * key, rank, cos) from [[Similarity.topKPerQuery]]; callers rename. */
  def stratifiedQuota(df: DataFrame, key: Column, stratum: Column,
      k: Int, salt: String): DataFrame = {
    val scored = df.select(stratum.as("qid"), key.cast("long").as("vec_id"),
      negate(conv(substring(md5(concat(key.cast("string"), lit(":" + salt))),
        1, 13), 16, 10).cast("double")).as("cos"))
    Similarity.topKPerQuery(scored, k)
  }

  /** Deterministic corpus shuffle: every row gets its 0-based position
    * in md5(key:salt) order — the reproducible global permutation a
    * training pipeline applies before sequence packing. Data order is
    * a hyperparameter: a retried/re-run job must ship the SAME order,
    * which `orderBy(rand())` cannot promise; changing `salt` redraws
    * the permutation.
    *
    * The global rank is the same scale trap as t11's prefix sum — a
    * `row_number()` over one un-partitioned window moves the corpus
    * through ONE reducer. Same cure (Packing's two-phase scan): range
    * partition by the hash, per-partition row counts (P numbers) to
    * the driver, exclusive scan there, then one narrow mapPartitions
    * adding base + local index. [[Frontier.pin]] pins the sampled
    * range boundaries across the two jobs. Ordering key = the 52-bit
    * md5 prefix ([[stratifiedQuota]]'s trick: numeric order == the
    * oracle's fixed-width-hex order), ties broken by `key` in BOTH
    * the range partitioner and the within-partition sort, so the
    * position is a pure function of the input set.
    *
    * PRECONDITION: `key` must be unique per row (a doc/row id, as
    * q29/p02 use). The tie-break (hash, key) is total only then; rows
    * sharing a key value compare equal in both the range partitioner
    * and the within-partition sort, so THEIR relative positions would
    * be partition-dependent and the purity promise above would not
    * hold for them. (Extending the tie-break over every remaining
    * column would only push the same caveat to fully-duplicate rows —
    * callers with non-unique keys should shuffle on a synthesized
    * unique key instead.) */
  def deterministicShuffle(df: DataFrame, key: Column, salt: String,
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts else spark.sparkContext.defaultParallelism
    val hashed = df.withColumn("_sh_h",
      conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 13),
        16, 10).cast("long"))
    val parted = Frontier.pin(hashed
      .repartitionByRange(p, col("_sh_h"), key)
      .sortWithinPartitions(col("_sh_h"), key)
      .withColumn("_sh_pid", spark_partition_id()))
      // pin range boundaries across the two jobs (Frontier durability)
    val counts = parted.groupBy(col("_sh_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive scan over P per-partition counts (driver: O(P))
    val bases = (0 until p).scanLeft(0L)((acc, i) =>
      acc + counts.getOrElse(i, 0L)).toArray
    val schema = parted.schema
      .add("shuffle_pos", org.apache.spark.sql.types.LongType)
    val bc = spark.sparkContext.broadcast(bases)
    val pidIdx = parted.schema.fieldIndex("_sh_pid")
    parted.mapPartitions { it =>
      var run = -1L // initialized from the first row's pid
      it.map { r =>
        if (run < 0) run = bc.value(r.getInt(pidIdx))
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
        run += 1
        out
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .drop("_sh_h", "_sh_pid")
  }

  /** Token-BUDGET sampling: per stratum (domain/language/source), keep
    * documents in deterministic md5(key:salt) order until the
    * stratum's cumulative token count reaches `budget` — the mixture
    * primitive a trainer actually specifies ("200 B tokens of web, 50 B
    * of code"): rate-based sampling ([[mixtureSample]]) hits a TOKEN
    * target only in expectation and only if mean doc length is known;
    * this hits it exactly (to within one document), reproducibly.
    *
    * The per-stratum cumulative sum is the same scale trap as t11's
    * global prefix sum, with a twist: `sum() OVER (PARTITION BY
    * stratum ORDER BY hash)` distributes across strata but still
    * sorts EACH stratum through one reducer — and a trainer's strata
    * are few and huge (5 domains × 20 B tokens), which is exactly the
    * worst case. Same cure as t11/q29, generalized: range-partition by
    * (stratum, hash, key) so each partition owns a contiguous slice of
    * one-or-more strata, per-(partition, stratum) subtotals to the
    * driver (a few entries per partition — contiguity bounds the
    * overlap), exclusive per-stratum scan there, one narrow
    * mapPartitions adding bases while running the local per-stratum
    * sum and gating on `budget`. [[Frontier.pin]] pins the range
    * boundaries across the two jobs.
    *
    * Keep rule is INCLUSIVE prefix: a doc survives iff its stratum's
    * cumulative tokens INCLUDING it stay ≤ budget (greedy prefix in
    * hash order — deterministic, partitioning-invariant, and the same
    * set DuckDB's windowed twin selects). `key` must be unique per row
    * (see [[deterministicShuffle]]'s precondition — same tie-break
    * contract). Output: (doc_id, stratum, n_tokens, cum_tokens).
    *
    * `carryover` seeds each stratum's running total — the nightly-
    * ingest continuation (StreamingNightlyIngest): night N+1's scan
    * resumes exactly where night N's left off, so the concatenated
    * nightly keeps equal ONE scan over the concatenated batches in
    * arrival order. Bounded driver state (one entry per stratum). */
  def tokenBudgetSample(df: DataFrame, key: Column, stratum: Column,
      tokens: Column, budget: Long, salt: String,
      numParts: Int = 0, carryover: Map[String, Long] = Map.empty): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (numParts > 0) numParts else spark.sparkContext.defaultParallelism
    val base = df.select(key.cast("long").as("_tb_id"),
      stratum.cast("string").as("_tb_s"),
      tokens.cast("long").as("_tb_n"),
      conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 13),
        16, 10).cast("long").as("_tb_h"))
    val parted = Frontier.pin(base
      .repartitionByRange(p, col("_tb_s"), col("_tb_h"), col("_tb_id"))
      .sortWithinPartitions(col("_tb_s"), col("_tb_h"), col("_tb_id"))
      .withColumn("_tb_pid", spark_partition_id())
      .as[(Long, String, Long, Long, Int)])
    val subtotals = parted.groupBy(col("_tb_pid"), col("_tb_s"))
      .agg(sum(col("_tb_n")).as("t"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    // exclusive per-stratum scan over the (partition, stratum)
    // subtotals in partition order — driver work is O(entries), and
    // contiguity keeps entries ≈ P + strata, not P × strata
    val running = scala.collection.mutable.Map.empty[String, Long] ++= carryover
    val bases = subtotals.sortBy(_._1._1).map { case ((pid, s), t) =>
      val b = running.getOrElse(s, 0L)
      running(s) = b + t
      (pid, s) -> b
    }.toMap
    val bc = spark.sparkContext.broadcast(bases)
    parted.mapPartitions { it =>
      var curS: String = null
      var run = 0L
      it.flatMap { case (id, s, n, h, pid) =>
        if (s != curS) { curS = s; run = bc.value.getOrElse((pid, s), 0L) }
        run += n
        if (run <= budget) Some((id, s, n, run)) else None
      }
    }.toDF("doc_id", "stratum", "n_tokens", "cum_tokens")
  }

  /** DuckDB twin of [[tokenBudgetSample]] over table `t`. The window
    * spelling is CORRECT here (and the in-engine plan deliberately
    * avoids it): (h, key) is tie-free, so the default RANGE frame has
    * no peers and equals ROWS. Caller appends ORDER BY. */
  def sqlTokenBudgetSample(t: String, keyExpr: String, stratumExpr: String,
      tokensExpr: String, budget: Long, salt: String): String =
    s"""WITH tb AS (SELECT $keyExpr AS doc_id, $stratumExpr AS stratum,
        CAST($tokensExpr AS BIGINT) AS n_tokens,
        substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 13) AS h
      FROM $t),
      c AS (SELECT doc_id, stratum, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY stratum
          ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
      FROM tb)
      SELECT doc_id, stratum, n_tokens, cum_tokens FROM c
      WHERE cum_tokens <= $budget"""

  /** DuckDB twin of [[temperatureRebalance]] over table `t`:
    * SELECTs `cols` of the kept rows (caller appends ORDER BY). */
  def sqlTemperatureRebalance(t: String, keyExpr: String, stratumCol: String,
      salt: String, cols: String): String =
    s"""WITH cnt AS (SELECT $stratumCol, count(*) AS c FROM $t GROUP BY $stratumCol),
       m AS (SELECT min(c) AS cmin FROM cnt),
       r AS (SELECT $stratumCol,
           CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE)) * 65536)
             AS INT) AS thr
         FROM cnt, m)
       SELECT $cols FROM $t JOIN r USING ($stratumCol)
       WHERE thr = 65536 OR
         substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 4) <
           lower(lpad(hex(thr), 4, '0'))"""

  /** Epoch-weighted OVERsampling: stratum s with weight w_s emits
    * ⌊w_s⌋ full copies of every row plus one extra copy kept at rate
    * w_s − ⌊w_s⌋ by the md5 gate — the "2.4 epochs of Wikipedia"
    * mixture spec trainers actually write down. The rest of the
    * sampling family only goes DOWN (q22/q27 rates ≤ 1, q28 quotas,
    * q30 budgets); this is the up direction, with the same purity
    * contract: copy multiset is a pure function of (key, stratum,
    * weights, salt), so retries, repartitions and reruns ship
    * identical epochs, and the fractional copy is consistent with
    * [[keep]]'s sampled subsets. Strata absent from `weights` drop
    * (weight 0). Plan: one narrow CASE + bounded explode — fan-out
    * = weight, no shuffle, no state; compose [[deterministicShuffle]]
    * on (key, copy_idx) downstream to interleave the copies. */
  def epochMix(df: DataFrame, key: Column, stratum: Column,
      weights: Seq[(String, Double)], salt: String): DataFrame = {
    require(weights.forall(_._2 >= 0), s"negative epoch weight: $weights")
    val copies = weights.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, w)) =>
        val nf = math.floor(w).toInt
        acc.when(stratum === lit(s),
          lit(nf) + when(keep(key, w - nf, salt), 1).otherwise(0))
    }.otherwise(lit(0))
    df.withColumn("copies", copies)
      .filter(col("copies") > 0)
      .withColumn("copy_idx", explode(expr("sequence(0, copies - 1)")))
      .drop("copies")
  }

  /** SQL twin of [[epochMix]]: the copies CASE over `stratumExpr`.
    * Wrap in `unnest(range(0, copies))` for the copy index. */
  def sqlEpochMixCopies(keyExpr: String, stratumExpr: String,
      weights: Seq[(String, Double)], salt: String): String = {
    val whens = weights.map { case (s, w) =>
      val nf = math.floor(w).toInt
      s"WHEN $stratumExpr = '$s' THEN $nf + " +
        s"(CASE WHEN ${sqlKeep(keyExpr, w - nf, salt)} THEN 1 ELSE 0 END)"
    }.mkString(" ")
    s"CASE $whens ELSE 0 END"
  }

  // ---- WEIGHTED sampling without replacement (A-ES) -----------------
  /** Per-stratum weighted top-k sample — Efraimidis–Spirakis A-ES made
    * deterministic: each row draws u = md5-uniform(key:salt) ∈ [0,1)
    * and ranks by u^(1/w); the k largest keys per stratum are the
    * sample, which is EXACTLY k draws without replacement with
    * inclusion odds ∝ w (the A-ES theorem). The training-data use is
    * quality-WEIGHTED corpus selection (q38): "sample 40 docs per
    * language, preferring high quality" — a gradient, where
    * [[mixtureSample]]'s keep/drop gate is a cliff.
    *
    * Determinism pieces, all chosen for cross-engine hash-exactness:
    * the 13-hex md5 prefix is 52 bits, so `u = intval / 2^52` is an
    * EXACT double in both engines; the A-ES key is integer-scaled
    * (`floor(u^(1/w)·10^6)`) so a last-ulp `pow` divergence between
    * libm implementations cannot flip an ordering (quantization ties
    * break by id, identically everywhere).
    *
    * Scale shape: the per-stratum top-k runs as the bounded
    * [[Similarity.TopKAgg]] Aggregator — map-side combined, ≤ k rows
    * per (partition, stratum) reach the exchange — NEVER a
    * `row_number` window sorting each huge stratum through one
    * reducer (the same trap [[tokenBudgetSample]] documents).
    * Output: (stratum, doc_id, rank, skey). */
  def weightedSample(df: DataFrame, key: Column, stratum: Column,
      weight: Column, k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // Runtime guard mirroring the k > 0 check: w = 0 would give
    // 1/w = Inf and a negative w inverts the A-ES ordering — both
    // silently degenerate samples, so fail loudly per row instead.
    val w = when(weight > lit(0.0), weight).otherwise(raise_error(concat(
      lit("weightedSample: weight must be > 0, got "),
      coalesce(weight.cast("string"), lit("null")))))
    val u = conv(substring(
        md5(concat(key.cast("string"), lit(":" + salt))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52: division is exact
    val skey = floor(pow(u, lit(1.0) / w) * lit(1000000.0))
    val scored = df.select(stratum.cast("string").as("qid"),
      key.cast("long").as("vec_id"), skey.cast("double").as("cos"))
    val topk = udaf(new Similarity.TopKAgg(k))
    scored.groupBy("qid").agg(topk(col("vec_id"), col("cos")).as("t"))
      .select(col("qid").as("stratum"), explode(col("t")).as("x"))
      .select(col("stratum"), col("x.vec_id").as("doc_id"),
        col("x.rank").as("rank"), col("x.cos").cast("long").as("skey"))
  }

  /** DuckDB twin of [[weightedSample]] as a full query over `table`:
    * same exact md5-uniform, same integer-scaled A-ES key, rank via a
    * window (fine in the oracle — DuckDB runs single-node anyway). */
  def sqlWeightedSample(table: String, keyExpr: String, stratumExpr: String,
      weightExpr: String, k: Int, salt: String): String =
    s"""WITH wsrc AS (SELECT $keyExpr AS doc_id, $stratumExpr AS stratum,
          $weightExpr AS wt FROM $table),
       wu AS (SELECT doc_id, stratum, wt,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u FROM wsrc),
       wsk AS (SELECT doc_id, stratum,
          CAST(floor(pow(u, 1.0 / wt) * 1000000.0) AS BIGINT) AS skey FROM wu),
       wr AS (SELECT stratum, doc_id, skey, CAST(row_number() OVER (
           PARTITION BY stratum ORDER BY skey DESC, doc_id) AS INT) AS rank
         FROM wsk)
       SELECT stratum, doc_id, rank, skey FROM wr WHERE rank <= $k"""
}
