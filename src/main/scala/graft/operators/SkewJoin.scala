package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting (SURVEY.md §2.6 / the
  * 100 TB playbook: "salting for skew").
  *
  * A plain shuffle join hashes every row of a hot key to ONE reducer; at
  * 100 TB one viral key (a bot author, an empty-string text, a default
  * timestamp) turns a 1000-executor join into a single straggler task.
  * AQE's runtime skew handling (`spark.sql.adaptive.skewJoin`) splits
  * oversized sort-merge partitions after a stage materializes; salting
  * instead declares the spread in the plan, works for any join strategy,
  * and composes with downstream aggregations.
  *
  * Shape: the fact side gets a uniform salt in [0, salt); the smaller
  * side is replicated `salt` ways (a bounded ×salt blow-up of the SMALL
  * input — the knob that trades replication for parallelism). The join
  * key becomes (key, salt), so a hot key's rows land on `salt` reducers.
  * Output rows are identical to `left.join(right, key)`: each left row
  * carries exactly one salt value and each right row exists once per
  * salt value, so every matching (l, r) pair joins exactly once.
  */
object SkewJoin {

  /** Inner equi-join on `key`, hot-key-resilient. `right` is replicated
    * `salt` ways — so this variant is ONLY for a dimension-sized (or at
    * least broadcast-adjacent) right side; for fact-fact joins use
    * [[hotKeySaltedJoin]], which replicates hot-key rows only. Result
    * set is exactly `left.join(right, Seq(key))` in any row order. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    // uniform, data-independent salt: monotonically_increasing_id is
    // unique per row (partition id in the high bits), xxhash64 scatters
    // it so consecutive rows of one hot key fan out across reducers
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until salt).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Fact-fact-safe salted join: detect the hot keys first, then salt /
    * replicate ONLY their rows. The ×salt blow-up is bounded by
    * `maxHotKeys × salt` right rows instead of ×salt of the whole
    * table — the shape that survives a right side that doesn't fit in
    * memory.
    *
    * Hot-key detection is a frequency aggregate over a sample of the
    * left (the probe side, where skew hurts): `sampleFraction = 1.0`
    * computes exact counts (cheap at bench scale); at 100 TB drop it to
    * ~1e-3 and scale `hotThreshold` down to match — detection only has
    * to catch keys big enough to straggle, and those survive any
    * sample. The hot set stays DISTRIBUTED end-to-end: a ≤`maxHotKeys`-
    * row frame, `localCheckpoint`ed once and broadcast — no driver
    * collect, no giant `isin` literal.
    *
    * Each input is scanned exactly ONCE (pinned in SkewBandJoinSpec):
    * a broadcast left-outer join tags every row with a `_hot` flag, and
    * the salt is conditional on it — hot left rows scatter across
    * `salt` reducers, cold left rows take salt 0; hot right rows
    * replicate `salt` ways, cold right rows keep a single replica
    * (salt 0). One equi-join on (key, salt) then serves both
    * populations — no semi/anti re-scans of the facts, no union, and
    * only ONE shuffle join in the plan.
    *
    * Result set is exactly `left.join(right, Seq(key))` in any row
    * order: each left row carries exactly one salt value, and each
    * right row exists exactly once per salt value its key can produce
    * on the left (all of [0, salt) for hot keys, {0} for cold keys),
    * so every matching (l, r) pair joins exactly once. */
  def hotKeySaltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16, hotThreshold: Long = 1000L,
      sampleFraction: Double = 1.0, maxHotKeys: Int = 10000): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val probe =
      if (sampleFraction >= 1.0) left
      else left.sample(withReplacement = false, sampleFraction, seed = 42L)
    val hotKeys = probe.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotThreshold)
      .orderBy(col("_n").desc, col(key))
      .limit(maxHotKeys)
      .select(col(key), lit(true).as("_hot"))
      .localCheckpoint() // materialize once; broadcast into both flag joins
    // `_hot` is null (not false) for cold rows — when() treats both as
    // "not hot", so the otherwise-branch salt applies
    val saltedLeft = left.join(broadcast(hotKeys), Seq(key), "left")
      .withColumn("_salt", when(col("_hot"),
          pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
        .otherwise(lit(0L)))
      .drop("_hot")
    val saltedRight = right.join(broadcast(hotKeys), Seq(key), "left")
      .withColumn("_salt", explode(when(col("_hot"),
          array((0 until salt).map(s => lit(s.toLong)): _*))
        .otherwise(array(lit(0L)))))
      .drop("_hot")
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
