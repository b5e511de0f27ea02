package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * The salt is a DETERMINISTIC function of the row's own columns
  * (`xxhash64` over the HASHABLE ones, mod salt) — never
  * `monotonically_increasing_id()`/`rand()`, whose values depend on
  * partition layout and task attempt: a fetch-failure recompute of the
  * salted map stage would re-salt rows after some reducers already
  * consumed old output, dropping or duplicating hot-key pairs. A pure
  * row hash replays identically on retry and under AQE re-plans.
  * MapType columns (top-level or nested) are excluded from the hash:
  * Spark disallows hashing maps (their entry order is undefined, so a
  * "hash" would not even be a function of the value), and a left frame
  * carrying a map payload must still salt cleanly off its remaining
  * columns. (Fully identical duplicate rows — identical across every
  * hashable column — share a salt and land on one reducer; real fact
  * rows carry near-unique payloads, so the spread over hot keys is
  * unaffected in practice.)
  */
object SkewJoin {

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** xxhash64 accepts any type except maps (at any nesting depth). */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** Deterministic salt in [0, salt): pure hash of the row's hashable
    * content. The equi-join key is always in the hash — join keys are
    * comparable, hence hashable — so the set is never empty. */
  private def rowSalt(df: DataFrame, salt: Int): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    require(cols.nonEmpty, "no hashable columns to derive a salt from")
    pmod(xxhash64(cols.toSeq.map(col): _*), lit(salt.toLong))
  }

  /** Inner equi-join on `key`, hot-key-resilient. `right` is replicated
    * `salt` ways — so this variant is ONLY for a dimension-sized (or at
    * least broadcast-adjacent) right side; for fact-fact joins use
    * [[hotKeySaltedJoin]], which replicates hot-key rows only. Result
    * set is exactly `left.join(right, Seq(key))` in any row order. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val salted = left.withColumn("_salt", rowSalt(left, salt))
    val replicated = right.withColumn("_salt",
      explode(array((0 until salt).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** The hot-key set of `left` on `key`: keys whose (estimated) row
    * count reaches `hotThreshold`, as a ≤ `maxHotKeys`-row frame of
    * (key, _hot=true) — DISTRIBUTED end-to-end (no driver collect, no
    * giant `isin` literal), pinned once so both flag joins of
    * [[hotKeySaltedJoin]] broadcast the same draw.
    *
    * `hotThreshold` is in FULL-data row units. With
    * `sampleFraction < 1` detection runs over a deterministic sample
    * (seed 42) and the cut scales to `ceil(hotThreshold ·
    * sampleFraction)` (floor 1): a key big enough to straggle a
    * reducer — millions of rows at 100 TB — survives any practical
    * sampling rate (binomial concentration: at fraction f its sampled
    * count sits within a few percent of f·n), so the sampled pass
    * costs a fraction of the scan and still catches every genuine
    * straggler. Borderline keys may flip in or out of the hot set;
    * that only moves WHICH keys get spread — the join result is
    * salt-invariant either way. */
  private[graft] def detectHotKeys(left: DataFrame, key: String,
      hotThreshold: Long, sampleFraction: Double,
      maxHotKeys: Int): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val probe =
      if (sampleFraction >= 1.0) left
      else left.sample(withReplacement = false, sampleFraction, seed = 42L)
    val cut = math.max(1L, math.ceil(hotThreshold * sampleFraction).toLong)
    Frontier.pin(
      probe.groupBy(col(key)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= cut)
        .orderBy(col("_n").desc, col(key))
        .limit(maxHotKeys)
        .select(col(key), lit(true).as("_hot")))
  }

  /** Fact-fact-safe salted join: detect the hot keys first, then salt /
    * replicate ONLY their rows. The ×salt blow-up is bounded by
    * `maxHotKeys × salt` right rows instead of ×salt of the whole
    * table — the shape that survives a right side that doesn't fit in
    * memory.
    *
    * Hot-key detection is a frequency aggregate over a sample of the
    * left (the probe side, where skew hurts) — see [[detectHotKeys]]
    * for the sampling contract. At bench scale `sampleFraction = 1.0`
    * is affordable; at 100 TB drop it to ~1e-3 so detection reads a
    * fraction of the fact instead of paying a full scan+partial-agg
    * pass before the join starts.
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
    val hotKeys = detectHotKeys(left, key, hotThreshold, sampleFraction,
      maxHotKeys)
    // `_hot` is null (not false) for cold rows — when() treats both as
    // "not hot", so the otherwise-branch salt applies
    val saltedLeft = left.join(broadcast(hotKeys), Seq(key), "left")
      .withColumn("_salt", when(col("_hot"),
          rowSalt(left, salt))
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
