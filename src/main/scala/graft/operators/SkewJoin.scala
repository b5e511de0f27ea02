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
    * `salt` ways — keep it the smaller input (dimension-sized, or at
    * least shuffle-light). Result set is exactly
    * `left.join(right, Seq(key))` in any row order. */
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
}
