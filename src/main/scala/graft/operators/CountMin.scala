package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan '05) as a declarative
  * Spark plan — the frequency-ESTIMATE member of the sketch family
  * next to HLL (distinct count, q16/q26), Misra–Gries (frequent items,
  * q31), Bloom (membership, d18) and GK (quantiles, q33). Where
  * Misra–Gries UNDER-estimates and keeps only k survivors, CMS answers
  * a point frequency query for ANY key with a one-sided OVER-estimate:
  * est ≥ true always, and est ≤ true + εN with probability ≥ 1−δ for
  * ε = e/w, δ = e^−d.
  *
  * Representation: the d×w counter matrix as a (row, bucket, count)
  * DataFrame of at most d·w rows. Build = one partial-aggregated
  * shuffle keyed on (row, bucket) — map-side combine means each
  * partition contributes ≤ d·w rows to the exchange regardless of
  * corpus size, which is the whole point at 100 TB. Merging sketches
  * of two corpora is elementwise add (union + the same groupBy), so
  * the build is trivially incremental/streamable.
  *
  * Hash rows are md5-derived (first 8 hex chars of md5("i:key") mod w)
  * — not the classic pairwise-independent family, but deterministic
  * and bit-identical in Spark and DuckDB, which makes the ENTIRE
  * sketch and every estimate hash-exact cross-engine (q34): the rare
  * sketch whose correctness gate needs no probabilistic contract row.
  */
object CountMin {

  /** Row-`row` bucket of a stringified key: first 8 md5 hex chars
    * (a 32-bit value) mod w. */
  def bucket(key: Column, row: Column, w: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), key)), 1, 8),
      16, 10).cast("long") % w

  /** DuckDB twin of [[bucket]] — same hex, same bit pattern. */
  def sqlBucket(keyExpr: String, rowExpr: String, w: Int): String =
    s"CAST(('0x' || substr(md5(CAST($rowExpr AS VARCHAR) || ':' || " +
      s"$keyExpr), 1, 8))::UBIGINT % $w AS BIGINT)"

  /** d×w sketch of a key stream (every row of `keys` is one
    * occurrence): (ri, b, c) with ri ∈ [0,d), b ∈ [0,w). Missing
    * (ri, b) combinations mean count 0. */
  def sketch(keys: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    keys.select(col(keyCol).cast("string").as("k"))
      .select(explode(expr(s"sequence(0, ${d - 1})")).as("ri"), col("k"))
      .withColumn("b", bucket(col("k"), col("ri"), w))
      .groupBy("ri", "b").agg(count(lit(1)).as("c"))

  /** Point estimates for the distinct keys of `queries`: min over the
    * d rows of the key's bucket counters. The sketch is ≤ d·w rows, so
    * it rides a broadcast to wherever the query keys live. */
  def estimate(sk: DataFrame, queries: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame =
    queries.select(col(keyCol).cast("string").as("k")).distinct()
      .select(col("k"), explode(expr(s"sequence(0, ${d - 1})")).as("ri"))
      .withColumn("b", bucket(col("k"), col("ri"), w))
      .join(broadcast(sk), Seq("ri", "b"), "left")
      .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
