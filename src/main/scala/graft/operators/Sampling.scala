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
}
