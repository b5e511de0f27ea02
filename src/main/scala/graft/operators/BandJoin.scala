package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (time-band) join: pairs of rows with equal key whose event
  * times lie within `band` of each other (the "find correlated events
  * within N minutes" query; the prompt's range-join operator family,
  * sibling of [[AsOfJoin]]).
  *
  * The naive formulation is an inequality join
  * (`a.key = b.key AND abs(a.ts − b.ts) <= band`): Spark executes the
  * time predicate as a post-filter on the full key-equi-join — fine for
  * sparse keys, quadratic for hot ones — and DuckDB/Trino behave the
  * same. The scale-safe plan used here buckets time into `band`-wide
  * bins: a row at time t can only band-match rows in bins
  * {bin(t)−1, bin(t), bin(t)+1}, so one side is exploded into those
  * three bins, the other keeps its single home bin, and the join becomes
  * a pure equi-join on (key, bin) followed by the exact |Δt| ≤ band
  * filter. Each candidate pair meets exactly once (the probe row's three
  * bins are distinct; the build row lives in one), so no dedup pass is
  * needed. Work scales with rows-per-(key, band-window), not
  * rows-per-key².
  */
object BandJoin {

  /** Self band-join of an events-shaped frame: all pairs
    * (id_a < id_b) with equal `key` and |Δts| ≤ bandSec. Emits
    * (key, id_a, id_b, gap_sec) where gap_sec = ts(id_b) − ts(id_a)
    * in seconds (negative when the higher id happened first). */
  def selfBandPairs(df: DataFrame, key: String, tsCol: String,
      idCol: String, bandSec: Long): DataFrame = {
    val bandUs = bandSec * 1000000L
    val base = df.select(col(key), col(idCol), unix_micros(col(tsCol)).as("us"))
    // `div` = integer (floor-for-positives) division; `/` on Columns is
    // double division and would lose bin identity to truncation rules
    val homeBin = expr(s"us div ${bandUs}L")
    val probe = base.select(col(key), col(idCol).as("id_a"), col("us").as("us_a"),
      explode(array(homeBin - 1, homeBin, homeBin + 1)).as("bin"))
    val build = base.select(col(key), col(idCol).as("id_b"), col("us").as("us_b"),
      homeBin.as("bin"))
    probe.join(build, Seq(key, "bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= bandUs)
      .select(col(key), col("id_a"), col("id_b"),
        ((col("us_b") - col("us_a")) / 1e6).as("gap_sec"))
  }
}
