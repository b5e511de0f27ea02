package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q20's approximate companion: percentile_approx (Greenwald-Khanna
  * sketch — mergeable, single-pass, the 100 TB path where exact
  * `percentile` would buffer every value per group) must land within
  * its documented rank-error bound 1/accuracy of the exact quantile. */
class ApproxQuantileSpec extends SparkSpec {

  test("percentile_approx within rank-error bound of exact percentile") {
    val li = Tables(spark, sf, "lineitem").select(col("l_extendedprice"))
    val n = li.count()
    val accuracy = 100 // rank error ≤ n/accuracy positions
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val sorted = li.orderBy("l_extendedprice").collect().map(_.getDouble(0))
    val approx = li.select(percentile_approx(col("l_extendedprice"),
        array(ps.map(lit): _*), lit(accuracy))).head().getSeq[Double](0)
    ps.zip(approx).foreach { case (p, est) =>
      val rank = sorted.indexWhere(_ >= est) match {
        case -1 => sorted.length - 1
        case i => i
      }
      val targetRank = p * (n - 1)
      val bound = n.toDouble / accuracy + 1
      assert(math.abs(rank - targetRank) <= bound,
        s"p=$p est=$est rank=$rank target=$targetRank bound=$bound")
    }
  }
}
