package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q16's HLL sketch accuracy (verdict item 8): Spark documents
  * approx_count_distinct's default max estimation error as 5% relative
  * standard deviation; assert the estimate lands within 3·rSD of the
  * exact count on the fixture, and that a tighter rSD parameter
  * tightens the bound. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 3 rSD of exact") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey")).as("d"),
        countDistinct(col("l_orderkey")).as("o")).head()
    val approxDefault = li.select(
      approx_count_distinct(col("l_partkey")).as("d"),
      approx_count_distinct(col("l_orderkey")).as("o")).head()
    val approxTight = li.select(
      approx_count_distinct(col("l_partkey"), 0.01).as("d"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("o")).head()
    def within(est: Long, truth: Long, rsd: Double): Boolean =
      math.abs(est - truth).toDouble <= 3 * rsd * truth + 1
    assert(within(approxDefault.getLong(0), exact.getLong(0), 0.05),
      s"parts: est=${approxDefault.getLong(0)} exact=${exact.getLong(0)}")
    assert(within(approxDefault.getLong(1), exact.getLong(1), 0.05),
      s"orders: est=${approxDefault.getLong(1)} exact=${exact.getLong(1)}")
    assert(within(approxTight.getLong(0), exact.getLong(0), 0.01))
    assert(within(approxTight.getLong(1), exact.getLong(1), 0.01))
  }

  // The PORTABLE md5 HLL (PortableHll, q16's estimator since r11):
  // theoretical rSD = 1.04/sqrt(4096) ≈ 1.6% — assert the 3·rSD
  // envelope vs exact, plus linear-counting exactness at tiny
  // cardinality (n ≪ m lands every key in its own register, and the
  // ln-based corrector recovers the count to within rounding).
  test("PortableHll within 3 rSD of exact; near-exact at tiny cardinality") {
    val li = Tables(spark, sf, "lineitem")
    def est(c: String): Long =
      PortableHll.estimate(li, c, "e").head().getLong(0)
    val exact = li.select(countDistinct(col("l_partkey")).as("d"),
        countDistinct(col("l_orderkey")).as("o")).head()
    val rsd = 1.04 / math.sqrt(PortableHll.M)
    def within(e: Long, truth: Long): Boolean =
      math.abs(e - truth).toDouble <= 3 * rsd * truth + 1
    assert(within(est("l_partkey"), exact.getLong(0)),
      s"parts: est=${est("l_partkey")} exact=${exact.getLong(0)}")
    assert(within(est("l_orderkey"), exact.getLong(1)),
      s"orders: est=${est("l_orderkey")} exact=${exact.getLong(1)}")
    val tiny = li.filter(col("l_orderkey") % 97 === 0)
    val tinyExact = tiny.select(countDistinct(col("l_orderkey"))).head()
      .getLong(0)
    val tinyEst = PortableHll.estimate(tiny, "l_orderkey", "e")
      .head().getLong(0)
    assert(math.abs(tinyEst - tinyExact) <= math.max(1L, tinyExact / 50),
      s"tiny: est=$tinyEst exact=$tinyExact")
  }
}
