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

  // The large-range saturation MARKER (r12 ADVICE): the flag must be
  // false on every branch the hash-exact contract covers, true exactly
  // when the collision-correction branch runs — synthesized register
  // states drive all three branches without needing 1.4e8 rows.
  test("PortableHll large-range flag fires iff the collision branch runs") {
    import spark.implicits._
    // fixture-scale keys: linear-counting / raw branches → flag false
    val li = Tables(spark, sf, "lineitem")
    val real = PortableHll.estimateWithFlag(
      PortableHll.registers(li, "l_orderkey"), "e").head()
    assert(!real.getBoolean(1), "flag fired on a fixture-scale estimate")
    assert(real.getLong(0) ==
      PortableHll.estimate(li, "l_orderkey", "e").head().getLong(0),
      "estimateWithFlag diverged from estimate")
    // a saturated sketch: every register at the rank ceiling — the raw
    // estimate blows past 2^32/30, the branch runs, the flag says so
    val sat = (0 until PortableHll.M).map(b => (b, 21)).toDF("bucket", "m")
    val r = PortableHll.estimateWithFlag(sat, "e").head()
    assert(r.getBoolean(1), "flag silent on a saturated sketch")
    assert(r.getLong(0) > (1L << 32) / 30,
      s"saturated estimate not in the large range: ${r.getLong(0)}")
  }
}
