package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule must (a) fire on naive abs-band joins and remove
  * the nested-loop plan, (b) preserve exact join semantics including
  * band edges and negative values (floorDiv, not truncation), and
  * (c) wire up through SparkSessionExtensions as a cluster deploys it.
  * The shared test session runs with GraftExtensions active (SparkSpec)
  * — these tests exercise the injected rule itself; the negative test
  * turns it off via excludedRules. */
class BandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val leftRows = Seq((1L, -250L), (2L, -100L), (3L, 0L),
    (4L, 99L), (5L, 100L), (6L, 101L), (7L, 350L))
  private val rightRows = Seq((10L, -200L), (11L, 0L), (12L, 100L),
    (13L, 200L), (14L, 400L))

  private def expected(band: Long): Set[(Long, Long)] =
    (for {
      (i, x) <- leftRows; (j, y) <- rightRows
      if math.abs(x - y) <= band
    } yield (i, j)).toSet

  test("rewrites a pure band join to a binned equi-join with identical rows") {
    val l = leftRows.toDF("lid", "x")
    val r = rightRows.toDF("rid", "y")
    val joined = l.join(r, abs(col("x") - col("y")) <= 100L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin"), s"rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val got = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == expected(100L))
  }

  test("rewrites the BETWEEN spelling of the same band join") {
    val l = leftRows.toDF("lid", "x")
    val r = rightRows.toDF("rid", "y")
    val joined = l.join(r,
      col("x").between(col("y") - 100L, col("y") + 100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin"), s"rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == expected(100L))
  }

  test("asymmetric BETWEEN band keeps exact rows (bin = max bound)") {
    val l = leftRows.toDF("lid", "x")
    val r = rightRows.toDF("rid", "y")
    val joined = l.join(r,
      col("x").between(col("y") - 50L, col("y") + 100L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin"), s"rule did not fire:\n$plan")
    val naive = (for {
      (i, x) <- leftRows; (j, y) <- rightRows
      if x >= y - 50L && x <= y + 100L
    } yield (i, j)).toSet
    val got = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == naive)
  }

  test("with the rule excluded the same join is a nested-loop plan (the problem exists)") {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.BandJoinRewrite")
    try {
      val l = leftRows.toDF("lid", "x")
      val r = rightRows.toDF("rid", "y")
      val plan = l.join(r, abs(col("x") - col("y")) <= 100L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("graft_bin"), plan)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("extra equi-keys are kept as join keys alongside the bin") {
    val l = Seq((1L, 1L, 0L), (2L, 2L, 0L)).toDF("lid", "k", "x")
    val r = Seq((10L, 1L, 50L), (11L, 2L, 500L)).toDF("rid", "k2", "y")
    val joined = l.join(r, col("k") === col("k2") &&
      abs(col("x") - col("y")) <= 100L)
    val got = joined.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L))) // (2,11) matches k but not the band
  }

  test("GraftExtensions deploys the rule and cosine_sim on new sessions") {
    // `spark.sql.extensions` is a STATIC conf read at SparkContext
    // creation (Bench/Verify set it on their fresh contexts); the
    // suite's context already exists, so exercise the same injection
    // machinery via builder.withExtensions and prove the conf-string
    // class name resolves the way applyExtensions would.
    val byName = Class.forName("graft.plans.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(byName)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      // injected catalog function, no per-session register call
      val cos = s2.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
        .collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      // injected optimizer rule, active by default
      import s2.implicits._
      val l = leftRows.toDF("lid", "x")
      val r = rightRows.toDF("rid", "y")
      val joined = l.join(r, abs(col("x") - col("y")) <= 100L)
      assert(joined.queryExecution.executedPlan.toString.contains("graft_bin"))
      assert(joined.select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == expected(100L))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
