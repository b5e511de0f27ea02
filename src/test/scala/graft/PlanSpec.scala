package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BandJoin

/** Physical-plan discipline checks (the 100 TB contract, SCALE.md):
  * filters and projections must reach the parquet scan, top-k must not
  * global-sort, aggregates must partial-combine, and the band join must
  * stay an equi-join — these are the properties that survive a 1000×
  * scale-up, asserted on the plans themselves so a refactor can't
  * silently regress them. */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), scan)
    // pruned scan: only the 2 referenced columns in ReadSchema
    assert(scan.contains("l_orderkey") && scan.contains("l_quantity"), scan)
    assert(!scan.contains("l_extendedprice"), s"unpruned scan:\n$scan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val q06 = SparkEntry.queries("q06_topk_customers")(spark, sf)
    assert(formatted(q06).contains("TakeOrderedAndProject"), formatted(q06))
  }

  test("exact dedup partial-aggregates before its single exchange") {
    val d01 = SparkEntry.queries("d01_exact_dedup")(spark, sf)
    val plan = formatted(d01)
    val firstAgg = plan.indexOf("partial_")
    assert(firstAgg >= 0, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("band join is an equi-join: no cartesian/broadcast-NLJ anywhere") {
    val df = BandJoin.selfBandPairs(Tables(spark, sf, "events"),
      "user_id", "ts", "event_id", 600L)
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
