package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** The fleet-wide scale-killer gate: EVERY registered query's physical
  * plan is walked structurally and rejected if it contains
  *
  *  - a CartesianProduct (a non-broadcast nested-loop join — the one
  *    join shape with no 100 TB story; 1-row cross joins must say
  *    `broadcast(...)` and plan as BroadcastNestedLoopJoin), or
  *  - an UNPARTITIONED Window (empty partitionSpec = every row through
  *    one reducer; the two-phase distributed-scan pattern or a keyed
  *    partitionBy is always available instead).
  *
  * This makes the per-round PlanAudit sweep a permanent regression
  * test: a refactor that silently degrades one of the ~113 plans fails
  * here, not in the next round's verdict. Plans are built non-
  * adaptively so the walk sees the real join/window operators rather
  * than AQE's lazy wrapper. */
class PlanGateSpec extends SparkSpec {

  test("no registered query plans a cartesian product or an unpartitioned window") {
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled")
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.registry.sortBy(_.name).foreach { q =>
        val plan =
          try q.run(spark, sf).queryExecution.executedPlan
          catch { case e: Throwable =>
            bad += s"${q.name}: failed to plan: ${e.getMessage}"
            null
          }
        def walk(p: SparkPlan): Unit = {
          p match {
            case _: CartesianProductExec =>
              bad += s"${q.name}: CartesianProduct in plan"
            case w: WindowExec if w.partitionSpec.isEmpty =>
              bad += s"${q.name}: unpartitioned Window in plan"
            case _ => ()
          }
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
        }
        if (plan != null) walk(plan)
      }
    } finally conf.set("spark.sql.adaptive.enabled", aqe0)
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
