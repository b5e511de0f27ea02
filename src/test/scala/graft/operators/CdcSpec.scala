package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  test("latest change per key wins; earlier changes are invisible") {
    val ch = Seq(
      ("U", 1, 1L, "a1", 11.0),
      ("U", 3, 1L, "a3", 13.0),
      ("U", 2, 1L, "a2", 12.0)).toDF("op", "seq", "k", "name", "bal")
    val out = Cdc.applyChanges(snap, ch, Seq("k")).orderBy("k").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "a3" && out(0).getDouble(2) == 13.0)
    assert(out(1).getString(1) == "b") // untouched rows pass through
  }

  test("delete wins over same-batch insert; insert creates; delete removes") {
    val ch = Seq(
      ("I", 1, 9L, "new", 1.0),  // insert-then-delete: must vanish
      ("D", 2, 9L, null, 0.0),
      ("I", 1, 8L, "kept", 2.0), // plain insert
      ("D", 1, 2L, null, 0.0)    // delete an existing key
    ).toDF("op", "seq", "k", "name", "bal")
    val out = Cdc.applyChanges(snap, ch, Seq("k")).orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 8L))
    assert(out(2).getString(1) == "kept")
  }

  test("empty change batch is identity; applying twice equals once (upsert idempotence)") {
    val empty = Seq.empty[(String, Int, Long, String, Double)]
      .toDF("op", "seq", "k", "name", "bal")
    val once = Cdc.applyChanges(snap, empty, Seq("k"))
    assert(once.except(snap).isEmpty && snap.except(once).isEmpty)
    val ch = Seq(("U", 1, 1L, "a1", 11.0), ("I", 1, 7L, "n", 7.0))
      .toDF("op", "seq", "k", "name", "bal")
    val one = Cdc.applyChanges(snap, ch, Seq("k"))
    val two = Cdc.applyChanges(one, ch, Seq("k"))
    assert(one.except(two).isEmpty && two.except(one).isEmpty)
  }

  test("snapshot side of the anti-join carries no exchange (broadcast gate)") {
    val ch = Seq(("U", 1, 1L, "a1", 11.0)).toDF("op", "seq", "k", "name", "bal")
    val plan = Cdc.applyChanges(snap, ch, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast anti-join:\n$plan")
  }
}
