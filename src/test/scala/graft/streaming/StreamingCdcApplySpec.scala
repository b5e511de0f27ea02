package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** Replaying a change log in micro-batches lands the snapshot exactly
  * where the one-shot apply does — the batching-invariance that makes
  * a foreachBatch CDC consumer correct. */
case class CdcChange(op: String, seq: Int, k: Long, name: String, bal: Double)

class StreamingCdcApplySpec extends SparkSpec {
  import spark.implicits._

  test("N micro-batches of changes equal the one-shot apply; deletes/inserts land") {
    val snap0 = (1L to 20L).map(i => (i, s"n$i", i * 10.0))
      .toDF("k", "name", "bal")
    // batch boundaries keep each key's changes in seq order; key 5 is
    // updated in batch 1 AND deleted in batch 3, key 30 inserted in
    // batch 2 then updated in batch 3 — the cross-batch interactions
    val batches = Seq(
      Seq(CdcChange("U", 1, 5L, "n5v1", 51.0),
        CdcChange("U", 1, 7L, "n7v1", 71.0),
        CdcChange("D", 1, 2L, null, 0.0)),
      Seq(CdcChange("I", 2, 30L, "n30", 300.0),
        CdcChange("U", 2, 7L, "n7v2", 72.0)),
      Seq(CdcChange("D", 3, 5L, null, 0.0),
        CdcChange("U", 3, 30L, "n30v2", 301.0)))

    dropTestTable("graft_scdc_snap")
    snap0.write.format("parquet").saveAsTable("graft_scdc_snap")

    val counts = scala.collection.mutable.Map[Long, Long]()
    val mem = MemoryStream[CdcChange](spark)
    val q = StreamingCdcApply.start(spark, mem.toDF(), "graft_scdc_snap",
        Seq("k")) { (id, n) => counts(id) = n }
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(counts.size == 3)

    val streamed = spark.table("graft_scdc_snap")
    val oneShot = Cdc.applyChanges(snap0,
      batches.flatten.toDF(), Seq("k"))
    assert(streamed.except(oneShot).isEmpty &&
      oneShot.except(streamed).isEmpty,
      "streamed snapshot diverged from one-shot apply")

    val byKey = streamed.orderBy("k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(!byKey.contains(2L) && !byKey.contains(5L)) // deletes landed
    assert(byKey(30L) == ("n30v2", 301.0))             // insert then update
    assert(byKey(7L) == ("n7v2", 72.0))                // cross-batch update
    assert(byKey(1L) == ("n1", 10.0))                  // untouched
  }
}
