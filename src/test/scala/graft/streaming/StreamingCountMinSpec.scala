package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CountMin

/** CMS merge is elementwise add, so the banked-and-summed streaming
  * sketch must equal the one-shot sketch of the whole stream EXACTLY —
  * batching-invariance as bit-identity, not an envelope. */
case class CMEvent(key: String)

class StreamingCountMinSpec extends SparkSpec {

  test("3-batch stream: merged sketch is bit-identical to the one-shot sketch") {
    import spark.implicits._
    val (d, w) = (4, 128)
    val batches = Seq(
      Seq.fill(200)("a") ++ (1 to 80).map(i => s"x$i"),
      Seq.fill(150)("b") ++ (81 to 160).map(i => s"x$i"),
      Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ (1 to 80).map(i => s"x$i"))

    dropTestTable("graft_scm_bank")
    val counts = scala.collection.mutable.Map[Long, Long]()
    val mem = MemoryStream[CMEvent](spark)
    val q = StreamingCountMin.start(spark, mem.toDF(), col("key"), d, w,
        "graft_scm_bank") { (id, n) => counts(id) = n }
    try {
      batches.foreach { b =>
        mem.addData(b.map(CMEvent(_)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(counts.size == 3)
    // bank is bounded by batches·d·w rows, independent of stream rate
    assert(spark.table("graft_scm_bank").count() <= 3L * d * w)

    val whole = CountMin.sketch(
      batches.flatten.toDF("k"), "k", d, w)
    val merged = StreamingCountMin.merged(spark, "graft_scm_bank")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)

    // estimates against the merged sketch keep the CMS guarantee vs
    // exact whole-stream counts
    val exact = batches.flatten.groupBy(identity)
      .map { case (k2, v) => k2 -> v.size.toLong }
    val est = CountMin.estimate(merged,
        exact.keys.toSeq.toDF("k"), "k", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k2, c) =>
      assert(est(k2) >= c, s"$k2 under-estimated: ${est(k2)} < $c")
    }
  }
}
