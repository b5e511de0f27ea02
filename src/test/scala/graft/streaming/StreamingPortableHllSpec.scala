package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.PortableHll

/** HLL register merge is per-bucket MAX — associative, commutative,
  * IDEMPOTENT — so the banked-and-merged streaming sketch must equal
  * the one-shot sketch bit-identically under ANY batching AND under
  * at-least-once replay (a re-banked batch cannot move a max). Both
  * are asserted exactly, not as envelopes. */
case class HllEvent(key: Long)

class StreamingPortableHllSpec extends SparkSpec {

  test("3-batch stream: merged registers and estimate are bit-identical to one-shot; replay is a no-op") {
    import spark.implicits._
    val batches = Seq(
      (1L to 4000L) ++ (1L to 500L),       // internal dups too
      (3000L to 9000L),                    // overlaps batch 1
      (8000L to 12000L) ++ Seq.fill(100)(7L))

    dropTestTable("graft_shll_bank")
    val counts = scala.collection.mutable.Map[Long, Long]()
    val mem = MemoryStream[HllEvent](spark)
    val q = StreamingPortableHll.start(spark, mem.toDF(), col("key"),
        "graft_shll_bank", Some((id, n) => counts(id) = n))
    try {
      batches.foreach { b =>
        mem.addData(b.map(HllEvent(_)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(counts.size == 3)
    // bank bounded by batches·m rows, independent of stream rate
    assert(spark.table("graft_shll_bank").count() <= 3L * PortableHll.M)

    val whole = PortableHll.registers(batches.flatten.toDF("k"), "k")
    val merged = StreamingPortableHll.merged(spark, "graft_shll_bank")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty,
      "merged registers differ from the one-shot registers")
    val streamed = StreamingPortableHll
      .estimate(spark, "graft_shll_bank", "e").head().getLong(0)
    val oneShot = PortableHll.estimate(batches.flatten.toDF("k"), "k", "e")
      .head().getLong(0)
    assert(streamed == oneShot,
      s"streamed estimate $streamed != one-shot $oneShot")
    // and it estimates the true cardinality within the 3·rSD envelope
    val exact = batches.flatten.distinct.size.toLong
    assert(math.abs(streamed - exact) <=
      3 * (1.04 / math.sqrt(PortableHll.M)) * exact + 1,
      s"streamed $streamed vs exact $exact")

    // AT-LEAST-ONCE replay: re-bank batch 2's registers verbatim (a
    // crashed foreachBatch re-delivering) — max-merge is idempotent,
    // so nothing moves
    PortableHll.registers(batches(1).toDF("k"), "k")
      .withColumn("batch_id", lit(1L))
      .write.format("parquet").mode("append").saveAsTable("graft_shll_bank")
    val replayed = StreamingPortableHll
      .estimate(spark, "graft_shll_bank", "e").head().getLong(0)
    assert(replayed == streamed,
      "a replayed batch moved the estimate — max-merge not idempotent?")
  }
}
