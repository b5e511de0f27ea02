package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The whole-stream Misra–Gries guarantee through batched merging:
  * every key above n_total/k survives, every reported count is a
  * lower bound within n_total/k — regardless of how the stream was
  * cut into micro-batches (mergeable summaries). */
case class HHEvent(key: String)

class StreamingHeavyHittersSpec extends SparkSpec {

  test("3-batch stream: whole-stream heavy keys survive the merge, bounds hold") {
    import spark.implicits._
    // whole-stream: a=500, b=300, tail=400 singletons → n=1200, k=4
    // ⇒ heavy iff freq > 300: exactly {a}; b sits AT the boundary and
    // carries no guarantee either way. Batches slice it adversarially:
    // 'a' is absent from batch 2 entirely.
    val batches = Seq(
      Seq.fill(300)("a") ++ (1 to 100).map(i => s"t$i"),
      Seq.fill(200)("b") ++ (101 to 250).map(i => s"t$i"),
      Seq.fill(200)("a") ++ Seq.fill(100)("b") ++ (251 to 400).map(i => s"t$i"))
    val n = batches.map(_.size).sum

    dropTestTable("graft_shh_bank")
    val perBatch = scala.collection.mutable.Map[Long, Int]()
    val mem = MemoryStream[HHEvent](spark)
    val q = StreamingHeavyHitters.start(spark, mem.toDF(), col("key"), 4,
        "graft_shh_bank") { (sk, id) => perBatch(id) = sk.length }
    try {
      batches.foreach { b =>
        mem.addData(b.map(HHEvent(_)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // each batch banked ≤ k rows; the bank is the stream's only state
    assert(perBatch.size == 3 && perBatch.values.forall(_ <= 4))
    assert(spark.table("graft_shh_bank").count() <= 3 * 4)

    val exact = batches.flatten.groupBy(identity)
      .map { case (k2, v) => k2 -> v.size.toLong }
    val sk = StreamingHeavyHitters.merged(spark, "graft_shh_bank", 4)
      .map(e => e.key -> e.cnt).toMap
    assert(sk.size <= 4)
    assert(sk.contains("a"), s"whole-stream heavy key lost: $sk")
    sk.foreach { case (k2, c) =>
      assert(c <= exact(k2), s"$k2 over-counted: $c > ${exact(k2)}")
      assert(exact(k2) - c <= n / 4,
        s"$k2 under-counted past n/k: $c vs ${exact(k2)}")
    }
  }
}
