package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The two-phase distributed prefix sum must equal the textbook window
  * formulation (which it exists to replace at scale) on any input
  * partitioning, including empty partitions and zero-count rows. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("start_tok",
      coalesce(sum(col("n")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("id", "n", "start_tok")

  test("tokenOffsets == window prefix sum, on shuffled and skewed input") {
    val base = (0L until 1000L).map(i => (i, (i * 7919) % 23)) // varied counts
    for (df <- Seq(
        base.toDF("id", "n"),
        base.reverse.toDF("id", "n").repartition(17),
        base.toDF("id", "n").repartition(64))) { // more partitions than needed
      val got = Packing.tokenOffsets(df, "id", "n", numParts = 8)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = reference(df.select(col("id"), col("n").cast("long")))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == want)
    }
  }

  test("packPlan: zero-token docs occupy no space; straddlers span sequences") {
    val df = Seq((1L, 100L), (2L, 0L), (3L, 300L), (4L, 56L), (5L, 10L))
      .toDF("id", "n")
    val out = Packing.packPlan(df, "id", "n", budget = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out(1L) == (0L, 0L, 0L, 0))        // fits in seq 0
    assert(out(2L) == (100L, 0L, 0L, 100))    // empty doc: no tokens consumed
    assert(out(3L) == (100L, 0L, 1L, 100))    // 100..399 straddles seqs 0-1
    assert(out(4L) == (400L, 1L, 1L, 144))    // 400..455 inside seq 1
    assert(out(5L) == (456L, 1L, 1L, 200))
  }

  test("the packing plan has no single-partition exchange and no Window") {
    val counts = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    val plan = Packing.packPlan(counts, "doc_id", "n", budget = 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
