package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Warehouse-deployment shape SCALE.md promises for fact-fact joins:
  * tables bucketed on the join key join with ZERO shuffle — each task
  * reads matching bucket files from both sides. On the single-file
  * test fixtures this needs a real (scratch) warehouse write, which is
  * why it lives in a spec rather than the query inventory. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed co-located fact-fact join plans with zero Exchange") {
    import spark.implicits._
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1") // force the shuffle-join path
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("q"), first($"o_totalprice").as("p"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the whole point: bucket-aligned sides need no repartitioning,
      // and the aggregate reuses the same clustering — no shuffle at all
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")

      // and it computes the right thing
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .count() == expected)
    } finally {
      spark.conf.set(bcast, prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
