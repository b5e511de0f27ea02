package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data-layout discipline (SCALE.md): at 100 TB the cheapest scan is
  * the one that never happens. Two layout levers, each pinned to the
  * property it claims:
  *
  *  - range-partitioned + sorted parquet gives every file a disjoint
  *    min/max on the layout key, which is what lets the reader's
  *    row-group statistics pruning discard everything but the matching
  *    ranges once the predicate is pushed to the scan;
  *  - hive-style directory partitioning on a low-cardinality derived
  *    column makes partition pruning skip entire files at listing time
  *    (visible in the scan's numFiles metric).
  */
class LayoutSpec extends SparkSpec {

  test("repartitionByRange write yields disjoint per-file key ranges") {
    val out = Files.createTempDirectory("layout_range").toString
    Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 3, s"expected several range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: ${ranges.mkString(",")}")
      case _ =>
    }
    // the point predicate reaches the scan as a pushed filter — with
    // disjoint per-file/row-group stats that is what makes the reader
    // skip every non-matching range
    val probe = spark.read.parquet(out).filter(col("doc_id") === ranges.head._1)
    val leaves = probe.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(leaves.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,"), leaves)
  }

  test("hive-partitioned layout prunes whole files at listing time") {
    val out = Files.createTempDirectory("layout_hive").toString
    Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val all = spark.read.parquet(out)
    val allFiles = all.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).head
    all.collect()
    val one = spark.read.parquet(out).filter(col("lang") === "en")
    val oneFiles = one.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).head
    one.collect()
    assert(oneFiles.value > 0)
    assert(oneFiles.value < allFiles.value,
      s"partition pruning read ${oneFiles.value} of ${allFiles.value} files")
    // the partition filter is gone from the data filters: pruning
    // happened at listing, not per row
    val leaves = one.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(leaves.contains("PartitionFilters"), leaves)
  }
}
