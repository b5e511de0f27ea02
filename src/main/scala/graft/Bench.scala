package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A query that throws is
  * reported with time = -1 and listed under "errors" (never silently
  * folded into the total — round-1 ADVICE). SPARK_GRAFT_ONLY=<regex>
  * restricts the run for local iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the deployment wiring a cluster would use (fresh context here,
      // so the static conf applies): cosine_sim + BandJoinRewrite
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen-compiler + parquet-footer first-touch
    // costs land here, not on whichever query happens to run first
    // (round-1 d01 carried ~7s of session warmup). Steady-state per-query
    // time is what the throughput comparison against BASELINE.md means.
    try {
      import org.apache.spark.sql.functions._
      // same shapes the inventory leans on: parquet scan, string-heavy
      // projection (md5/regexp/replace), hash-agg shuffle, window sort
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(256)
      docs.select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"),
          (length(col("text")) - length(replace(col("text"), lit("e"), lit("")))).as("c"))
        .groupBy("fp").agg(min(col("c")), count(lit(1)))
        .count()
      docs.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1)).orderBy(col("doc_id"))))
        .count()
    } catch { case _: Throwable => () }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200))
      }
      // queries are independent: drop any cache an operator pinned
      // (e.g. dedup shingles) so later queries run against a clean
      // block manager instead of inheriting memory pressure
      spark.catalog.clearCache()
      (name, if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
