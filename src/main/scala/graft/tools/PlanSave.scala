package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named queries to files
  * (plans/<tag>/<name>_<tag>.txt) — the optimization-round evidence
  * artifacts. Runs each query body (lifecycle side effects included)
  * in an ISOLATED warehouse/tmpdir so a concurrent Verify/Bench of the
  * same query is never trampled.
  * Usage: PlanSave <sfDir> <outDir> <suffix> <name...>
  */
object PlanSave {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-plansave").toString
    sys.props("java.io.tmpdir") = scratch
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        formatted.getBytes("UTF-8"))
      System.err.println(s"[plansave] wrote $outDir/${name}_$suffix.txt " +
        s"(${formatted.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
