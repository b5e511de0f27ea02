package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print scale-killer indicators of registered queries'
  * physical plans (exchange count, cartesian products, unpartitioned
  * Window nodes, broadcast fallbacks). Not part of the driver
  * contract. Usage: PlanAudit <sfDir> [qname...] (no names → all). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      val ex = p.linesIterator.count(_.contains("Exchange"))
      println(f"$n%-28s exchanges=$ex%-3d" +
        s" cartesian=${p.contains("CartesianProduct")}" +
        s" window=${p.contains("Window ")}" +
        s" bnlj=${p.contains("BroadcastNestedLoop")}")
    }
    spark.stop()
  }
}
