package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the executed plan of named queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
