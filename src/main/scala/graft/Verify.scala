package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet // optional query-name filter (dev use)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // static conf: default 100 entries evicts across the 59-query run
      // and pays Janino recompiles (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Watchdog per attempt: a query wedged by a host-starvation window
    // must not take down the whole correctness dump (everything after
    // it would read as missing). Cancel the job group on timeout and
    // retry once — the window has usually passed by then.
    val timeoutMs =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong * 1000L
    val watchdog = new java.util.Timer("verify-watchdog", true)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      var attempt = 0
      var done = false
      while (!done && attempt < 2) {
        attempt += 1
        val t0 = System.nanoTime()
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        val cancel = new java.util.TimerTask {
          def run(): Unit = spark.sparkContext.cancelJobGroup(name)
        }
        watchdog.schedule(cancel, timeoutMs)
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
          done = true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name attempt $attempt failed: ${e.getMessage}")
        } finally {
          cancel.cancel()
          spark.sparkContext.clearJobGroup()
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
