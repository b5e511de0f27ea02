package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: split a query's wall-clock into plan-build vs execute,
  * repeated, to localize fixed overhead. Not part of the driver
  * contract. Usage: Probe <sfDir> <name> [reps] */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[probe] conf $k=$v")
    }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val plan = df.queryExecution.executedPlan // analysis + optimization + physical planning
      val t2 = System.nanoTime()
      if (r == 1) {
        def stats(tag: String, s: String): Unit =
          println(s"[probe] $tag chars=${s.length} replace=${"replace\\(".r.findAllIn(s).size} " +
            s"coalesce=${"coalesce\\(".r.findAllIn(s).size} CASE=${"CASE WHEN".r.findAllIn(s).size}")
        stats("analyzed ", df.queryExecution.analyzed.toString)
        stats("optimized", df.queryExecution.optimizedPlan.toString)
        stats("physical ", plan.toString)
        // which operators made it into a WholeStageCodegen stage (the
        // "*(n)" prefix) — a huge expression tree can silently bail to
        // interpreted evaluation and 10x a scan-side projection
        println("[probe] wscg-spans=" +
          "\\*\\(\\d+\\)".r.findAllIn(plan.toString).toSet.size)
        plan.toString.linesIterator
          .filter(l => l.contains("Project") || l.contains("Generate"))
          .take(8).foreach(l => println("[probe] op " + l.take(120)))
        df.queryExecution.optimizedPlan.foreach { n =>
          val s = n.expressions.map(_.toString).mkString(";")
          println(s"[probe] node ${n.nodeName} exprChars=${s.length} " +
            s"replace=${"replace\\(".r.findAllIn(s).size}")
        }
      }
      df.count()
      val t3 = System.nanoTime()
      println(f"[probe] $name rep$r build=${(t1 - t0) / 1e9}%.2fs plan=${(t2 - t1) / 1e9}%.2fs exec=${(t3 - t2) / 1e9}%.2fs")
      if (r == 1) {
        // AFTER execution the AQE plan is final: "*(n)" marks operators
        // inside a WholeStageCodegen stage — a huge expression tree can
        // silently bail to interpreted eval and 10x a projection
        val fin = df.queryExecution.executedPlan.toString
        println("[probe] wscg-final-spans=" +
          "\\*\\(\\d+\\)".r.findAllIn(fin).toSet.size)
        fin.linesIterator.filter(_.contains("Project"))
          .take(6).foreach(l => println("[probe] fin " + l.take(100)))
      }
    }
    spark.stop()
  }
}
