package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-job wall-clock timeline for one registered query, to
  * localize where a multi-stage lifecycle query spends its time. Each
  * Spark job is attributed to its call site ("count at Dedup.scala:123")
  * and the summary aggregates by site. Not part of the driver contract.
  * Usage: JobProfile <sfDir> <name> [reps] [k=v conf...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    // isolated scratch warehouse + tmpdir: profiling a lifecycle query
    // must never touch the same physical tables/shard dirs a concurrent
    // Verify/Bench of that query owns (observed: a concurrent profile
    // of p10 corrupted the sweep's p10 tables)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-jobprofile").toString
    sys.props("java.io.tmpdir") = scratch
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[jobprofile] conf $k=$v")
    }

    case class Job(id: Int, site: String, start: Long, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId, s.description)
          case _ => ()
        }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val p = Option(e.properties)
        val site = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
            .flatMap(id => Option(execDesc.get(id.toLong))))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, site, e.time))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        // attribute the stage to the most recent overlapping job window
        val jid = order.toArray(Array.empty[Integer]).reverseIterator
          .map(i => jobs.get(i.intValue))
          .find(j => j != null && j.start <= si.submissionTime.getOrElse(0L) &&
            (j.end == 0L || si.completionTime.getOrElse(Long.MaxValue) <= j.end + 5))
        jid.foreach { j => j.stages += 1; j.tasks += si.numTasks }
      }
    }

    (1 to reps).foreach { r =>
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // let listener drain
      spark.sparkContext.removeSparkListener(listener)
      val js = order.toArray(Array.empty[Integer]).map(i => jobs.get(i.intValue))
        .filter(_ != null).toSeq
      println(f"[jobprofile] rep $r $name build=${(t1 - t0) / 1e9}%.2fs " +
        f"exec=${(t2 - t1) / 1e9}%.2fs jobs=${js.size}")
      if (r == reps) {
        println("[jobprofile] --- timeline (jobs >= 50ms) ---")
        js.filter(j => j.end - j.start >= 50).foreach { j =>
          println(f"[jobprofile]  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.2fs stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}")
        }
        println("[jobprofile] --- aggregate by site ---")
        js.groupBy(_.site).toSeq
          .map { case (s, g) => (s, g.map(j => j.end - j.start).sum, g.size) }
          .sortBy(-_._2)
          .foreach { case (s, ms, n) =>
            println(f"[jobprofile]  ${ms / 1e3}%7.2fs n=$n%3d  $s")
          }
        val gaps = js.sliding(2).collect {
          case Seq(a, b) if b.start - a.end >= 100 => (a, b, b.start - a.end)
        }.toSeq
        if (gaps.nonEmpty) {
          println("[jobprofile] --- driver gaps >= 100ms (between jobs) ---")
          gaps.foreach { case (a, b, ms) =>
            println(f"[jobprofile]  ${ms / 1e3}%7.2fs between [${a.site}] and [${b.site}]")
          }
          println(f"[jobprofile]  total gap ${gaps.map(_._3).sum / 1e3}%.2fs")
        }
      }
    }
    spark.stop()
  }
}
