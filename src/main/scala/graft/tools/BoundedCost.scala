package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LexIndex

/** Dev-only: the MaxScore bytes-read A/B (r16 — the r15 verdict's
  * "measured bytes-read reduction" bar for bounded scoring).
  *
  * Fixture = the production skew the optimization exists for: a HEAVY
  * term sits in 60% of every copy's docs (df-cap survivor, low idf —
  * the "just under the cap" list that grows ×M), while the RARE
  * discriminative terms live ONLY in the base copy (their lists — and
  * therefore θ, the essential set, and the candidates — stay constant
  * as the corpus grows). The full probe must read the heavy list end
  * to end at every M; the bounded probe derives candidacy from the
  * constant rare lists and completes candidates via the In(doc_id)
  * pushdown over the (tok, doc_id)-sorted runs, so its bytes should
  * stay near-flat while the full probe's grow ∝ M.
  *
  * Protocol: ONE M per JVM (the Scale100 rule). Bytes = the Spark
  * task-level inputMetrics sum across the probe's jobs (reps run
  * twice, min taken, first rep discarded for footer warmup). Results
  * feed SCALE.md's r16 table.
  *
  * Usage: BoundedCost <M> [baseDocs=4000]
  */
object BoundedCost {
  def main(args: Array[String]): Unit = {
    val m = args(0).toInt
    val baseDocs = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // row groups are the pruning granularity: a 100 TB posting list
      // spans thousands of 128 MB row groups naturally; the fixture
      // emulates that regime at bench scale with small groups, so the
      // In(doc_id) range pushdown has blocks to skip
      .config("spark.hadoop.parquet.block.size", (256 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.lex.pushdownMinBytes", "0")

    // base copy: heavy in 60% of docs, rare terms rare (df = base/50),
    // every doc padded with per-doc filler so posting bytes are honest
    def copyDocs(k: Int) = {
      val ids = spark.range(baseDocs.toLong)
        .select((col("id") + k.toLong * 100000000L).as("doc_id"),
          col("id").as("i"))
      val rare =
        if (k == 0) concat(lit("rare"), (col("i") % 50).cast("string"),
          lit(" "))
        else lit("")
      ids.select(col("doc_id"), concat(
        when(col("i") % 5 < 3, lit("heavy ")).otherwise(lit("")),
        rare,
        lit("filler"), col("i").cast("string"),
        lit(" pad alpha beta gamma delta epsilon zeta eta theta"))
        .as("text"))
    }
    val docs = (0 until m).map(copyDocs).reduce(_ unionByName _)
    val name = s"graft_bcost_m$m"
    val t0 = System.nanoTime()
    LexIndex.writeLexIndex(docs, name, numBuckets = 8)
    println(f"[bcost] m=$m%-4d build ${(System.nanoTime() - t0) / 1e9}%8.2fs")

    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    import spark.implicits._
    val queries = Seq((900000000L, "heavy rare7 rare13 rare21"))
      .toDF("doc_id", "text").localCheckpoint()

    def measure(tag: String, run: () => Long): Unit =
      (1 to 2).foreach { rep =>
        bytes.set(0L)
        val t1 = System.nanoTime()
        val n = run()
        val dt = (System.nanoTime() - t1) / 1e9
        // listener events drain asynchronously — settle before reading
        // (listenerBus is private; a short sleep is enough for a
        // dev-only measurement tool)
        Thread.sleep(1500)
        println(f"[bcost] m=$m%-4d $tag%-9s rep$rep rows=$n%-4d " +
          f"bytes=${bytes.get()}%12d  ${dt}%7.2fs")
      }
    // losslessness asserted ON the measured fixture, not assumed
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val eq = rows(LexIndex.probeLexIndex(spark, name, queries, 10)) ==
      rows(LexIndex.probeLexIndexMaxScore(spark, name, queries, 10))
    require(eq, "bounded probe diverged from the full probe")
    println(s"[bcost] m=$m equality: ok")
    measure("full", () =>
      LexIndex.probeLexIndex(spark, name, queries, kEach = 10).count())
    measure("bounded", () =>
      LexIndex.probeLexIndexMaxScore(spark, name, queries, kEach = 10)
        .count())
    LexIndex.lastBoundedStats.foreach { case (s2, e, t2, c) =>
      println(s"[bcost] m=$m bounded stats: surviving=$s2 essentialPairs=$e" +
        s" totalPairs=$t2 candidates=$c")
    }
    spark.stop()
  }
}
