package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LexIndex

/** Dev-only: the ANCHOR-DOC bytes-read A/B for the positional probes
  * (r18 — the r17 verdict's ask #3 bar: "a bytes ladder showing the
  * common-term leg flattening on a rare-anchor fixture"). The phrase
  * probe reads every clause term's posting rows; with one COMMON term
  * in the phrase that leg grows ∝ corpus even though matches can only
  * live in the RAREST term's docs. The anchor pushdown
  * (LexIndex.anchorDocs) bounds the common leg by the rare term's doc
  * set, pushed as `In(doc_id)` into the (tok, doc_id)-sorted runs.
  *
  * Fixture: `common` sits in 60% of every copy's docs; `anchor` exists
  * ONLY in eight base-copy docs, immediately before `common` — so the
  * phrase "anchor common" matches exactly those eight docs at every M,
  * while the common term's posting list grows ∝ M. Anchored bytes
  * should stay ~flat (eight pushed doc ids, row-group pruning inside
  * the common term's sorted run); unanchored bytes grow ∝ M.
  *
  * Protocol: ONE M per JVM (the Scale100 rule). Bytes = task-level
  * inputMetrics sums (two reps, first discarded for footer warmup).
  * Results feed SCALE.md's r18 table.
  *
  * Usage: PhraseCost <M> [baseDocs=4000]
  */
object PhraseCost {
  def main(args: Array[String]): Unit = {
    val m = args(0).toInt
    val baseDocs = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // row groups are the pruning granularity (the BoundedCost note):
      // small groups emulate the thousands-of-row-groups regime a
      // 100 TB posting list has naturally
      .config("spark.hadoop.parquet.block.size", (256 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.lex.pushdownMinBytes", "0")

    def copyDocs(k: Int) = {
      val ids = spark.range(baseDocs.toLong)
        .select((col("id") + k.toLong * 100000000L).as("doc_id"),
          col("id").as("i"))
      val long = concat(
        when(col("i") % 5 < 3, lit("common ")).otherwise(lit("")),
        lit("filler"), col("i").cast("string"),
        lit(" pad alpha beta gamma delta epsilon zeta eta theta"))
      val text =
        if (k == 0) when(col("i") < 8,
            lit("anchor common marker run end")).otherwise(long)
        else long
      ids.select(col("doc_id"), text.as("text"))
    }
    val docs = (0 until m).map(copyDocs).reduce(_ unionByName _)
    val name = s"graft_phrcost_m$m"
    val t0 = System.nanoTime()
    LexIndex.writeLexIndex(docs, name, numBuckets = 8)
    println(f"[phrcost] m=$m%-4d build ${(System.nanoTime() - t0) / 1e9}%8.2fs")

    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    import spark.implicits._
    val phrases = Seq((0L, "anchor common"))
      .toDF("phrase_id", "phrase").localCheckpoint()

    def measure(tag: String, run: () => Long): Unit =
      (1 to 2).foreach { rep =>
        bytes.set(0L)
        val t1 = System.nanoTime()
        val n = run()
        val dt = (System.nanoTime() - t1) / 1e9
        Thread.sleep(1500) // listener drain (dev-only tool)
        println(f"[phrcost] m=$m%-4d $tag%-11s rep$rep rows=$n%-4d " +
          f"bytes=${bytes.get()}%12d  ${dt}%7.2fs")
      }
    // losslessness asserted ON the measured fixture, not assumed
    def rows() = LexIndex.probePhrase(spark, name, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val anchored = rows()
    val st = LexIndex.lastAnchorStats
    spark.conf.set(LexIndex.AnchorDocsMaxConf, "0")
    val unanchored = rows()
    spark.conf.unset(LexIndex.AnchorDocsMaxConf)
    require(anchored == unanchored,
      "anchored phrase probe diverged from the unanchored scan")
    require(anchored.length == 8, s"fixture broke: ${anchored.length}")
    println(s"[phrcost] m=$m equality: ok  anchorStats=$st")
    measure("anchored", () =>
      LexIndex.probePhrase(spark, name, phrases).count())
    spark.conf.set(LexIndex.AnchorDocsMaxConf, "0")
    measure("unanchored", () =>
      LexIndex.probePhrase(spark, name, phrases).count())
    spark.stop()
  }
}
