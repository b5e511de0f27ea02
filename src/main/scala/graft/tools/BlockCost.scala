package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LexIndex

/** Dev-only: the BLOCK-MAX bytes-read A/B (r17 — the r16 verdict's
  * "essential-list bytes also flatten" bar for per-block impact
  * stamps). [[BoundedCost]]'s fixture proves the COMPLETION bytes win
  * (rare seed lists stay constant, the heavy term goes non-essential);
  * this fixture is the regime block-max exists for: the heavy term IS
  * the query — essential by definition — and without stamps its list
  * must be read end to end for candidacy at every M.
  *
  * Fixture: `bulk` sits in 60% of every copy's docs with tf = 1 in
  * long documents (low impact), except ten SHORT tf-4 docs that exist
  * only in the base copy at the lowest doc_ids — so in doc_id-ordered
  * blocks the top-impact block is constant while the list grows ∝ M.
  * The single-term query "bulk" makes the term its own seed and its
  * only essential list: θ comes from the first (spiky) block, and
  * every other block's upper bound (evaluated at tf = 1, long len)
  * sits far below θ — the bounded probe's candidacy reads ~1 block
  * regardless of M, while the full probe's bytes grow ∝ M.
  *
  * Protocol: ONE M per JVM (the Scale100 rule). Bytes = task-level
  * inputMetrics sums (two reps, first discarded for footer warmup).
  * Results feed SCALE.md's r17 table.
  *
  * `perTermMax` (3rd arg) sets [[LexIndex.ImpactsPerTermMaxConf]] —
  * the r17 ask #2 fixture: with a budget far below the hot term's
  * block count (e.g. 4 at M=100's ~120 blocks), skipping must STILL
  * fire through the virtual rest-stamp (top-B blocks individually,
  * the low-impact tail as one dominated hull) instead of tripping a
  * global cap into a full read.
  *
  * Usage: BlockCost <M> [baseDocs=4000] [perTermMax]
  */
object BlockCost {
  def main(args: Array[String]): Unit = {
    val m = args(0).toInt
    val baseDocs = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val perTermMax = args.drop(2).headOption.map(_.toInt)
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
    // ~2k-row stamped blocks: the base copy's bulk list is ~2.4k rows,
    // so the spiky block is one of 1-2 at M=1 and one of ~120 at M=100
    spark.conf.set(LexIndex.ImpactBlockRowsConf, "2048")
    perTermMax.foreach(b =>
      spark.conf.set(LexIndex.ImpactsPerTermMaxConf, b.toString))

    def copyDocs(k: Int) = {
      val ids = spark.range(baseDocs.toLong)
        .select((col("id") + k.toLong * 100000000L).as("doc_id"),
          col("id").as("i"))
      val long = concat(
        when(col("i") % 5 < 3, lit("bulk ")).otherwise(lit("")),
        lit("filler"), col("i").cast("string"),
        lit(" pad alpha beta gamma delta epsilon zeta eta theta"))
      val text =
        if (k == 0) when(col("i") < 10, lit("bulk bulk bulk bulk"))
          .otherwise(long)
        else long
      ids.select(col("doc_id"), text.as("text"))
    }
    val docs = (0 until m).map(copyDocs).reduce(_ unionByName _)
    val name = s"graft_blkcost_m$m"
    val t0 = System.nanoTime()
    LexIndex.writeLexIndex(docs, name, numBuckets = 8)
    println(f"[blkcost] m=$m%-4d build ${(System.nanoTime() - t0) / 1e9}%8.2fs")

    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    import spark.implicits._
    // query id OUTSIDE every copy's id space (k·10⁸ + id < 10¹⁰ for
    // all k < 100): 9·10⁸ collided with copy k=9 once M ≥ 10, so the
    // self-match exclusion silently dropped a real bulk doc (r17
    // advice) — 10¹⁰ can never collide
    val queries = Seq((10000000000L, "bulk"))
      .toDF("doc_id", "text").localCheckpoint()

    def measure(tag: String, run: () => Long): Unit =
      (1 to 2).foreach { rep =>
        bytes.set(0L)
        val t1 = System.nanoTime()
        val n = run()
        val dt = (System.nanoTime() - t1) / 1e9
        Thread.sleep(1500) // listener drain (dev-only tool)
        println(f"[blkcost] m=$m%-4d $tag%-9s rep$rep rows=$n%-4d " +
          f"bytes=${bytes.get()}%12d  ${dt}%7.2fs")
      }
    // losslessness asserted ON the measured fixture, not assumed
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val eq = rows(LexIndex.probeLexIndex(spark, name, queries, 10)) ==
      rows(LexIndex.probeLexIndexMaxScore(spark, name, queries, 10))
    require(eq, "bounded probe diverged from the full probe")
    println(s"[blkcost] m=$m equality: ok")
    measure("full", () =>
      LexIndex.probeLexIndex(spark, name, queries, kEach = 10).count())
    measure("bounded", () =>
      LexIndex.probeLexIndexMaxScore(spark, name, queries, kEach = 10)
        .count())
    LexIndex.lastBoundedStats.foreach { case (s2, e, t2, c) =>
      println(s"[blkcost] m=$m bounded stats: surviving=$s2" +
        s" essentialPairs=$e totalPairs=$t2 candidates=$c")
    }
    LexIndex.lastBlockStats.foreach { case (sr, kept, total) =>
      println(s"[blkcost] m=$m block stats: seedRanges=$sr" +
        s" stampsKept=$kept stampsTotal=$total")
    }
    spark.stop()
  }
}
