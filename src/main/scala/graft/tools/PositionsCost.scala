package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Generations, LexIndex}

/** Dev-only: the positional-postings cost measurement (r14 verdict
  * ask #3). The r14 round added a `positions` column to the lex
  * postings schema (exact phrase retrieval from the maintained
  * artifact); the READ side was proven free for BM25 scoring (the
  * ReadSchema column-pruning spec), but the WRITE side — postings
  * bytes and the tokenize+write wall-time of build/append/compact —
  * was never isolated from shared-box load. This tool measures it:
  *
  *  - BYTES: build the real index over the M=10 fixture (sf0.1 docs
  *    salted 10×, the Scale100 recipe), then rewrite the postings
  *    member minus `positions` with the identical bucketed layout,
  *    and compare on-disk parquet bytes (plus the family's other
  *    members for share-of-family context).
  *  - WRITE CORE A/B: the tokenize→aggregate→join→bucketed-write
  *    pipeline that dominates build/append, with positions
  *    (posexplode + collect_list + sort_array, 5-column write —
  *    mirrors LexIndex.termFrames) vs without (explode + count,
  *    4-column write — the pre-r14 legacy shape), alternating reps
  *    in one JVM so JIT/page-cache conditions are shared. Run at
  *    BUILD scale (the full M=10 corpus) and APPEND scale (the base
  *    sf0.1 docs as a 1/11 batch).
  *  - COMPACT CORE A/B: the postings rewrite (read → bucketed write)
  *    that dominates compaction, from the 5-column vs the 4-column
  *    table, alternating reps.
  *
  * Output is a ready-to-paste markdown table. Quiet-box protocol:
  * loadavg is printed at start and before every phase; readings with
  * loadavg ≥ 1 at phase start are suspect.
  *
  * Usage: PositionsCost <sfDir> [reps]  (default reps = 3) */
object PositionsCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val M = 10
    val numBuckets = 8 * M

    def loadavg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def phase(name: String): Unit =
      println(f"[poscost] -- $name (loadavg ${loadavg()}%.2f)")

    // the Scale100 documents fixture (salted ids, per-copy token
    // suffixes — disjoint token universes per copy, so df/tf shapes
    // match a genuinely-bigger corpus, not 10 duplicates)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_scale")
    val docsPath = new java.io.File(root, s"m$M/documents.parquet")
    if (!new java.io.File(docsPath, "_SUCCESS").exists()) {
      val base = graft.Tables(spark, sfDir, "documents")
      (0 until M).map(k =>
          base.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            (if (k == 0) col("text")
             else regexp_replace(col("text"), "(\\S+)", s"$$1z$k"))
              .as("text")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(docsPath.getAbsolutePath)
    }
    val docs = spark.read.parquet(docsPath.getAbsolutePath)
      .select("doc_id", "text")

    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    def tableBytes(t: String): Long = dirBytes(java.nio.file.Paths.get(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location))

    // the two tokenize→aggregate cores. WITH mirrors
    // LexIndex.termFrames (private) verbatim; WITHOUT is the pre-r14
    // legacy shape (tf by count, no per-position state).
    def postWith(d: DataFrame): DataFrame = {
      val tok = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      val len = tf.groupBy("doc_id").agg(sum(col("tf")).as("len"))
      tf.join(len, "doc_id")
        .select(col("tok"), col("doc_id"), col("tf"), col("len"),
          col("positions"))
    }
    def postWithout(d: DataFrame): DataFrame = {
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val len = tf.groupBy("doc_id").agg(sum(col("tf")).as("len"))
      tf.join(len, "doc_id")
        .select(col("tok"), col("doc_id"), col("tf"), col("len"))
    }
    def bucketWrite(df: DataFrame, t: String): Unit =
      df.repartition(numBuckets, col("tok"))
        .write.format("parquet").mode("overwrite")
        .bucketBy(numBuckets, "tok").sortBy("tok").saveAsTable(t)
    def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS $t")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, withBody: => Unit, withoutBody: => Unit)
        : (Double, Double) = {
      phase(label)
      val (w, wo) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
      for (i <- 0 until reps) {        // alternate: shared conditions
        w(i) = time(withBody)
        wo(i) = time(withoutBody)
        println(f"[poscost]    rep$i with=${w(i)}%7.2fs  without=${wo(i)}%7.2fs")
      }
      (w.min, wo.min)
    }

    // ---- BYTES (and the real one-shot build, timed, for context) ---
    phase("bytes: real writeLexIndex over M=10")
    val name = "poscost_lex"
    val tBuild = time(LexIndex.writeLexIndex(docs, name, numBuckets))
    val pt = Generations.resolve(spark, name, "postings")
    val bytesWith = tableBytes(pt)
    val others = Seq("doclen", "dfcap", "stats", "vocab").map(m =>
      m -> tableBytes(Generations.resolve(spark, name, m)))
    phase("bytes: positions-less rewrite, identical layout")
    bucketWrite(spark.table(pt).drop("positions"), "poscost_post_nopos")
    val bytesWithout = tableBytes("poscost_post_nopos")

    // ---- WRITE CORE A/B: build scale and append scale --------------
    val (bW, bWo) = ab(s"write core, BUILD scale (M=$M corpus)",
      bucketWrite(postWith(docs), "poscost_b_w"),
      bucketWrite(postWithout(docs), "poscost_b_wo"))
    val batch = graft.Tables(spark, sfDir, "documents")
      .select((col("doc_id") + 990000000000L).as("doc_id"), col("text"))
    val (aW, aWo) = ab("write core, APPEND scale (base sf0.1 batch)",
      bucketWrite(postWith(batch), "poscost_a_w"),
      bucketWrite(postWithout(batch), "poscost_a_wo"))

    // ---- COMPACT CORE A/B: the postings rewrite ---------------------
    val (cW, cWo) = ab("compact core (postings read -> bucketed rewrite)",
      bucketWrite(spark.table("poscost_b_w"), "poscost_c_w"),
      bucketWrite(spark.table("poscost_b_wo"), "poscost_c_wo"))
    Seq("poscost_b_w", "poscost_b_wo", "poscost_a_w", "poscost_a_wo",
      "poscost_c_w", "poscost_c_wo", "poscost_post_nopos").foreach(drop)

    def mb(b: Long) = f"${b / 1048576.0}%.1f MB"
    def row(l: String, w: Double, wo: Double) =
      println(f"| $l | $w%.2f s | $wo%.2f s | ${w / wo}%.2f× |")
    println()
    println(s"[poscost] real writeLexIndex (M=$M, numBuckets=$numBuckets): " +
      f"$tBuild%.1f s; postings ${mb(bytesWith)}, " +
      others.map { case (m, b) => s"$m ${mb(b)}" }.mkString(", "))
    println("| measurement | with positions | without | ratio |")
    println("|---|---|---|---|")
    println(f"| postings bytes (identical 80-bucket layout) | ${mb(bytesWith)} " +
      f"| ${mb(bytesWithout)} | ${bytesWith.toDouble / bytesWithout}%.2f× |")
    row("write core, build scale (best of " + reps + ")", bW, bWo)
    row("write core, append scale (best of " + reps + ")", aW, aWo)
    row("compact core (best of " + reps + ")", cW, cWo)
    spark.stop()
  }
}
