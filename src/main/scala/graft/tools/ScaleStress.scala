package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{AnnIndex, Dedup, KnnGraphIndex, Packing, Sampling, Similarity, SkewJoin}

/** Dev-only: the 10× scale-stress harness behind SCALE.md §"10×
  * stress". No sf1 fixture exists, so one is generated in-engine from
  * sf0.1: each table exploded M× with salted ids; document text gets a
  * per-copy token suffix (disjoint shingle universes — a corpus that
  * BEHAVES 10× larger, not 10× duplicated, so df distributions and
  * join fan-outs scale instead of degenerating), embeddings a tiny
  * per-copy perturbation, fact tables shifted join keys. The five
  * hottest operators run at M=1 and M=10 from parquet (real scans);
  * wall-clock plus the plan's scale indicators (exchange count,
  * cartesian/BNLJ flags) print per run — the claim under test is
  * ~linear time and UNCHANGED plan shape at 10×.
  *
  * Usage: ScaleStress <sfDir> [reps]
  */
object ScaleStress {

  private def indicators(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    val ex = p.linesIterator.count(_.contains("Exchange"))
    s"exchanges=$ex cartesian=${p.contains("CartesianProduct")} " +
      s"bnlj=${p.contains("BroadcastNestedLoop")}"
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_scale")

    def scaled(m: Int, name: String, build: Int => DataFrame): String = {
      val path = new java.io.File(root, s"m$m/$name.parquet").getAbsolutePath
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        (0 until m).map(build).reduce(_ unionByName _)
          .write.mode("overwrite").parquet(path)
      }
      path
    }

    def prep(m: Int): Map[String, DataFrame] = {
      val docs0 = Tables(spark, sfDir, "documents")
      val emb0 = Tables(spark, sfDir, "embeddings")
      val li0 = Tables(spark, sfDir, "lineitem")
      val ord0 = Tables(spark, sfDir, "orders")
      val paths = Map(
        "documents" -> scaled(m, "documents", k =>
          docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            (if (k == 0) col("text")
             else regexp_replace(col("text"), "(\\S+)", s"$$1z$k")).as("text"),
            col("lang"), col("n_chars"))),
        "embeddings" -> scaled(m, "embeddings", k =>
          emb0.select((col("vec_id") + k * 10000000000L).as("vec_id"),
            expr(s"transform(embedding, x -> CAST(x + CAST($k AS FLOAT) * CAST(0.0001 AS FLOAT) AS FLOAT))")
              .as("embedding"), col("label"))),
        "lineitem" -> scaled(m, "lineitem", k =>
          li0.withColumn("l_orderkey", col("l_orderkey") + k * 1000000000L)),
        "orders" -> scaled(m, "orders", k =>
          ord0.withColumn("o_orderkey", col("o_orderkey") + k * 1000000000L)))
      paths.map { case (n, p) => n -> spark.read.parquet(p) }
    }

    // fixed-size nightly batch for the index probes (batch size must
    // NOT scale with the corpus — that is the point of the probe test)
    def probeBatch(docs: DataFrame): DataFrame =
      docs.filter(col("doc_id") < 300)
        .select((col("doc_id") + 77000000000L).as("doc_id"),
          concat(col("text"), lit(" zz probe pad")).as("text"))
        .localCheckpoint()

    def p03Like(docs: DataFrame): DataFrame = {
      // the p03 chain: quality → exact dedup → budget → shuffle → pack
      val quality = docs.filter(length(trim(col("text"))) > 0)
        .filter(TextFunctions.quality(col("text"), col("n_chars")) >= 0.5)
      val deduped = quality.join(
        Dedup.exactDedup(quality).select("doc_id"), "doc_id")
      val kept = Sampling.tokenBudgetSample(deduped, col("doc_id"),
          col("lang"), TextFunctions.tokenCount(col("text")),
          budget = 20000L, salt = "scale")
        .select(col("doc_id"), col("n_tokens"))
      val shuffled = Sampling.deterministicShuffle(kept, col("doc_id"),
        salt = "scales")
      Packing.packPlan(shuffled.select(col("shuffle_pos"), col("n_tokens")),
        "shuffle_pos", "n_tokens", budget = 256)
    }

    Seq(1, 10).foreach { m =>
      val t = prep(m)
      val docs = t("documents")
      val emb = t("embeddings").select(col("vec_id"), col("embedding"))
      val ndName = s"graft_scale_nd_m$m"
      val annName = s"graft_scale_ann_m$m"

      def time(name: String, mk: () => DataFrame): Unit = {
        var best = Double.MaxValue
        var ind = ""
        (1 to reps).foreach { _ =>
          val df = mk()
          ind = indicators(df)
          val t0 = System.nanoTime()
          df.count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[scale] m=$m $name%-12s ${best}%8.2fs  $ind")
      }
      def timeSideEffect(name: String, run: () => Unit): Unit = {
        val t0 = System.nanoTime()
        run()
        println(f"[scale] m=$m $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs  (build)")
      }

      time("d08", () => Dedup.ngramJaccardPairs(docs, dfCap = 8))
      // the EXACT path at scale: prefix filtering must track d08's
      // linearity while keeping the uncapped all-pairs result
      time("d22", () => Dedup.prefixJaccardPairs(docs))
      timeSideEffect("d12_build", () =>
        Dedup.writeNearDupIndex(docs.select(col("doc_id"), col("text")), ndName))
      val batch = probeBatch(docs)
      time("d12_probe", () =>
        Dedup.incrementalNearDupSurvivorsIndexed(spark, ndName, batch))
      timeSideEffect("s09_build", () => AnnIndex.writeAnnIndex(emb, annName))
      time("s09_probe", () =>
        AnnIndex.probeAnnIndex(spark, annName, emb, col("vec_id") < 8, 10))
      // knnGraph's scale knob is nCells ∝ corpus size (holds |cell| and
      // therefore the corpus-corpus join's per-cell pair count bounded);
      // nprobe stays at the production point. Claim: ~linear, since
      // work ≈ nprobe·n²/nCells and nCells scales with n.
      time("s25_graph", () =>
        Similarity.knnGraph(spark, emb, k = 10, nCells = 16 * m, nprobe = 2))
      // maintained-graph lifecycle: the build is the one-time cost;
      // the claim under test is the APPEND (fixed 300-vector batch)
      // staying batch-sized against a 10× corpus — forward/reverse
      // candidates are cell-joins bounded by nprobe·|batch|·|cell|
      val gName = s"graft_scale_graph_m$m"
      timeSideEffect("s26_build", () => KnnGraphIndex.writeKnnGraph(
        emb, gName, k = 10, nCells = 16 * m, nprobe = 2, edgeBuffer = 10))
      val gBatch = emb.filter(col("vec_id") < 300)
        .select((col("vec_id") + 88000000000L).as("vec_id"),
          col("embedding"))
        .localCheckpoint()
      timeSideEffect("s26_append", () =>
        KnnGraphIndex.appendToKnnGraph(gBatch, gName))
      time("s26_probe", () =>
        KnnGraphIndex.probeKnnGraph(spark, gName,
          col("qid") >= 88000000000L))
      time("p03", () => p03Like(docs))
      time("q18", () => SkewJoin.hotKeySaltedJoin(
          t("lineitem").withColumnRenamed("l_orderkey", "okey"),
          t("orders").withColumnRenamed("o_orderkey", "okey"),
          "okey", salt = 8, hotThreshold = 4L, sampleFraction = 0.5)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items")))
    }
    spark.stop()
  }
}
