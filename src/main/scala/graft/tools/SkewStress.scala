package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}

/** Dev-only: the SKEWED-stratum stress behind SCALE.md §"skewed
  * strata" (round-9 verdict ask #5). [[ScaleStress]] scales volume
  * uniformly; real corpora are zipfian by language — one stratum can
  * be ~90% of the data. The budget/sampling family's per-stratum
  * two-phase scans must stay flat under that shape:
  *
  *  - q30 ([[Sampling.tokenBudgetSample]]): `repartitionByRange` on
  *    (stratum, hash, id) — the range sampler splits a dominant
  *    stratum across MANY partitions on the hash component, so no
  *    single reducer owns 90% of the corpus.
  *  - q38 ([[Sampling.weightedSample]]): per-stratum bounded TopKAgg —
  *    partial aggregation keeps ≤k rows per (map partition, stratum);
  *    the one reducer that merges the dominant stratum sees P·k rows,
  *    not 0.9·N.
  *  - p03 (the composed budget chain) rides q30's shape.
  *
  * Each operator runs on a UNIFORM lang distribution and a SKEWED one
  * (90% collapsed into `en`) of identical row count, at M=1 and M=4 —
  * the claim under test is skew-insensitivity (uniform ≈ skewed at
  * each M) and linearity in M. Per-partition row counts of the q30
  * repartition print alongside, making a hot-spot visible directly
  * rather than inferred from wall-clock.
  *
  * Usage: SkewStress <sfDir> [reps]
  */
object SkewStress {

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
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_skew")

    def scaled(m: Int, skewed: Boolean): DataFrame = {
      val name = s"m$m${if (skewed) "_skew" else "_unif"}"
      val path = new java.io.File(root, s"$name.parquet").getAbsolutePath
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val docs0 = Tables(spark, sfDir, "documents")
        val one = (k: Int) =>
          docs0.select((col("doc_id") + k * 10000000000L).as("doc_id"),
            (if (k == 0) col("text")
             else regexp_replace(col("text"), "(\\S+)", s"$$1z$k")).as("text"),
            col("lang"), col("n_chars"))
        val all = (0 until m).map(one).reduce(_ unionByName _)
        // zipfian shape: 90% of docs collapse into one stratum, the
        // tail keeps its original langs (deterministic per doc_id)
        val langed =
          if (!skewed) all
          else all.withColumn("lang",
            when(pmod(xxhash64(col("doc_id")), lit(10)) < 9, lit("en"))
              .otherwise(col("lang")))
        langed.write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def time(label: String, mk: () => DataFrame): Double = {
      var best = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        mk().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    def q30Like(docs: DataFrame): DataFrame =
      Sampling.tokenBudgetSample(docs, col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")), budget = 50000L,
        salt = "skew30")

    def q38Like(docs: DataFrame): DataFrame =
      Sampling.weightedSample(docs, col("doc_id"), col("lang"),
        greatest(length(col("text")).cast("double") / 1000.0, lit(0.05)),
        k = 50, salt = "skew38")

    def p03Like(docs: DataFrame): DataFrame = {
      val quality = docs.filter(length(trim(col("text"))) > 0)
        .filter(TextFunctions.quality(col("text"), col("n_chars")) >= 0.5)
      val deduped = quality.join(
        Dedup.exactDedup(quality).select("doc_id"), "doc_id")
      val kept = Sampling.tokenBudgetSample(deduped, col("doc_id"),
          col("lang"), TextFunctions.tokenCount(col("text")),
          budget = 20000L, salt = "skewp3")
        .select(col("doc_id"), col("n_tokens"))
      val shuffled = Sampling.deterministicShuffle(kept, col("doc_id"),
        salt = "skewp3s")
      Packing.packPlan(shuffled.select(col("shuffle_pos"), col("n_tokens")),
        "shuffle_pos", "n_tokens", budget = 256)
    }

    // direct hot-spot probe: per-partition row counts of q30's range
    // repartition under the skewed distribution
    def partitionSpread(docs: DataFrame): (Long, Long) = {
      val p = spark.sparkContext.defaultParallelism
      val counts = docs.select(col("doc_id").as("_tb_id"),
          col("lang").as("_tb_s"),
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":skew30"))), 1, 13), 16, 10).cast("long").as("_tb_h"))
        .repartitionByRange(p, col("_tb_s"), col("_tb_h"), col("_tb_id"))
        .groupBy(spark_partition_id().as("pid")).count()
        .agg(min(col("count")), max(col("count"))).head()
      (counts.getLong(0), counts.getLong(1))
    }

    Seq(1, 4).foreach { m =>
      Seq(false, true).foreach { skewed =>
        val docs = scaled(m, skewed)
        val tag = f"m=$m ${if (skewed) "skew" else "unif"}%-4s"
        val (mn, mx) = partitionSpread(docs)
        println(f"[skew] $tag q30_parts min=$mn max=$mx ratio=${
          mx.toDouble / math.max(1L, mn)}%.2f")
        println(f"[skew] $tag q30 ${time("q30", () => q30Like(docs))}%8.2fs")
        println(f"[skew] $tag q38 ${time("q38", () => q38Like(docs))}%8.2fs")
        println(f"[skew] $tag p03 ${time("p03", () => p03Like(docs))}%8.2fs")
      }
    }
    spark.stop()
  }
}
