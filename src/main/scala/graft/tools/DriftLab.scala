package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Frontier, Similarity}

/** Dev-only: measure drift/recall behavior of the retrain lifecycle to
  * set honest contract bounds. Usage: DriftLab <sfDir> */
object DriftLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val emb = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))

    val tf = "transform(embedding, x -> CAST(x + CAST(0.2 AS FLOAT) AS FLOAT))"
    for ((nc, np, sl) <- Seq((16, 8, 250), (16, 8, 300), (16, 8, 400))) {
      val name = "graft_driftlab"
      AnnIndex.writeAnnIndex(emb, name, nCells = nc, residual = true)
      val drifted = emb.select((col("vec_id") + 1000000000L).as("vec_id"),
        expr(tf).as("embedding"))
      AnnIndex.appendToAnnIndex(drifted, name)
      val all = Frontier.pin(emb.unionByName(drifted))
      val ratio = AnnIndex.driftRatio(spark, name, all)
      val pred = col("vec_id") >= 1000000000L && col("vec_id") < 1000000008L
      val exact = Frontier.pin(Similarity.bruteForceTopK(spark, all, pred, 10))
      def recall(probe: org.apache.spark.sql.DataFrame): Double = {
        val p = Frontier.pin(probe)
        exact.select(col("qid"), col("vec_id"))
          .join(p.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
            Seq("qid", "vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)))
          .head().getDouble(0)
      }
      val before = recall(AnnIndex.probeAnnIndex(spark, name, all, pred, 10, nprobe = np, shortlist = sl))
      AnnIndex.retrainAnnIndex(spark, name, all)
      val after = recall(AnnIndex.probeAnnIndex(spark, name, all, pred, 10, nprobe = np, shortlist = sl))
      println(f"[driftlab] nc=$nc np=$np sl=$sl ratio=$ratio%.2f before=$before%.3f after=$after%.3f")
    }
    spark.stop()
  }
}
