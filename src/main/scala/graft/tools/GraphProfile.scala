package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Dev-only: stage-level timing of the maintained-graph lifecycle
  * against the M=10 scale fixture (run ScaleStress first so the scaled
  * embeddings exist). Lives in `graft.operators` to reach the
  * package-private stage helpers; the profiled stages ARE the
  * production dataflow — [[KnnGraphIndex.appendStages]] /
  * [[KnnGraphIndex.applyAppend]] run through the [[KnnGraphIndex.StageTimer]]
  * hook, so the profile cannot drift from the operator as it evolves. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorFunctions.register(spark)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_scale")
    val emb = spark.read.parquet(
      new java.io.File(root, "m10/embeddings.parquet").getAbsolutePath)
      .select(col("vec_id"), col("embedding"))
    object tm extends KnnGraphIndex.StageTimer {
      def apply[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[gp] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
        r
      }
    }
    val m = sys.env.getOrElse("GP_M", "10")
    val embM = if (m == "10") emb else spark.read.parquet(
      new java.io.File(root, s"m$m/embeddings.parquet").getAbsolutePath)
      .select(col("vec_id"), col("embedding"))
    val gName = s"graft_scale_graph_m$m"
    tm("build total") {
      KnnGraphIndex.writeKnnGraph(embM, gName, k = 10,
        nCells = 16 * m.toInt, nprobe = 2, edgeBuffer = 10, tm = tm)
    }
    val batch = embM.filter(col("vec_id") < 300)
      .select((col("vec_id") + 99000000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    // the production append, stage-timed end to end (lease held as the
    // operator itself holds it)
    val lease = Generations.begin(spark, gName, KnnGraphIndex.Members)
    try {
      val st = KnnGraphIndex.appendStages(spark, gName, batch,
        ifAbsent = true, tm).getOrElse(sys.error("empty batch?"))
      println(s"[gp] pairs = ${st.pairs.count()}")
      println(s"[gp] newEdges = ${st.newEdges.count()}")
      KnnGraphIndex.applyAppend(spark, gName, st, tm)
    } finally Generations.abort(spark, lease)
    // slice probe of the appended batch: must do slice-sized work
    // (pushed qid filter + row-group pruning on the sorted buckets)
    tm("slice probe") {
      KnnGraphIndex.probeKnnGraph(spark, gName,
        col("qid") >= 99000000000L).count()
    }
    tm("full probe") {
      KnnGraphIndex.probeKnnGraph(spark, gName).count()
    }
    spark.stop()
  }
}
