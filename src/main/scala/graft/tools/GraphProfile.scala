package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Dev-only: stage-level timing of the maintained-graph append against
  * the M=10 scale fixture (run ScaleStress first so the scaled
  * embeddings and graph exist). Identifies which append stage scales
  * with the corpus. */
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
    val name = "graft_scale_graph_m10"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gp] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    tm("build") {
      KnnGraphIndex.writeKnnGraph(emb, name, k = 10, nCells = 160,
        nprobe = 2, edgeBuffer = 10)
    }
    val batch = emb.filter(col("vec_id") < 300)
      .select((col("vec_id") + 99000000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val vt = Generations.resolve(spark, name, "vecs")
    val pt = Generations.resolve(spark, name, "probes")
    val et = Generations.resolve(spark, name, "edges")
    val toAdd = tm("ifAbsent+pin") {
      Frontier.pin(
        batch.join(spark.table(vt).select("vec_id"), Seq("vec_id"),
          "left_anti"))
    }
    val cents = tm("loadCentroids") {
      spark.sparkContext.broadcast(
        spark.table(Generations.resolve(spark, name, "model"))
          .orderBy("cell").collect().map(_.getSeq[Float](1).toArray))
    }
    val cellOf = udf((v: Seq[Float]) =>
      Similarity.nearestCell(v.toArray, cents.value))
    val probesOf = udf((v: Seq[Float]) =>
      Similarity.nearestCells(v.toArray, cents.value, 2))
    val newVecs = tm("newVecs pin") {
      Frontier.pin(toAdd.select(col("vec_id"),
        col("embedding"), cellOf(col("embedding")).as("cell")))
    }
    val newProbes = tm("newProbes pin") {
      Frontier.pin(toAdd.select(col("vec_id"),
        explode(probesOf(col("embedding"))).as("cell")))
    }
    val oldVecs = spark.table(vt)
    val fwd = newProbes.select(col("vec_id").as("qid"), col("cell"))
      .join(oldVecs.select(col("vec_id"), col("cell"))
        .unionByName(newVecs.select(col("vec_id"), col("cell"))), Seq("cell"))
    val rev = spark.table(pt).select(col("vec_id").as("qid"), col("cell"))
      .join(newVecs.select(col("vec_id"), col("cell")), Seq("cell"))
    val pairs = fwd.unionByName(rev)
      .filter(col("qid") =!= col("vec_id"))
      .select("qid", "vec_id").distinct()
    val nPairs = tm("pairs count")(pairs.count())
    println(s"[gp] pairs = $nPairs")
    val universe = oldVecs.select(col("vec_id"), col("embedding"))
      .unionByName(toAdd.select(col("vec_id"), col("embedding")))
    val newEdges = tm("exactReRank") {
      val e = Similarity.exactReRank(universe, pairs, 64, 20)
        .select("qid", "vec_id", "cos")
      println(s"[gp] newEdges = ${e.count()}")
      e
    }
    tm("edges anti-scan") {
      newEdges.join(spark.table(et).select("qid", "vec_id"),
        Seq("qid", "vec_id"), "left_anti").count()
    }
    spark.stop()
  }
}
