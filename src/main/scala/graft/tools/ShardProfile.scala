package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Frontier, Sharding}

/** Dev-only: stage-level timing of the p04/p05 shard write path at a
  * given SF dir (r9 verdict ask #7, carried to r11 as finding #3):
  * establishes how the ~4-5 s wall-clock splits between the UPSTREAM
  * pack chain (tokenize → shuffle → prefix-sum → pack), the shard
  * WRITE job itself, the read-back (partition discovery + schema), and
  * the manifest aggregation — i.e. whether the write is a serial
  * driver loop (it is not: one repartition(shard) shuffle, 32 parallel
  * tasks writing dynamic partition dirs) or fixture-scale fixed cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh
  * graft.tools.ShardProfile */
object ShardProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sp] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    if (sys.env.contains("SHARD_PROFILE_CHAIN_FIRST")) {
      for (i <- 1 to 3)
        tm(s"fresh chain count run$i")(
          graft.queries.CorpusPrep.shuffledPack(spark, dir).count())
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for (i <- 1 to 2)
        tm(s"chain count noAQE run$i")(
          graft.queries.CorpusPrep.shuffledPack(spark, dir).count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      for (i <- 1 to 2)
        tm(s"chain pin run$i")(graft.operators.Frontier.pin(
          graft.queries.CorpusPrep.shuffledPack(spark, dir)).count())
      spark.stop(); return
    }
    // ---- p04's exact upstream chain (CorpusPrep.shuffledPack: the
    // full quality -> exact-dedup -> decontaminate -> temperature ->
    // shuffle -> pack pipeline the registered query times) ------------
    val packed0 = graft.queries.CorpusPrep.shuffledPack(spark, dir)
      .select(col("doc_id"), col("shuffle_pos"), col("n_tokens"),
        col("start_tok"))
    val packed = tm("upstream pack+pin")(Frontier.pin(packed0))
    println(s"[sp] rows = ${packed.count()}")
    val assign0 = Sharding.shardAssignments(packed, tokensPerShard = 2048L)
    val assign = tm("assignments pin")(Frontier.pin(assign0))
    val nShards = assign.select("shard").distinct().count()
    println(s"[sp] shards = $nShards")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_shardprofile").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    var back: DataFrame = null
    tm("writeShards total") { back = Sharding.writeShards(assign, path) }
    tm("read-back count")(back.count())
    tm("manifest agg") {
      Sharding.manifest(back, "shuffle_pos").orderBy("shard").count()
    }
    // decomposed write: isEmpty probe vs the write job itself
    rm(new java.io.File(path))
    tm("isEmpty probe")(assign.isEmpty)
    tm("write job only") {
      assign.repartition(col("shard"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1000000)
        .partitionBy("shard")
        .parquet(path)
    }
    // repeat the identical write to split cold-start (codegen, writer
    // class init) from steady-state cost, then vary task count
    for (i <- 2 to 3) {
      rm(new java.io.File(path))
      tm(s"write job run$i") {
        assign.repartition(col("shard"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", 1000000)
          .partitionBy("shard")
          .parquet(path)
      }
    }
    for (parts <- Seq(8, 32)) {
      rm(new java.io.File(path))
      tm(s"write job ($parts parts)") {
        assign.repartition(parts, col("shard"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", 1000000)
          .partitionBy("shard")
          .parquet(path)
      }
    }
    tm("fresh read-back") {
      spark.read.schema(assign.schema).parquet(path).count()
    }
    // the p05 append shape: second half appended onto the first
    val cut = packed.agg((count(lit(1)) / 2).cast("long"))
      .collect()(0).getLong(0)
    val a = Sharding.shardAssignments(
      packed.filter(col("shuffle_pos") < cut), 2048L)
    val b = Sharding.shardAssignments(
      packed.filter(col("shuffle_pos") >= cut), 2048L)
    rm(new java.io.File(path))
    tm("p05 writeShards(a)")(Sharding.writeShards(a, path))
    tm("p05 appendShards(b)")(Sharding.appendShards(b, path))
    // the registered queries end to end, exactly as the bench runs them
    for (i <- 1 to 2) {
      tm(s"chain count run$i")(
        graft.queries.CorpusPrep.shuffledPack(spark, dir).count())
      tm(s"chain isEmpty run$i")(
        graft.queries.CorpusPrep.shuffledPack(spark, dir).isEmpty)
      tm(s"p04 registered run$i")(
        graft.SparkEntry.queries("p04_training_shards")(spark, dir).count())
      tm(s"p05 registered run$i")(
        graft.SparkEntry.queries("p05_shard_append")(spark, dir).count())
    }
    spark.stop()
  }
}
