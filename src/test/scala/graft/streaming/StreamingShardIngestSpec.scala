package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Packing, Sharding}

case class ShardDoc(doc_id: Long, n_tokens: Long)

/** Stream/batch parity of the shard layout: replaying the corpus as N
  * in-order micro-batches through [[StreamingShardIngest.shardEpochs]]
  * must leave on disk EXACTLY the layout the one-shot batch build
  * (pack → assign → write) produces. */
class StreamingShardIngestSpec extends SparkSpec {

  import spark.implicits._

  // 12 docs, counts chosen so epochs end mid-shard (10-token shards,
  // 5-token sequences) — every append exercises the boundary rewrite
  private val docs = (0L until 12L).map(i => ShardDoc(i, (i % 4) + 2L))

  test("N epochs of streaming ingest equal the one-shot shard layout") {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_stream_shards").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ShardDoc]
    val q = StreamingShardIngest.shardEpochs(
      in.toDF(), budget = 5, tokensPerShard = 10L, path)
    try {
      docs.grouped(4).foreach { epoch =>
        in.addData(epoch)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = Sharding.manifest(
      spark.read.parquet(path).withColumn("shard", col("shard").cast("long")),
      "doc_id")
    val oneShot = Sharding.manifest(
      Sharding.shardAssignments(
        Packing.packPlan(docs.toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget = 5)
          .select(col("doc_id"), col("n_tokens"), col("start_tok")),
        tokensPerShard = 10L),
      "doc_id")
    assert(streamed.except(oneShot).isEmpty && oneShot.except(streamed).isEmpty,
      "streamed layout diverged from the one-shot build")
    // the layout's token total equals the corpus total
    assert(StreamingShardIngest.layoutEnd(spark, path) ==
      docs.map(_.n_tokens).sum)
  }
}
