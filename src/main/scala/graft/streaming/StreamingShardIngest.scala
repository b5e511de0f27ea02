package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Packing, Sharding}

/** Streaming shard ingest — the continuous form of p05: each closed
  * micro-batch of (doc_id, n_tokens) is packed with the batch
  * two-phase-scan planner, its offsets shifted to continue from the
  * persisted layout's current token total, and its shard assignments
  * APPENDED to the layout (sealed shards untouched, boundary shard
  * rewritten merged — `Sharding.appendShards`). A trainer can mount
  * the layout at any epoch boundary and see a valid, growing,
  * deterministic shard set.
  *
  * The reference's analog is the continuously-admitting output stream
  * (`/root/reference/src/nats_client.py:246-260` keeps accepting new
  * messages into the same durable stream); here the durable artifact
  * is the trainer-facing shard directory tree.
  *
  * Scale: the per-epoch cost is the batch's own pack (two-phase scan
  * over the BATCH, not the corpus) + the append (ingest-sized write,
  * one boundary-shard rewrite). The only look at the existing layout
  * is [[layoutEnd]] — a driver-side directory listing (O(#shards))
  * plus a scan of ONE shard directory — never a full-layout read, so
  * epoch cost is independent of corpus size.
  */
object StreamingShardIngest {

  /** Token total already laid out at `path`: max(start_tok + n_tokens)
    * over the LAST shard directory only (token ranges tile, so the
    * global max end lives in the max shard). Directory listing is
    * driver-side O(#shards); the scan touches one shard. */
  def layoutEnd(spark: SparkSession, path: String): Long = {
    val dirs = Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    if (dirs.isEmpty) 0L
    else {
      val maxShard = dirs.map(_.getName.stripPrefix("shard=").toLong).max
      spark.read.parquet(path).filter(col("shard") === maxShard)
        .agg(max(col("start_tok") + col("n_tokens"))).first().getLong(0)
    }
  }

  /** Drive the pack → shift → append loop from a streaming
    * (doc_id, n_tokens) frame. Epochs must arrive in corpus order for
    * the layout to equal the one-shot build (the same contract as
    * `packEpochs`); within an epoch the pack orders by doc_id. */
  def shardEpochs(tokenCounts: DataFrame, budget: Int,
      tokensPerShard: Long, path: String): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (b, _) => {
      val spark = b.sparkSession
      if (!b.isEmpty) {
        val base = layoutEnd(spark, path)
        val packed = Packing.packPlan(b.toDF(), "doc_id", "n_tokens", budget)
          .select(col("doc_id"), col("n_tokens"),
            (col("start_tok") + base).as("start_tok"))
        val assign = Sharding.shardAssignments(packed, tokensPerShard)
        if (base == 0L) Sharding.writeShards(assign, path)
        else Sharding.appendShards(assign, path)
        ()
      }
    }
    tokenCounts.writeStream.outputMode("append").foreachBatch(step).start()
  }
}
