package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard layout: the final hop of the corpus-prep pipeline,
  * turning the packed token stream (Packing) into the size-bounded,
  * sequentially-readable shards a trainer streams (the WebDataset /
  * streaming-dataset layout). A shard covers a fixed token range
  * [shard·S, (shard+1)·S); docs spanning a boundary belong to every
  * shard they overlap, carrying the overlap length, so per-shard token
  * counts tile the corpus exactly.
  *
  * Scale: assignment is a narrow per-row explode (≤ 1 + n_tokens/S
  * rows per doc — almost always 1); the write is ONE shuffle
  * (repartition on shard) so each shard directory is a single
  * sequential file, which is the property trainers need (a shard is
  * the unit of streaming I/O and of resume). Shard count = corpus
  * tokens / S — bounded, known up front, independent of executor
  * count. The manifest is a shard-keyed partial agg over the
  * assignment rows; nothing touches the driver.
  */
object Sharding {

  /** Explode a packed frame (`start_tok`, `n_tokens`, + passthrough
    * columns) into per-(doc, shard) assignment rows with the exact
    * token overlap. `greatest` guards the degenerate 0-token doc
    * (shard_last would land before shard_first). */
  def shardAssignments(packed: DataFrame, tokensPerShard: Long): DataFrame = {
    val s = tokensPerShard
    require(s > 0, "tokensPerShard must be positive")
    packed
      .withColumn("shard_first", expr(s"start_tok DIV $s"))
      .withColumn("shard_last",
        expr(s"greatest(start_tok DIV $s, (start_tok + n_tokens - 1) DIV $s)"))
      .withColumn("shard",
        explode(sequence(col("shard_first"), col("shard_last"))))
      .withColumn("tok_in_shard",
        least((col("shard") + 1) * s, col("start_tok") + col("n_tokens")) -
          greatest(col("shard") * s, col("start_tok")))
      .drop("shard_first", "shard_last")
  }

  /** Write assignment rows as one directory per shard (dynamic
    * partition layout) and read the result back — the round trip is
    * the point: the registered query's manifest is computed from what
    * a trainer would actually open. `repartition(shard)` makes each
    * shard directory a single file (ShardingSpec asserts);
    * maxRecordsPerFile is the guard against a pathologically large
    * shard parameter. */
  def writeShards(assignments: DataFrame, path: String): DataFrame = {
    assignments.repartition(col("shard"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000)
      .partitionBy("shard")
      .parquet(path)
    assignments.sparkSession.read.parquet(path)
  }

  /** Per-shard manifest: doc count, exact token count (overlaps tile
    * the corpus), and the covered position range — what a resume /
    * integrity check reads instead of the shards themselves. */
  def manifest(assignments: DataFrame, posCol: String): DataFrame =
    assignments.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_shard")).as("n_tokens"),
        min(col(posCol)).as("min_pos"),
        max(col(posCol)).as("max_pos"))
}
