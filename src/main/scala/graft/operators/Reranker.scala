package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final-stage re-ranking — the cross-encoder position in a production
  * retrieval stack (retrieve → fuse → RERANK the short list). A real
  * deployment drops an ONNX cross-encoder behind this trait exactly
  * like the enrichment DAG's `TextClassifier` (SURVEY §7: per-executor
  * model handle, batched `mapPartitions`, never on the driver);
  * offline, [[DiceReranker]] scores with a deterministic integer Dice
  * coefficient over token sets — portable enough for the DuckDB
  * oracle to replay bit-exactly, shaped enough to pin the deployment
  * architecture: PAIRWISE (query, doc) scoring at the END of the
  * funnel, cost ∝ k·|queries| text pairs, never corpus-sized.
  */
trait Reranker extends Serializable {
  /** Relevance micro-scores (×10⁶ scale) for (queryText, docText)
    * pairs — an iterator contract so a real model can batch. */
  def scoreMicro(pairs: Iterator[(String, String)]): Iterator[Long]
}

/** The offline stand-in: integer Dice over whitespace token SETS,
  * 2·10⁶·|q ∩ d| ÷ (|q| + |d|) with floor division — deterministic,
  * engine-portable (DuckDB: `list_intersect` over `list_distinct`
  * token lists with `//`). */
object DiceReranker extends Reranker {
  def scoreMicro(pairs: Iterator[(String, String)]): Iterator[Long] =
    pairs.map { case (q, d) =>
      // filter the empty token `"".split` produces — a blank text has
      // NO tokens and must score 0 against anything (including another
      // blank; the un-filtered form scored blank-vs-blank 10⁶)
      val qs = q.trim.split("\\s+").filter(_.nonEmpty).toSet
      val ds = d.trim.split("\\s+").filter(_.nonEmpty).toSet
      val denom = qs.size + ds.size
      if (denom == 0) 0L
      else 2L * 1000000L * qs.intersect(ds).size / denom
    }
}

object Rerank {

  /** Score the hit list's (query, doc) text pairs through `model`:
    * returns (qid, doc_id, rerank_micro) for the caller to join back
    * and re-order by. `hits` carries (qid, doc_id, …) — per-query
    * bounded by contract; `queries` is (qid|doc_id, text); `docs` is
    * the corpus (doc_id, text).
    *
    * Scale shape, the snippets discipline end to end: the hit pairs
    * are pinned, their doc ids collected (bounded by
    * [[HybridRetrieval.SnippetPushdownMax]], broadcast-join fallback
    * past it) and pushed as `In(doc_id)` into the doc-text scan —
    * file-stat pruning on a ranged doc store, one narrow
    * (doc_id, text) read either way — then ONE `mapPartitions` pass
    * scores the ≤ k·|queries| pairs in model-sized batches with no
    * shuffle (the inference deployment shape, e02's pattern). */
  def rerank(spark: SparkSession, hits: DataFrame, queries: DataFrame,
      docs: DataFrame, model: Reranker): DataFrame = {
    import spark.implicits._
    val h = Frontier.pin(hits.select(col("qid").cast("long"),
      col("doc_id").cast("long")).distinct())
    val ids = h.select("doc_id").distinct()
      .limit(HybridRetrieval.SnippetPushdownMax + 1).collect()
      .map(_.getLong(0))
    val lookup =
      if (ids.length > HybridRetrieval.SnippetPushdownMax) docs
      else docs.filter(col("doc_id").isin(ids.map(x => x: Any): _*))
    val qt = queries.select(
      col(queries.columns.head).cast("long").as("qid"),
      col(queries.columns(1)).as("qtext"))
    broadcast(h)
      .join(lookup.select(col("doc_id"), col("text").as("dtext")),
        "doc_id")
      .join(broadcast(qt), "qid")
      .select(col("qid"), col("doc_id"), col("qtext"), col("dtext"))
      .as[(Long, Long, String, String)]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch => // batch like a real session
          val scores =
            model.scoreMicro(batch.iterator.map(t => (t._3, t._4))).toSeq
          batch.iterator.zip(scores.iterator)
            .map { case ((q, d, _, _), s) => (q, d, s) }
        }
      }
      .toDF("qid", "doc_id", "rerank_micro")
  }
}
