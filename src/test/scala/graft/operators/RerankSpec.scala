package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The rerank stage's contracts: the distributed mapPartitions pass
  * scores exactly what a direct pairwise computation scores (across
  * the 64-pair batching boundary), the In-pushdown doc fetch loses no
  * pairs, and the stand-in's integer Dice handles the empty edge.
  * (The end-to-end serve → rerank ordering is the s61 hash row.) */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  test("rerank: distributed scores == direct Dice over every pair; " +
      "batch boundary crossed; no pair lost to the pushdown") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // 4 queries × 40 docs = 160 pairs — crosses the 64-pair batch
    // boundary inside one partition and spans partitions
    val hits = (for (q <- 0L until 4L; d <- 100L until 140L)
      yield (q, d)).toDF("qid", "doc_id")
    val queries = docs.filter(col("doc_id") < 4)
    val got = Rerank.rerank(spark, hits, queries, docs, DiceReranker)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val texts = docs.filter(col("doc_id") < 140).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def dice(q: String, d: String): Long = {
      val qs = q.trim.split("\\s+").toSet
      val ds = d.trim.split("\\s+").toSet
      if (qs.size + ds.size == 0) 0L
      else 2L * 1000000L * qs.intersect(ds).size / (qs.size + ds.size)
    }
    val want = (for (q <- 0L until 4L; d <- 100L until 140L)
      yield (q, d) -> dice(texts(q), texts(d))).toMap
    assert(got.size == 160, s"pairs lost: ${got.size}/160")
    assert(got == want, "distributed scores != direct Dice")
    // non-vacuity: scores genuinely discriminate on this corpus
    assert(got.values.toSet.size > 3, s"degenerate scores: ${got.values.toSet}")
  }

  test("DiceReranker: blank texts score 0; identical texts score 10^6") {
    val out = DiceReranker.scoreMicro(Iterator(
      ("", ""), ("   ", "a b"), ("a b c", "a b c"))).toSeq
    assert(out == Seq(0L, 0L, 1000000L), out.toString)
  }
}
