package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k for scored TERMS — the keyword-extraction
  * sibling of [[Similarity.TopKAgg]] (which keys items by a Long id;
  * keywords need the string term itself both as payload and as the
  * deterministic tie-break).
  *
  * Ordering: (score desc, term asc) — ties broken by the term so the
  * result is a pure function of the input set, independent of row
  * order, partitioning, and retries (the property every oracle-hashed
  * query needs).
  *
  * Scale shape: a typed Aggregator partial-aggregates per partition,
  * so each partition contributes ≤ k rows per doc to the exchange —
  * vs a `row_number().over(partitionBy(doc))` window, which shuffles
  * and sorts EVERY scored (doc, term) row. Per-doc groups are small
  * and uniform, so the window is merely wasteful rather than skewed,
  * but the Aggregator is the house pattern (q28) and strictly less
  * shuffle traffic.
  */
object KeywordTopK {

  /** One kept keyword with its final per-doc rank. */
  final case class Keyword(term: String, tf: Long, df: Long, score: Double,
      rank: Int)
  /** Bounded buffer: parallel arrays sorted by (score desc, term asc),
    * length ≤ k. */
  final case class KwBuf(terms: Array[String], tf: Array[Long],
      df: Array[Long], score: Array[Double])

  final class KeywordTopKAgg(k: Int)
      extends Aggregator[(String, Long, Long, Double), KwBuf, Array[Keyword]] {
    private def better(s1: Double, t1: String, s2: Double, t2: String): Boolean =
      s1 > s2 || (s1 == s2 && t1 < t2)
    def zero: KwBuf = KwBuf(Array.empty, Array.empty, Array.empty, Array.empty)
    def reduce(b: KwBuf, x: (String, Long, Long, Double)): KwBuf = {
      val (term, tf, df, sc) = x
      val n = b.terms.length
      if (n == k && !better(sc, term, b.score(n - 1), b.terms(n - 1))) b
      else {
        var p = 0
        while (p < n && better(b.score(p), b.terms(p), sc, term)) p += 1
        val m = math.min(n + 1, k)
        val terms = new Array[String](m); val tfs = new Array[Long](m)
        val dfs = new Array[Long](m); val scs = new Array[Double](m)
        System.arraycopy(b.terms, 0, terms, 0, p)
        System.arraycopy(b.tf, 0, tfs, 0, p)
        System.arraycopy(b.df, 0, dfs, 0, p)
        System.arraycopy(b.score, 0, scs, 0, p)
        terms(p) = term; tfs(p) = tf; dfs(p) = df; scs(p) = sc
        if (p < m - 1) {
          System.arraycopy(b.terms, p, terms, p + 1, m - 1 - p)
          System.arraycopy(b.tf, p, tfs, p + 1, m - 1 - p)
          System.arraycopy(b.df, p, dfs, p + 1, m - 1 - p)
          System.arraycopy(b.score, p, scs, p + 1, m - 1 - p)
        }
        KwBuf(terms, tfs, dfs, scs)
      }
    }
    def merge(a: KwBuf, b: KwBuf): KwBuf = {
      var out = a
      var i = 0
      while (i < b.terms.length) {
        out = reduce(out, (b.terms(i), b.tf(i), b.df(i), b.score(i)))
        i += 1
      }
      out
    }
    def finish(b: KwBuf): Array[Keyword] =
      Array.tabulate(b.terms.length)(i =>
        Keyword(b.terms(i), b.tf(i), b.df(i), b.score(i), i + 1))
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KwBuf]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Keyword]]()
  }

  /** (doc_id, tok, tf, df, score) → k best terms per doc as
    * (doc_id, rank, term, tf, df, score). */
  def topTermsPerDoc(scored: DataFrame, k: Int): DataFrame = {
    val topkw = udaf(new KeywordTopKAgg(k))
    scored.groupBy("doc_id")
      .agg(topkw(col("tok"), col("tf"), col("df"), col("score")).as("kw"))
      .select(col("doc_id"), explode(col("kw")).as("t"))
      .select(col("doc_id"), col("t.rank").as("rank"),
        col("t.term").as("term"), col("t.tf").as("tf"),
        col("t.df").as("df"), col("t.score").as("score"))
  }
}
