package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Misra–Gries heavy-hitters sketch as a typed, map-side-combinable
  * Aggregator: at most `k` counters summarize an arbitrarily long
  * stream, with the classic guarantee that every key whose true
  * frequency exceeds n/k survives, and every reported count is an
  * UNDER-estimate by at most n/k. Completes the sketch family next to
  * HLL (q16/q26 approximate distinct) and the bounded top-k
  * ([[KeywordTopK]]): distinct-count, frequent-items, and exact-top-k
  * cover the three "what's in this column" questions a corpus audit
  * asks at 100 TB, all in one partial-aggregated pass each.
  *
  * Distribution shape: `reduce` runs per partition (map-side combine
  * keeps at most k entries per partition in flight — not one per
  * distinct key, which is the whole point vs an exact groupBy at
  * 100 TB), and `merge` is the mergeable-summaries combine (Agarwal
  * et al., PODS'12): sum the counter maps, then subtract the (k+1)-th
  * largest count and drop what hits zero — the merged sketch keeps the
  * same ε = n/k error envelope, so the guarantee is PARTITIONING-
  * INVARIANT even though the surviving counter VALUES are not
  * (HeavyHittersSpec pins the former across repartitions; q31's
  * contract rows gate exactly the invariant part, never the raw
  * counters, which is why the row is oracle-checkable at all). */
object HeavyHitters {

  final case class MGEntry(key: String, cnt: Long)

  /** The mergeable-summaries combine (shared by the Aggregator's merge
    * and [[graft.streaming.StreamingHeavyHitters]]'s cross-batch
    * fold): sum the counter maps, then subtract the (k+1)-th largest
    * count and drop what hits zero. ≤ k entries survive and each key's
    * total decrement stays ≤ n/(k+1) summed over any merge tree. */
  def mgMerge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val s = b.foldLeft(a) { case (acc, (k2, v)) =>
      acc.updated(k2, acc.getOrElse(k2, 0L) + v)
    }
    if (s.size <= k) s
    else {
      val d = s.values.toSeq.sortBy(-_).apply(k)
      s.flatMap { case (k2, v) =>
        if (v - d > 0L) Some(k2 -> (v - d)) else None
      }
    }
  }

  final class HeavyHittersAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Array[MGEntry]] {
    require(k >= 1, s"need at least one counter, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(m: Map[String, Long], key: String): Map[String, Long] =
      if (m.contains(key)) m.updated(key, m(key) + 1L)
      else if (m.size < k) m.updated(key, 1L)
      else m.flatMap { case (k2, v) => // decrement-all step: the
        // arriving key and one unit of every counter annihilate
        if (v > 1L) Some(k2 -> (v - 1L)) else None
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, k)

    def finish(m: Map[String, Long]): Array[MGEntry] =
      m.toSeq.sortBy { case (k2, v) => (-v, k2) }
        .map { case (k2, v) => MGEntry(k2, v) }.toArray

    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Array[MGEntry]] =
      ExpressionEncoder[Array[MGEntry]]()
  }
}
