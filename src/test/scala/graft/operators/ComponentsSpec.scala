package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** duplicateClusters == union-find on ANY pair graph — including long
  * chains (propagation must iterate past direct neighbors) and isolated
  * nodes (must keep their own id as component). */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private val graphs: Gen[(Long, List[(Long, Long)])] = for {
    n <- Gen.choose(2L, 40L)
    edges <- Gen.listOf(for {
      a <- Gen.choose(0L, n - 1); b <- Gen.choose(0L, n - 1)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield (n, edges)

  test("components match union-find on random graphs (property)") {
    val params = Gen.Parameters.default.withSize(40)
    for (trial <- 0 until 6) {
      val (n, edges) = graphs.pureApply(params, Seed(500L + trial))
      val docs = (0L until n).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val got = Dedup.duplicateClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges), s"trial=$trial n=$n edges=$edges")
    }
  }

  test("a chain propagates the min label end-to-end") {
    val docs = (0L until 6L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 5L))
  }

  test("a 1000-node chain converges in O(log n) rounds (large-star/small-star)") {
    // the adversarial case for plain min-label propagation: diameter
    // 999 would need ~999 rounds there; alternating large-star/
    // small-star doubles the folding each round — the contract is
    // logarithmic, and the labels still match union-find exactly
    val n = 1000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val (labels, rounds) = Dedup.connectedComponentsStar(
      chain.toDF("u", "v"), maxIters = 25)
    assert(rounds <= 15, s"chain took $rounds rounds — not logarithmic")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every non-root node labels to the global min 0
    assert(got.size == n - 1 && got.values.forall(_ == 0L), s"rounds=$rounds")
    // and through the public API the root keeps itself
    val docs = (0L until n).toDF("doc_id")
    val viaApi = Dedup.duplicateClusters(docs, chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaApi == (0L until n).map(_ -> 0L).toMap)
  }

  test("a clique and mixed components stay exact under the star rounds") {
    val docs = (0L until 12L).toDF("doc_id")
    // a 4-clique {0..3}, a triangle {7,8,9} linked to 4, isolated rest
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L), (4L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L,
      5L -> 5L, 6L -> 6L, 7L -> 4L, 8L -> 4L, 9L -> 4L, 10L -> 10L, 11L -> 11L))
  }
}
