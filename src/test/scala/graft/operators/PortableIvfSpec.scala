package graft.operators

import graft.{SparkSpec, Tables}

/** The portable-IVF oracle family (s04/s07/s08/s09/s11/s12) stands on
  * one claim: the JVM trainers' float arithmetic is EXACTLY the
  * order-pinned semantics the oracle text spells out in SQL. These
  * tests pin that contract on the JVM side, so a trainer edit that
  * silently changes the arithmetic (f32 accumulation, a different
  * tie-break, iteration order, an RNG init) fails HERE with a named
  * reason instead of as six opaque hash mismatches at the driver gate.
  * (s09 sharing s08's text is pinned separately: AnnIndexSpec's
  * "probe == in-memory ivfPqTopK at equal parameters".)
  */
class PortableIvfSpec extends SparkSpec {

  private val dim = 64

  /** The fixture sample exactly as both the trainer and the oracle
    * take it: the `sampleN` lowest vec_ids, in vec_id order. */
  private def sample(n: Int = 2048): Array[Array[Float]] =
    Tables(spark, sf, "embeddings").orderBy("vec_id").limit(n)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)

  /** Independent replay of the oracle's training semantics (argmin as
    * a lexicographic (d2, cell) MIN rather than the trainer's
    * strict-< scan; member-filter-then-fold rather than the trainer's
    * single-pass accumulate) — same contract, different code shape. */
  private def replay(sample: Array[Array[Float]], nCells: Int,
      iters: Int): Array[Array[Float]] = {
    val cells = math.min(nCells, sample.length)
    var cents = sample.take(cells).map(_.clone())
    for (_ <- 0 until iters) {
      val assigned = sample.map { v =>
        cents.zipWithIndex.map { case (c, i) =>
          var d2 = 0.0
          var d = 0
          while (d < v.length) {
            val diff: Float = v(d) - c(d) // one f32 round
            d2 += (diff * diff).toDouble // one f32 round, exact widen
            d += 1
          }
          (d2, i)
        }.min._2 // lexicographic (d2, cell) == ties to lowest cell
      }
      cents = cents.indices.map { c =>
        val members = sample.indices.filter(assigned(_) == c)
        if (members.isEmpty) cents(c)
        else {
          val sums = new Array[Double](sample(0).length)
          members.foreach { i => // vec_id order: f64 left-assoc fold
            var d = 0
            while (d < sums.length) { sums(d) += sample(i)(d); d += 1 }
          }
          sums.map(x => (x / members.size).toFloat)
        }
      }.toArray
    }
    cents
  }

  private def assertBitEqual(a: Array[Array[Float]], b: Array[Array[Float]],
      what: String): Unit = {
    assert(a.length == b.length, s"$what: centroid count")
    for (c <- a.indices; d <- a(c).indices)
      assert(java.lang.Float.floatToIntBits(a(c)(d)) ==
        java.lang.Float.floatToIntBits(b(c)(d)),
        s"$what: centroid $c dim $d: ${a(c)(d)} vs ${b(c)(d)}")
  }

  test("trainCentroids is bit-identical to the oracle's training semantics") {
    val emb = Tables(spark, sf, "embeddings")
    val trained = Similarity.trainCentroids(emb, nCells = 16)
    assertBitEqual(trained, replay(sample(), 16, iters = 3), "coarse")
  }

  test("trainPqCodebooks is the same contract per subspace slice") {
    val emb = Tables(spark, sf, "embeddings")
    val m = 8; val ksub = 32; val dsub = dim / m
    val books = Similarity.trainPqCodebooks(emb, m, ksub)
    val s = sample()
    for (j <- 0 until m) {
      val sub = s.map(_.slice(j * dsub, (j + 1) * dsub))
      assertBitEqual(books(j), replay(sub, ksub, iters = 3), s"subspace $j")
    }
  }

  test("trainPqCodebooksResidual trains on (sample − its cell's centroid)") {
    val emb = Tables(spark, sf, "embeddings")
    val m = 8; val ksub = 32; val dsub = dim / m
    val cents = Similarity.trainCentroids(emb, nCells = 16)
    val books = Similarity.trainPqCodebooksResidual(emb, cents, m, ksub)
    val res = sample().map { v =>
      val c = cents(Similarity.nearestCell(v, cents))
      Array.tabulate(v.length)(i => v(i) - c(i)) // per-dim f32 subs
    }
    for (j <- 0 until m) {
      val sub = res.map(_.slice(j * dsub, (j + 1) * dsub))
      assertBitEqual(books(j), replay(sub, ksub, iters = 3),
        s"residual subspace $j")
    }
  }

  test("the probe selection (nearestCells) is the (d2, cell) ranking the oracle uses") {
    val s = sample(64)
    val cents = replay(s, 16, 3)
    s.foreach { v =>
      val got = Similarity.nearestCells(v, cents, 3)
      val want = cents.indices.map { i =>
        var d2 = 0.0
        var d = 0
        while (d < v.length) {
          val diff: Float = v(d) - cents(i)(d)
          d2 += (diff * diff).toDouble; d += 1
        }
        (d2, i)
      }.sorted.take(3).map(_._2)
      assert(got == want, s"probe ranking diverged: $got vs $want")
      assert(Similarity.nearestCell(v, cents) == want.head,
        "nearestCell != rank-1 probe")
    }
  }

  test("oracle texts guard the two DuckDB traps (CTE inlining, DECIMAL literals)") {
    val predOn: String => String = a => s"$a.vec_id < 8"
    val texts = Seq(
      PortableIvf.ivfOracleSql(dim, 10, 16, 3, predOn),
      PortableIvf.ivfOracleSql(dim, 10, 16, 8, predOn, scope = Some("label")),
      PortableIvf.ivfSq8OracleSql(dim, 10, 16, 3, 30, predOn),
      PortableIvf.ivfPqOracleSql(dim, 10, 16, 4, 8, 32, 60, predOn),
      PortableIvf.ivfPqOracleSql(dim, 10, 16, 4, 8, 32, 60, predOn,
        residual = true),
      PortableIvf.mmrOracleSql(dim, 10, 30, predOn))
    texts.foreach { t =>
      // every CTE materialized: un-materialized CTEs re-evaluate the
      // whole training prefix once per reference (2^iters blow-up)
      val bare = "(?m)^\\s*\\w+ AS \\(".r.findAllIn(t).toList
      assert(bare.isEmpty, s"non-materialized CTEs: $bare")
      // no bare float literal with a fractional part: DuckDB parses it
      // as DECIMAL, and decimal subtraction is exact where the JVM's
      // f64 is not (the 1.0 - 0.7 trap)
      val bareFloat = "(?<![\\w.])\\d+\\.\\d+(?!\\d* AS DOUBLE\\))".r
        .findAllIn(t.replace("CAST(0.7 AS DOUBLE)", "")
          .replace("CAST(1.0 AS DOUBLE)", "")
          .replace("127.0", "").replace("0.0", "")).toList
      assert(bareFloat.isEmpty, s"bare float literals: $bareFloat")
    }
  }
}
