package graft.operators

import graft.functions.VectorFunctions.{chainDot, chainNorm}

/** ENGINE-PORTABLE random-hyperplane LSH geometry — the [[PortableHll]]
  * discipline applied to similarity bucketing: hyperplane signs are
  * derived from md5 of (table, plane, dim) instead of a seeded JVM
  * RNG, and every projection is a LEFT-ASSOCIATED f32 ±chain (the
  * [[graft.functions.VectorFunctions.chainDot]] portability property),
  * so the buckets — and therefore the LSH candidate set — reproduce
  * BIT-IDENTICALLY in DuckDB. That graduates s03 from rows-only to a
  * hash-exact oracle row at its production point (4 tables × 4 planes,
  * multiprobe), the way the portable HLL graduated q16.
  *
  * Sign derivation: hyperplane weight w[t][p][d] = +1 when the high
  * bit of the first md5 byte of the string `"lsh:t:p:d"` is clear,
  * −1 when set — a balanced Rademacher family (random ±1 hyperplanes
  * are a standard sign-random-projection choice; cos-LSH needs only
  * that the directions be random and independent, not Gaussian). md5
  * of a short ASCII literal is a pure function both engines (and this
  * builder) agree on; the signs are EXPANDED INTO THE EXPRESSION TEXT
  * at plan-build time, so at query time neither engine hashes
  * anything — each projection is a 64-term float add/subtract chain,
  * codegen-friendly and constant-foldable.
  *
  * Why ±1 and a chain (not a weights table and a SUM): an aggregate
  * SUM over a joined (plane, dim) weight table has no defined
  * evaluation ORDER, and float addition is not associative — the same
  * rows can legally produce different low bits in the two engines,
  * flipping a sign at the bucket boundary. The ±chain pins the order
  * in the expression itself; both engines evaluate f32 left-assoc
  * adds bit-identically (the s01/s02 precedent).
  *
  * The reference has no similarity search; this is north-star surface
  * (BASELINE.json) made driver-checkable end to end.
  */
object PortableLsh {

  /** Production geometry (s03): 4 independent tables × 4 sign bits. */
  val Tables = 4
  val Planes = 4

  /** +1/−1 from the high bit of md5("lsh:t:p:d")'s first byte. */
  def sign(t: Int, p: Int, d: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"lsh:$t:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((h(0) & 0x80) == 0) 1 else -1
  }

  /** The (t, p) hyperplane as a ±1 float vector — the form the NATIVE
    * fast path dots against ([[graft.functions.ChainDotF32]]):
    * multiplying by ±1.0f is exact, so `chain_dot_f32(v, signVector)`
    * is bit-identical to the ±chain text below (PortableLshSpec pins
    * the equality on the fixture). */
  def signVector(t: Int, p: Int, dim: Int): Seq[Float] =
    (0 until dim).map(d => sign(t, p, d).toFloat)

  /** The (t, p) hyperplane projection of array column `arr` as a
    * left-associated f32 ±chain: `arr[0] - arr[1] + arr[2] …` with
    * signs from [[sign]]. `base` = 0 for Spark, 1 for DuckDB. */
  def projExpr(arr: String, t: Int, p: Int, dim: Int, base: Int): String =
    (0 until dim).map { d =>
      val term = s"$arr[${d + base}]"
      if (d == 0) { if (sign(t, p, 0) > 0) term else s"-$term" }
      else if (sign(t, p, d) > 0) s" + $term"
      else s" - $term"
    }.mkString

  /** One signature BIT as SQL text shared by both engines: '1' when
    * the projection is non-negative. The comparison is exact — the
    * chain's f32 value is bit-identical on both sides, so the bucket
    * bit is too. */
  def bitExpr(arr: String, t: Int, p: Int, dim: Int, base: Int): String =
    s"(CASE WHEN (${projExpr(arr, t, p, dim, base)}) >= 0 " +
      "THEN '1' ELSE '0' END)"

  /** The DuckDB oracle for [[Similarity.lshTopK]] at the SAME
    * geometry: per-vector sign bits (the bits CTE mirrors the Spark
    * projection), corpus home signatures, query home + Hamming-1
    * multiprobe signatures, the signature equi-join, and the
    * chain-exact cosine top-k with (cos DESC, vec_id) tie-break —
    * textually the same chains, hence hash-exact. */
  def oracleSql(dim: Int, k: Int, queryPred: String,
      planes: Int = Planes, tables: Int = Tables): String = {
    val bitCols = (for { t <- 0 until tables; p <- 0 until planes }
      yield s"${bitExpr("embedding", t, p, dim, 1)} AS b_${t}_$p")
      .mkString(",\n          ")
    def homeSig(t: Int) =
      (s"'$t:'" +: (0 until planes).map(p => s"b_${t}_$p"))
        .mkString("concat(", ", ", ")")
    def flipSig(t: Int, b: Int) =
      (s"'$t:'" +: (0 until planes).map(p =>
        if (p == b) s"(CASE WHEN b_${t}_$b = '1' THEN '0' ELSE '1' END)"
        else s"b_${t}_$p")).mkString("concat(", ", ", ")")
    val corpusSigs = (0 until tables).map(homeSig).mkString("[", ", ", "]")
    val probeSigs = (for {
      t <- 0 until tables
      s <- homeSig(t) +: (0 until planes).map(flipSig(t, _))
    } yield s).mkString("[", ", ", "]")
    s"""WITH bits AS (SELECT vec_id, embedding,
          $bitCols
        FROM embeddings),
      cs AS (SELECT vec_id, unnest($corpusSigs) AS sig FROM bits),
      qs AS (SELECT DISTINCT vec_id AS qid, sig FROM (
          SELECT vec_id, unnest($probeSigs) AS sig FROM bits
          WHERE $queryPred)),
      cand AS (SELECT DISTINCT qs.qid, cs.vec_id
        FROM cs JOIN qs ON cs.sig = qs.sig AND cs.vec_id <> qs.qid),
      n AS (SELECT vec_id, embedding, ${chainNorm("embedding", dim, 1)} AS nrm
        FROM embeddings),
      x AS (SELECT c.qid, c.vec_id,
          CAST(${chainDot("qe.embedding", "e.embedding", dim, 1)} AS DOUBLE)
            / (qe.nrm * e.nrm) AS cos
        FROM cand c JOIN n qe ON qe.vec_id = c.qid
          JOIN n e ON e.vec_id = c.vec_id),
      r AS (SELECT qid, vec_id, cos, CAST(row_number() OVER (
          PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank FROM x)
      SELECT qid, vec_id, rank, cos FROM r WHERE rank <= $k
      ORDER BY qid NULLS FIRST, rank NULLS FIRST"""
  }
}
