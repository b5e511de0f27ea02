package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.portableSynthEmbedding

/** Pins the md5-derived portable synthetic embedding (the p11 oracle's
  * per-row vector) to the exact f32 BIT PATTERNS that were verified
  * bit-identical against DuckDB's evaluation of
  * [[VectorFunctions.portableSynthEmbeddingSql]] before the p11 row
  * shipped. The driver's p11 hash re-proves the cross-engine claim
  * every round; THIS spec catches an accidental edit to either text
  * generator inside `sbt test`, without a DuckDB run, by failing on
  * the first changed bit. */
class PortableSynthEmbeddingSpec extends SparkSpec {

  // f32 bits of dims 0–3 for ids 0–3, from the verified cross-engine
  // run (Spark and DuckDB agreed on all 16 dims; four per row pin the
  // derivation without bloating the fixture)
  private val Expected = Map(
    0L -> Seq(0x3ee0b496, 0xbeb6a324, 0xbf18e1bb, 0x3cf640a4),
    1L -> Seq(0xbf19e867, 0x3eb6a324, 0xbf2ff7cb, 0x3ef74750),
    2L -> Seq(0x3f1c7913, 0x3f69f09c, 0x3f5d1d3e, 0x3db495ce),
    3L -> Seq(0xbe97db10, 0xbf491b31, 0xbeb6a324, 0x3f26386f))

  test("per-row f32 bits match the cross-engine-verified fixture") {
    val rows = spark.range(4)
      .select(col("id"),
        expr(portableSynthEmbedding("id", 16)).as("emb"))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = r.getSeq[Float](1)
      assert(got.length == 16, s"id $id: dim ${got.length}")
      val bits = got.take(4).map(java.lang.Float.floatToIntBits)
      assert(bits == Expected(id),
        s"id $id bits ${bits.map(_.toHexString)} != fixture " +
          Expected(id).map(_.toHexString))
      // every value lands in the constructed range [-1, 0.996]
      got.foreach(v => assert(v >= -1.0f && v <= 1.0f))
    }
  }

  test("the Spark and DuckDB text generators stay structurally paired") {
    // dim and id column thread into BOTH texts the same way; a drifted
    // dim or id reference is the likeliest silent break
    val sp = portableSynthEmbedding("doc_id", 8)
    val dk = VectorFunctions.portableSynthEmbeddingSql("doc_id", 8)
    assert(sp.contains("'7'") && !sp.contains("'8'"))
    assert(dk.contains(":7'") && !dk.contains(":8'"))
    assert(sp.contains("doc_id") && dk.contains("doc_id"))
  }
}
