package graft.multimodal

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFrame(Tables(spark, sf, "documents"))

  test("payload is a real binary column carrying the utf-8 bytes") {
    val r = media.select(col("payload"), octet_length(col("payload")).as("n"))
      .limit(1).collect().head
    assert(r.get(0).isInstanceOf[Array[Byte]])
    assert(r.getAs[Array[Byte]]("payload").length == r.getInt(1))
  }

  test("batched decode covers every row with consistent metadata") {
    val metas = Multimodal.decodeMeta(spark, media).collect()
    assert(metas.length == media.count())
    metas.foreach { m =>
      assert(m.width == (m.n_bytes % 1024).toInt + 1)
      assert(m.sample_rate == (if (m.media_type == "audio") 16000 else 0))
      assert(m.n_frames >= 1)
    }
  }

  test("feature extraction emits fixed-width vectors, deterministic") {
    val a = Multimodal.extractFeatures(spark, media, dim = 16).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media, dim = 16).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
  }

  test("frame sampling only applies to video payloads") {
    val out = Multimodal.sampleFrames(media).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      assert(r.getAs[Int]("n_sampled") == (n + 29) / 30)
    }
  }

  test("perceptual-hash near-dup: exact dups always found, pairs sound") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 30000).as("doc_id"), col("text")))
    val hashes = Multimodal.imageHashes(spark, Multimodal.mediaFrame(doubled))
    val pairs = graft.operators.Dedup
      .hammingPairs(hashes, "doc_id", "phash", 6)
      .as[(Long, Long, Int)].collect()
    // every planted duplicate (same payload, id shifted) is a 0-distance
    // pair — identical payloads always share all four hash blocks
    val imageIds = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id").as[Long].collect().toSet
    val planted = imageIds.map(id => (id, id + 30000))
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(zeroPairs),
      s"missing planted dups: ${planted -- zeroPairs}")
    // soundness: reported distance matches a direct recount, and is <= 6
    val hs = hashes.as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b, d) =>
      assert(d == java.lang.Long.bitCount(hs(a) ^ hs(b)) && d <= 6)
    }
  }

  test("avgHash64 flips few bits under a small payload perturbation") {
    val base = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    val tweaked = base.clone(); tweaked(17) = 0; tweaked(1031) = 127
    val d = java.lang.Long.bitCount(
      Multimodal.avgHash64(base) ^ Multimodal.avgHash64(tweaked))
    assert(d <= 6, s"hamming $d after a 2-byte tweak")
    // and a genuinely different payload lands far away
    val other = Array.tabulate[Byte](4096)(i => ((i * 7 + 13) % 97).toByte)
    assert(java.lang.Long.bitCount(
      Multimodal.avgHash64(base) ^ Multimodal.avgHash64(other)) > 6)
  }
}
