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
}
