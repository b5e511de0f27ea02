package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (north-star surface): media payloads ride
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition — the Scala shape of a
  * `mapInPandas` batch UDF, with the same contract: model/codec
  * handles initialize once per executor, inputs arrive in batches,
  * output schema is fixed.
  *
  * The image/audio codec libraries are not in this container, so the
  * decode step is a clearly-marked deterministic STUB ([[FakeDecoder]]);
  * the Spark-side plumbing — binary schema, batch iteration,
  * partitioning, output schema — is real and tested, and a codec-backed
  * decoder slots in behind [[MediaDecoder]] unchanged.
  */
object Multimodal {

  /** Decoded metadata of one payload. */
  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Fixed-width feature vector extracted from one payload. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** What a real codec-backed implementation provides. Batched: one
    * call per partition chunk, so codec init/teardown amortizes. */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaMeta]
    def features(batch: Seq[(Long, Array[Byte])], dim: Int): Seq[MediaFeatures]
  }

  /** STUB decoder: pure deterministic functions of the payload bytes.
    * A real implementation would call an image/audio library here. */
  object FakeDecoder extends MediaDecoder {
    def decode(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaMeta] =
      batch.map { case (id, mt, bytes) =>
        val n = bytes.length.toLong
        MediaMeta(id, mt, n,
          width = (n % 1024).toInt + 1,
          height = (n % 768).toInt + 1,
          sample_rate = if (mt == "audio") 16000 else 0,
          n_frames = if (mt == "video") (n % 300).toInt + 1 else 1)
      }

    def features(batch: Seq[(Long, Array[Byte])], dim: Int): Seq[MediaFeatures] =
      batch.map { case (id, bytes) =>
        // positional byte buckets accumulate in exact integer space;
        // the ONE float op is the final /255 normalization. Per-byte
        // f32 accumulation would make the value depend on a chain of
        // float roundings no SQL engine can replay — this form is
        // bit-identical in any IEEE engine (m02's DuckDB oracle
        // recomputes it from the hex bytes), same normalized range.
        val sums = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) {
          sums(i % dim) += (bytes(i) & 0xFF)
          i += 1
        }
        val f = new Array[Float](dim)
        var j = 0
        while (j < dim) { f(j) = sums(j) / 255.0f; j += 1 }
        MediaFeatures(id, f)
      }
  }

  /** Deterministic multimodal frame derived from `documents`: payload =
    * utf-8 text bytes, media_type cycles image/audio/video by doc_id. */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched metadata decode via mapPartitions (the mapInPandas shape). */
  def decodeMeta(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(128).flatMap(decoder.decode))
  }

  /** Batched fixed-width feature extraction. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(128).flatMap(decoder.features(_, dim)))
  }

  /** Average-hash (pHash family) of a payload: 64 positional buckets,
    * bit_i = bucket sum above the global mean — the structure of a real
    * 8×8 average hash, computed on raw bytes because the codec libs are
    * absent (a real impl decodes + downsamples first, then this exact
    * thresholding step runs unchanged). Near-identical payloads differ
    * in few bits → Hamming-bucket joinable. */
  def avgHash64(bytes: Array[Byte]): Long = {
    val sums = new Array[Long](64)
    var i = 0
    while (i < bytes.length) {
      sums(i % 64) += (bytes(i) & 0xFF)
      i += 1
    }
    var total = 0L
    var j = 0
    while (j < 64) { total += sums(j); j += 1 }
    val mean = if (bytes.length == 0) 0L else total / 64
    var out = 0L
    j = 0
    while (j < 64) { if (sums(j) > mean) out |= (1L << j); j += 1 }
    out
  }

  /** doc_id → perceptual hash for image payloads, batched like the
    * decoders above. */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(128).flatMap(_.map { case (id, b) =>
        (id, avgHash64(b))
      }))
      .toDF("doc_id", "phash")
  }

  /** Frame sampling for video payloads: every `stride`-th frame index,
    * declaratively (sequence + filter — no UDF). */
  def sampleFrames(media: DataFrame, stride: Int = 30): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("n_frames", (octet_length(col("payload")) % 300 + 1).cast("int"))
      .withColumn("sampled_frames",
        expr(s"filter(sequence(0, n_frames - 1), i -> i % $stride = 0)"))
      .select(col("doc_id"), col("n_frames"),
        size(col("sampled_frames")).as("n_sampled"),
        element_at(col("sampled_frames"), -1).as("last_frame"))
}
