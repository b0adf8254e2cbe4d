package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 G).
  *
  * Media payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode/feature kernels run batched per partition. The actual
  * codec step is STUBBED (this container has no image/audio libraries):
  * `FakeCodec` is deterministic so the plumbing — schema, batching,
  * partitioning, output shape — is fully testable, and a real decoder
  * (JNI/FFmpeg/libvips) drops in behind the same `Codec` trait.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
                       durationMs: Long, codec: String)
  case class MediaBlob(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String,
                           n_frames: Int, features: Array[Float])

  /** The pluggable decode/feature kernel: batch-in, batch-out. */
  trait Codec extends Serializable {
    def decodeBatch(blobs: Iterator[MediaBlob]): Iterator[MediaFeatures]
  }

  /** Deterministic stand-in: features derived from payload bytes via a
    * rolling hash; frame count derived from metadata. Same signature
    * and batch shape as a real codec. */
  object FakeCodec extends Codec {
    def decodeBatch(blobs: Iterator[MediaBlob]): Iterator[MediaFeatures] =
      blobs.map { b =>
        val frames = if (b.meta.durationMs > 0) (b.meta.durationMs / 1000).toInt max 1 else 1
        val feat = new Array[Float](8)
        var h = 1125899906842597L
        var i = 0
        while (i < b.payload.length) {
          h = 31 * h + b.payload(i); i += 1
        }
        var j = 0
        while (j < 8) {
          feat(j) = ((h >>> (j * 8)) & 0xFF).toFloat / 255f; j += 1
        }
        MediaFeatures(b.media_id, b.meta.kind, frames, feat)
      }
  }

  /** G2 — batched feature extraction: one codec invocation per
    * partition (no per-row setup cost), partition count preserved, no
    * shuffle. */
  def extractFeatures(blobs: Dataset[MediaBlob],
                      codec: Codec = FakeCodec): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(it => codec.decodeBatch(it))
  }

  /** G4 — multimodal retrieval composition: decode (G2) → feature
    * vectors → brute-force cosine top-k against a broadcast query set.
    * The media-specific part is only the codec; everything after is the
    * same similarity machinery as E1, which is the point — media
    * retrieval at scale is the embedding pipeline with a decode stage
    * in front. */
  def mediaTopK(blobs: Dataset[MediaBlob], queryIds: Seq[Long], k: Int = 5,
                codec: Codec = FakeCodec): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val s = blobs.sparkSession
    val feats = extractFeatures(blobs, codec).toDF()
      .select(col("media_id"), col("features").cast("array<double>").as("v"))
    val queries = broadcast(
      feats.filter(col("media_id").isin(queryIds: _*))
        .select(col("media_id").as("q_id"), col("v").as("qv")))
    // two-stage per-query top-k over (q_id, media_id, cos) scalars —
    // feature payloads never reach the merge exchange (E1's shape)
    val scored = queries.join(feats, col("q_id") =!= col("media_id"))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine_sim(s, col("qv"), col("v")))
      .select(col("q_id"), col("media_id"), col("cos"))
    graft.operators.Similarity.perQueryTopK(scored, "media_id", k, "rank")
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("media_id").as("neighbor"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** G3 — frame sampling plumbing: pick every `stride`-th frame index
    * up to the frame count (kernel stubbed — indices are what a real
    * sampler would pass to the decoder). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): Dataset[(Long, Seq[Int])] = {
    import features.sparkSession.implicits._
    features.map(f => (f.media_id, (0 until f.n_frames by stride).toSeq))
  }

  /** Deterministic synthetic blob corpus derived from a numeric id
    * range (tests + demos; payload bytes are id-seeded). */
  def syntheticBlobs(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.tabulate[Byte](64)(j => ((i * 131 + j * 7) % 256).toByte)
      MediaBlob(i, MediaMeta(kind, 640, 480, if (kind == "image") 0 else 5000 + i * 100, "fake"),
        payload)
    }
  }
}
