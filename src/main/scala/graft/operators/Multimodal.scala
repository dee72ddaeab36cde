package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run as
  * partition-local batch functions (`mapPartitions` over a typed Dataset —
  * the Scala analog of `mapInPandas` batching: one JVM object stream per
  * partition, no per-row driver round-trips, no shuffle).
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): [[StubCodec]] derives deterministic fake dimensions/features
  * from the payload bytes. The Spark-side contract — schema, binary transport,
  * partition batching, explode of variable-length frame output — is real and
  * is what matters at 100 TB (payload bytes never pass through the driver and
  * never get re-encoded between operators).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class DecodedMedia(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  final case class Frame(doc_id: Long, frame_idx: Int, frame_hash: Long)

  /** A resized media row: payload out, payload in — binary-to-binary
    * partition-local transform, the shape a real resampler has. */
  final case class ResizedMedia(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Per-document feature vector extracted from the payload — feeds straight
    * into [[Similarity]] / [[Dedup.embeddingCosinePairsLsh]]. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Deterministic fake decoder — stands in for a real codec (???): every
    * derived field is pure arithmetic on payload length/bytes, so tests and
    * the SQL oracle can verify the pipeline end-to-end. */
  object StubCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      val n = r.payload.length.toLong
      DecodedMedia(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = n,
        width = (64 + n % 1024).toInt,
        height = (64 + (n * 7) % 512).toInt,
        n_frames = (1 + n % 8).toInt)
    }

    /** Fake per-frame content hash: polynomial over the frame's byte slice. */
    def frameHash(payload: Array[Byte], idx: Int): Long = {
      var h = idx.toLong
      var i = idx
      while (i < payload.length) { h = h * 1000003L + (payload(i) & 0xffL); i += math.max(1, payload.length / 16) }
      h
    }

    /** Fake resampler: the output payload is the strided byte subsample that
      * fits the target pixel budget — bytes in, (fewer) bytes out, like a
      * real downscale. Deterministic: output length = min(len, w*h). */
    def resize(r: MediaRecord, w: Int, h: Int): ResizedMedia = {
      val target = math.min(r.payload.length, w * h)
      val out = new Array[Byte](target)
      if (target > 0) {
        val stride = r.payload.length.toDouble / target
        var i = 0
        while (i < target) { out(i) = r.payload((i * stride).toInt); i += 1 }
      }
      ResizedMedia(r.doc_id, r.media_type, out, w, h)
    }

    /** Fake feature extractor: `dim` floats from strided payload bytes, each
      * (byte - 128) / 128 — exactly representable, in [-1, 1). Empty payload
      * -> zero vector. */
    def features(r: MediaRecord, dim: Int): MediaFeatures = {
      val out = new Array[Float](dim)
      val n = r.payload.length
      if (n > 0) {
        var j = 0
        while (j < dim) {
          val b = r.payload(((j.toLong * 2654435761L) % n).toInt.abs) & 0xff
          out(j) = (b - 128) / 128.0f
          j += 1
        }
      }
      MediaFeatures(r.doc_id, out)
    }
  }

  /** Wrap a text table as a media table (test harness: payload = UTF-8 bytes).
    * In production the payload column comes straight from parquet binary. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Decode stage: partition-local batch map (mapInPandas-shaped). */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(StubCodec.decode))
  }

  /** Frame sampling: every `step`-th frame of each decoded video/image burst,
    * exploded to one row per sampled frame. Variable-length generator output —
    * the mapInPandas "N rows in, M rows out" batch shape. */
  def sampleFrames(media: DataFrame, step: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      val d = StubCodec.decode(r)
      (0 until d.n_frames by step).map(i => Frame(r.doc_id, i, StubCodec.frameHash(r.payload, i)))
    })
  }

  /** Resize stage: binary payload in, binary payload out, partition-local.
    * The payload never round-trips the driver and never re-encodes between
    * stages — chain decode/resize/features in one mapPartitions pipeline. */
  def resize(media: DataFrame, width: Int = 224, height: Int = 224): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(StubCodec.resize(_, width, height)))
  }

  /** Feature-extraction stage: payload -> fixed-dim float vector. The output
    * feeds the similarity/dedup operators directly (same `Array[Float]`
    * embedding shape as the embeddings table). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(StubCodec.features(_, dim)))
  }
}
