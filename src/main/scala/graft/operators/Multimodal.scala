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
}
