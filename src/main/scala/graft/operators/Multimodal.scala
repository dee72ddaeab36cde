package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run as
  * partition-local batch functions (`mapPartitions` over a typed Dataset —
  * the Scala analog of `mapInPandas` batching: one JVM object stream per
  * partition, no per-row driver round-trips, no shuffle).
  *
  * The codec is pluggable ([[MediaCodec]]): [[RealCodec]] decodes actual
  * PNG/JPEG/GIF/BMP payloads with `javax.imageio` (JDK-only, zero added
  * dependencies); [[StubCodec]] derives deterministic fake
  * dimensions/features from the payload bytes — it remains the DEFAULT
  * because its pure arithmetic is what the SQL correctness oracle can
  * reproduce (audio/video codecs aren't in this environment, so beyond
  * still images the stub is also the stand-in). The Spark-side contract —
  * schema, binary transport, partition batching, explode of variable-length
  * frame output — is identical under either codec and is what matters at
  * 100 TB (payload bytes never pass through the driver and never get
  * re-encoded between operators).
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

  /** Everything the per-stage pipeline derives, from ONE decode: metadata,
    * the resized payload, the feature vector and the frame-0 content hash.
    * Output row of [[processAll]]. */
  final case class MediaAll(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      resized: Array[Byte],
      r_width: Int,
      r_height: Int,
      features: Array[Float],
      frame_hash: Long)

  /** The codec contract every pipeline stage is generic over. Implementations
    * must be serializable singletons/values — they ride into mapPartitions
    * closures. */
  trait MediaCodec extends Serializable {
    def decode(r: MediaRecord): DecodedMedia
    def frameHash(payload: Array[Byte], idx: Int): Long
    def resize(r: MediaRecord, w: Int, h: Int): ResizedMedia
    def features(r: MediaRecord, dim: Int): MediaFeatures

    /** 64-bit perceptual DIFFERENCE HASH (dHash) of frame 0 — the
      * image-dedup fingerprint: bit (y·8+x) is set iff the sampled
      * luminance brightens left-to-right at grid cell (x, y) of a 9×8
      * nearest-neighbor sample. Unlike [[frameHash]] (equal rasters ⇒
      * equal hash, one pixel flips everything), dHash is STABLE under
      * re-encoding, mild resizing, and brightness shifts — hamming
      * distance on it is the standard near-duplicate image signal. */
    def dhash(payload: Array[Byte]): Long

    /** Fused stage: every per-stage output in one call, CONTRACTUALLY equal
      * to composing the four methods above. The default just composes them
      * (right for [[StubCodec]], whose "decode" is free arithmetic); codecs
      * with a real decode cost override it to decode once — see
      * [[RealCodec.all]]. */
    def all(r: MediaRecord, w: Int, h: Int, dim: Int): MediaAll = {
      val d = decode(r)
      val rz = resize(r, w, h)
      val ft = features(r, dim)
      MediaAll(r.doc_id, r.media_type, d.byte_len, d.width, d.height, d.n_frames,
        rz.payload, rz.width, rz.height, ft.features, frameHash(r.payload, 0))
    }
  }

  /** Deterministic fake decoder — stands in for the codecs this environment
    * lacks (audio/video): every derived field is pure arithmetic on payload
    * length/bytes, so tests and the SQL oracle can verify the pipeline
    * end-to-end. Default codec for the oracle-gated q_media_* queries. */
  object StubCodec extends MediaCodec {
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

    /** Fake dHash: the 9×8 "luminance" grid samples payload bytes by the
      * [[features]] stride trick (byte at (k·2654435761) mod n for grid
      * cell k), gradient bits over it — the real operator's exact shape
      * with arithmetic a SQL oracle can replay. Empty payload -> 0. */
    def dhash(payload: Array[Byte]): Long = {
      val n = payload.length
      if (n == 0) return 0L
      def gray(k: Int): Int = payload(((k.toLong * 2654435761L) % n).toInt.abs) & 0xff
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(y * 9 + x + 1) > gray(y * 9 + x)) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      hash
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

  /** Real still-image codec on `javax.imageio` (in the JDK — PNG, JPEG, GIF,
    * BMP; no added dependencies). Decode reads only the header for
    * dimensions and counts frames through the reader (animated GIFs are
    * multi-frame); resize is a bilinear raster scale re-encoded as PNG;
    * features are a dim×1 grayscale thumbnail normalized to [-1, 1) — the
    * classic cheap perceptual embedding, directly consumable by the
    * similarity/dedup operators; frameHash is a polynomial over the decoded
    * frame's pixels (codec-stable: equal rasters hash equal even if the
    * compressed bytes differ). An undecodable payload throws
    * `IllegalArgumentException` — wrap with your skip/fail policy upstream
    * when corrupt rows are expected. */
  object RealCodec extends MediaCodec {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    def decode(r: MediaRecord): DecodedMedia = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"undecodable image payload (doc ${r.doc_id})")
        val reader = readers.next()
        reader.setInput(iis, false, true) // random access: frame counting needs it
        try {
          val n = try reader.getNumImages(true) catch { case _: java.io.IOException => 1 }
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            reader.getWidth(0), reader.getHeight(0), math.max(n, 1))
        } finally reader.dispose()
      } finally iis.close()
    }

    def frameHash(payload: Array[Byte], idx: Int): Long =
      rasterHash(readFrame(payload, idx), idx)

    def resize(r: MediaRecord, w: Int, h: Int): ResizedMedia =
      ResizedMedia(r.doc_id, r.media_type, encodePng(scaled(readFrame(r.payload, 0), w, h)), w, h)

    def features(r: MediaRecord, dim: Int): MediaFeatures =
      MediaFeatures(r.doc_id, stripFeatures(readFrame(r.payload, 0), dim))

    /** Real dHash over the decoded frame-0 raster: NEAREST-NEIGHBOR 9×8
      * sampling (px = x·w/9, py = y·h/8 in integer division — not the
      * bilinear [[scaled]], whose kernel no SQL oracle could replay),
      * integer ITU-R 601 luminance (299r + 587g + 114b)/1000, gradient
      * bits left-to-right. Works for any w, h ≥ 1 (the sample index never
      * reaches w). */
    def dhash(payload: Array[Byte]): Long = {
      val img = readFrame(payload, 0)
      val w = img.getWidth
      val h = img.getHeight
      def gray(px: Int, py: Int): Int = {
        val rgb = img.getRGB(px, py)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
      var hash = 0L
      var y = 0
      while (y < 8) {
        val py = y * h / 8
        var x = 0
        while (x < 8) {
          if (gray((x + 1) * w / 9, py) > gray(x * w / 9, py))
            hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      hash
    }

    /** Fused override: ONE reader session decodes frame 0 once and derives
      * all four per-stage outputs from that raster — a decode→resize→
      * features→hash chain through the per-stage methods decodes the same
      * compressed payload three times (the decode itself is header-only).
      * Identical results by construction: the helpers ([[rasterHash]],
      * [[stripFeatures]], [[scaled]]+[[encodePng]]) are the SAME code the
      * per-stage methods run, spec-pinned in MultimodalSpec. */
    override def all(r: MediaRecord, w: Int, h: Int, dim: Int): MediaAll = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"undecodable image payload (doc ${r.doc_id})")
        val reader = readers.next()
        reader.setInput(iis, false, true)
        val (headW, headH, n, img) =
          try {
            val n = try reader.getNumImages(true) catch { case _: java.io.IOException => 1 }
            (reader.getWidth(0), reader.getHeight(0), math.max(n, 1), reader.read(0))
          } finally reader.dispose()
        MediaAll(r.doc_id, r.media_type, r.payload.length.toLong,
          headW, headH, n,
          encodePng(scaled(img, w, h)), w, h,
          stripFeatures(img, dim), rasterHash(img, 0))
      } finally iis.close()
    }

    private def rasterHash(img: BufferedImage, idx: Int): Long = {
      var h = idx.toLong
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { h = h * 1000003L + (img.getRGB(x, y) & 0xffffff); x += 1 }
        y += 1
      }
      h
    }

    private def stripFeatures(img: BufferedImage, dim: Int): Array[Float] = {
      val strip = scaled(img, dim, 1)
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        val rgb = strip.getRGB(j, 0)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        out(j) = (gray - 128) / 128.0f
        j += 1
      }
      out
    }

    private def readFrame(payload: Array[Byte], idx: Int): BufferedImage = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable image payload")
        val reader = readers.next()
        reader.setInput(iis)
        try reader.read(idx) finally reader.dispose()
      } finally iis.close()
    }

    private def scaled(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    private def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** A decoded audio row: the typed metadata an audio curation pass filters
    * on (sample-rate floors, duration buckets, mono/stereo splits). */
  final case class DecodedAudio(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Double)

  /** Real audio header decode via `javax.sound.sampled` (in the JDK — WAV,
    * AIFF, AU; no added dependencies, mirroring [[RealCodec]] for still
    * images). Header-only: the PCM payload is never decompressed, so the
    * per-row cost is a few hundred bytes of parsing regardless of clip
    * length. Same mapPartitions batch shape as the other stages — payload
    * bytes stay on executors. An unparseable payload throws
    * `IllegalArgumentException`; wrap with your skip/fail policy upstream
    * when corrupt rows are expected. */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      import javax.sound.sampled.AudioSystem
      val in = new java.io.ByteArrayInputStream(r.payload)
      val fmt =
        try AudioSystem.getAudioFileFormat(in)
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"unparseable audio payload (doc ${r.doc_id})", e)
        }
      val af = fmt.getFormat
      val frames = fmt.getFrameLength.toLong
      DecodedAudio(
        doc_id = r.doc_id,
        sample_rate = af.getSampleRate.toInt,
        channels = af.getChannels,
        n_frames = frames,
        duration_ms = if (af.getSampleRate > 0) frames * 1000.0 / af.getSampleRate else 0.0)
    })
  }

  /** Real PCM feature extraction: the clip is decoded (JDK sound API),
    * split into `dim` equal windows, and each window contributes its RMS
    * energy normalized to [0, 1] — the cheap audio embedding (an energy
    * envelope) that feeds [[Similarity]] / [[Dedup.embeddingCosinePairsLsh]]
    * exactly like the image features. Requires 16-bit PCM (the common WAV
    * case); mono/stereo both work (channels are interleaved into the same
    * energy estimate). Unlike [[decodeAudio]] this DOES read the samples —
    * cost ∝ clip length, still partition-local. The decoded stream is
    * consumed through a fixed 64 KiB window buffer, NOT buffered whole: the
    * working set beyond the (already in-memory) compressed payload is
    * O(window) even for a multi-hour clip whose decoded PCM would not fit
    * a task. Window sizing comes from the container's frame count; a
    * header that doesn't declare one (never WAV/AIFF/AU, whose headers do)
    * falls back to buffering the decoded stream. */
  def audioFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      import javax.sound.sampled.AudioSystem
      val ais =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(r.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"unparseable audio payload (doc ${r.doc_id})", e)
        }
      val af = ais.getFormat
      require(af.getSampleSizeInBits == 16,
        s"audioFeatures expects 16-bit PCM, got ${af.getSampleSizeInBits}-bit (doc ${r.doc_id})")
      val declared = ais.getFrameLength // header frame count; bucket sizing
      val stream: java.io.InputStream =
        if (declared > 0) ais
        else new java.io.ByteArrayInputStream(ais.readAllBytes())
      val nSamples: Long =
        if (declared > 0) declared * af.getChannels
        else stream.available().toLong / 2
      val out = new Array[Float](dim)
      if (nSamples > 0) {
        val perBucket = math.max(1L, (nSamples + dim - 1) / dim)
        val sumSq = new Array[Double](dim)
        val counts = new Array[Long](dim)
        // AudioInputStream.read delivers WHOLE frames, so a frame-aligned
        // buffer (65536 = lcm of 2- and 4-byte frames × many) never splits
        // a 16-bit sample across reads — no carry byte needed
        val buf = new Array[Byte](1 << 16)
        val big = af.isBigEndian
        var i = 0L // global sample index
        var read = stream.read(buf)
        while (read > 0) {
          var p = 0
          while (p + 1 < read) {
            // reassemble the 16-bit pattern, reinterpret signed via toShort
            val s =
              (if (big) ((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff)
               else ((buf(p + 1) & 0xff) << 8) | (buf(p) & 0xff)).toShort
            val b = math.min((dim - 1).toLong, i / perBucket).toInt
            sumSq(b) += s.toDouble * s.toDouble
            counts(b) += 1
            i += 1
            p += 2
          }
          read = stream.read(buf)
        }
        var j = 0
        while (j < dim) {
          if (counts(j) > 0)
            out(j) = (math.sqrt(sumSq(j) / counts(j)) / 32768.0).toFloat
          j += 1
        }
      }
      MediaFeatures(r.doc_id, out)
    })
  }

  /** One active-energy run of an audio clip: windows [start_win, end_win]
    * all at/above the threshold, with the exact integer Σs² over the
    * run. */
  final case class AudioSegment(
      doc_id: Long,
      seg_idx: Long,
      start_win: Long,
      end_win: Long,
      n_windows: Long,
      ssq_total: Long)

  /** VAD-style ENERGY SEGMENTATION — the speech/silence splitter a
    * large-scale audio-training pipeline runs right after ingest (cut
    * clips to voiced runs before the expensive transcribe/embed stages):
    * the decoded PCM is cut into fixed `windowSamples`-sample windows,
    * a window is ACTIVE when its RMS (as a fraction of full scale)
    * meets `thresholdMilli`/1000, and maximal runs of active windows
    * emit one segment row each, with the exact integer Σs² energy.
    *
    * Engine-portable: the activity test is the cross-multiplied INTEGER
    * inequality ssq·10⁶ ≥ θ²·32768²·cnt — no float enters the decision
    * (the [[graft.operators.EventSignals.abLift]] significance
    * discipline applied to signal processing), so segment boundaries
    * replay exactly in the oracle. Same decode contract as
    * [[audioFeatures]]: 16-bit PCM, O(buffer) working set, payloads
    * never leave executors; the run detection is a per-clip sequential
    * fold inside the same partition-local pass — no shuffle at all, the
    * ideal 100 TB shape (cost ∝ bytes scanned, perfectly parallel). */
  def energySegments(
      media: DataFrame,
      windowSamples: Int = 16,
      thresholdMilli: Int = 500): Dataset[AudioSegment] = {
    require(windowSamples >= 1 && windowSamples <= 4096,
      s"windowSamples in [1, 4096] (keeps ssq*10^6 in a long): $windowSamples")
    require(thresholdMilli >= 0 && thresholdMilli <= 1000,
      s"thresholdMilli in [0, 1000]: $thresholdMilli")
    val spark = media.sparkSession
    import spark.implicits._
    val thrNum = thresholdMilli.toLong * thresholdMilli * 32768L * 32768L
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      import javax.sound.sampled.AudioSystem
      val ais =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(r.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"unparseable audio payload (doc ${r.doc_id})", e)
        }
      val af = ais.getFormat
      require(af.getSampleSizeInBits == 16,
        s"energySegments expects 16-bit PCM, got ${af.getSampleSizeInBits}-bit (doc ${r.doc_id})")
      val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
      var win = 0L; var ssq = 0L; var cnt = 0L
      var segStart = -1L; var segSsq = 0L; var lastActiveWin = -2L
      def closeSegment(): Unit = if (segStart >= 0) {
        segs += AudioSegment(r.doc_id, segs.size.toLong, segStart,
          lastActiveWin, lastActiveWin - segStart + 1, segSsq)
        segStart = -1L; segSsq = 0L
      }
      def closeWindow(): Unit = if (cnt > 0) {
        // integer decision: rms >= theta  <=>  ssq*10^6 >= theta^2*2^30*cnt
        val active = ssq * 1000000L >= thrNum * cnt
        if (active) {
          if (segStart < 0) segStart = win
          segSsq += ssq
          lastActiveWin = win
        } else closeSegment()
        ssq = 0L; cnt = 0L
      }
      val buf = new Array[Byte](1 << 16)
      val big = af.isBigEndian
      var i = 0L
      var read = ais.read(buf)
      while (read > 0) {
        var p = 0
        while (p + 1 < read) {
          val s =
            (if (big) ((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff)
             else ((buf(p + 1) & 0xff) << 8) | (buf(p) & 0xff)).toShort
          val w = i / windowSamples
          if (w != win) { closeWindow(); win = w }
          ssq += s.toLong * s; cnt += 1
          i += 1
          p += 2
        }
        read = ais.read(buf)
      }
      closeWindow(); closeSegment()
      segs
    })
  }

  /** Deterministic formula-pixel PNGs — the [[RealCodec]] correctness
    * gate's input generator. Image (8 + id % 9) × (8 + id % 7); pixel
    * (x, y) of doc d is explicit integer arithmetic (r = (7x + 11y + d)
    * mod 256, g = (13x + 3y + 2d) mod 256, b = (x + 5y + 3d) mod 256).
    * PNG is lossless 24-bit RGB, so the DECODED raster — and therefore
    * RealCodec's header dimensions and frame-0 rasterHash — is exactly
    * predictable by the SQL oracle with no image library on that side.
    * Encode runs partition-local on executors (payload bytes never touch
    * the driver), the same shape a pipeline materializing derived
    * thumbnails has. */
  def synthesizePngs(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 7 + y * 11 + id) % 256).toInt
          val g = ((x * 13 + y * 3 + 2 * id) % 256).toInt
          val b = ((x + y * 5 + 3 * id) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRecord(id, "image", bos.toByteArray)
    })
  }

  /** Deterministic formula-PCM WAVs — the audio correctness gate's input
    * generator, the [[synthesizePngs]] recipe for sound. Clip of doc d:
    * sample rate 8000 + (d mod 5)·1000, channels 1 + (d mod 2), frames
    * 64 + (d mod 41); interleaved 16-bit sample i is the explicit integer
    * ((37·i + 101·d) mod 65536) − 32768. WAV is lossless PCM, so
    * [[decodeAudio]]'s header fields and [[audioFeatures]]'s windowed RMS
    * energies are exactly predictable by a SQL oracle with no audio
    * library on that side (integer Σs² stays under 2^53, and every float
    * op after it — divide, sqrt, ÷2^15, double→float — is one correctly
    * rounded IEEE step both engines replay identically). Encode runs
    * partition-local on executors via the JDK's own WAV writer, the codec
    * [[decodeAudio]] parses back. */
  def synthesizeWavs(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRecord] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val rate = (8000 + (id % 5) * 1000).toInt
      val channels = (1 + (id % 2)).toInt
      val frames = (64 + (id % 41)).toInt
      val n = frames * channels
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = ((i.toLong * 37 + id * 101) % 65536 - 32768).toShort
        pcm(2 * i) = (s & 0xff).toByte // little-endian, the WAV byte order
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      MediaRecord(id, "audio", bos.toByteArray)
    })
  }

  /** Wrap a text table as a media table (test harness: payload = UTF-8 bytes).
    * In production the payload column comes straight from parquet binary. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Decode stage: partition-local batch map (mapInPandas-shaped). */
  def decode(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(codec.decode))
  }

  /** Per-document perceptual hash row — [[MediaCodec.dhash]] lifted to the
    * table: the image-dedup fingerprint pass (group or hamming-bucket the
    * hashes downstream exactly like the text SimHash family). */
  final case class MediaHash(doc_id: Long, dhash: Long)
  def dHashes(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(r => MediaHash(r.doc_id, codec.dhash(r.payload))))
  }

  /** Frame sampling: every `step`-th frame of each decoded video/image burst,
    * exploded to one row per sampled frame. Variable-length generator output —
    * the mapInPandas "N rows in, M rows out" batch shape. */
  def sampleFrames(media: DataFrame, step: Int = 2,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      val d = codec.decode(r)
      (0 until d.n_frames by step).map(i => Frame(r.doc_id, i, codec.frameHash(r.payload, i)))
    })
  }

  /** Resize stage: binary payload in, binary payload out, partition-local.
    * The payload never round-trips the driver and never re-encodes between
    * stages — chain decode/resize/features in one mapPartitions pipeline. */
  def resize(media: DataFrame, width: Int = 224, height: Int = 224,
      codec: MediaCodec = StubCodec): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(codec.resize(_, width, height)))
  }

  /** Feature-extraction stage: payload -> fixed-dim float vector. The output
    * feeds the similarity/dedup operators directly (same `Array[Float]`
    * embedding shape as the embeddings table). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(codec.features(_, dim)))
  }

  /** The fused media stage: metadata + resized payload + features + frame-0
    * hash in ONE mapPartitions pass over the payload ([[MediaCodec.all]]) —
    * what a real curation pipeline runs instead of chaining
    * [[decode]]/[[resize]]/[[extractFeatures]]/[[sampleFrames]], which
    * under [[RealCodec]] decompresses every image three times and under any
    * codec scans the binary column once per stage. Results are contractually
    * identical to the per-stage composition (spec-pinned). */
  def processAll(media: DataFrame, width: Int = 224, height: Int = 224,
      dim: Int = 16, codec: MediaCodec = StubCodec): Dataset[MediaAll] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(codec.all(_, width, height, dim)))
  }
}
