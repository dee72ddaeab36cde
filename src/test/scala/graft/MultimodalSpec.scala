package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Multimodal.asMediaTable(
      Seq((1L, "abcdef"), (2L, "x" * 100)).toDF("doc_id", "text"))
  }

  test("payload is the UTF-8 bytes, type tagged, id carried") {
    val r = media.orderBy("doc_id").collect()(0)
    assert(r.getAs[Array[Byte]]("payload").toSeq == "abcdef".getBytes("UTF-8").toSeq)
    assert(r.getAs[String]("media_type") == "image")
  }

  test("decode derives deterministic metadata from payload length") {
    val d = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(d(0).byte_len == 6L && d(0).width == 70 && d(0).height == 106 && d(0).n_frames == 7)
    assert(d(1).byte_len == 100L && d(1).width == 164 && d(1).n_frames == 5)
  }

  test("sampleFrames emits every step-th frame per doc") {
    val f = Multimodal.sampleFrames(media, step = 2).collect()
    val byDoc = f.groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(byDoc(1L) == Seq(0, 2, 4, 6)) // n_frames=7
    assert(byDoc(2L) == Seq(0, 2, 4))    // n_frames=5
  }

  test("resize caps the payload at the pixel budget with strided subsampling") {
    val r = Multimodal.resize(media, width = 4, height = 4).collect().sortBy(_.doc_id)
    assert(r(0).payload.length == 6)  // shorter than 16 -> kept whole
    assert(r(0).payload.toSeq == "abcdef".getBytes("UTF-8").toSeq)
    assert(r(1).payload.length == 16) // 100 bytes -> 4*4 budget
    assert(r(1).width == 4 && r(1).height == 4)
    // independent reimplementation of the stride
    val src = ("x" * 100).getBytes("UTF-8")
    val want = (0 until 16).map(i => src((i * (100.0 / 16)).toInt))
    assert(r(1).payload.toSeq == want)
  }

  test("extractFeatures is deterministic, partition-invariant, in [-1,1)") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 8)
      .collect().sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(_.features.forall(v => v >= -1.0f && v < 1.0f)))
    // independent reimplementation for doc 1 ("abcdef", n=6)
    val src = "abcdef".getBytes("UTF-8")
    val want = (0 until 8).map { j =>
      val b = src(((j.toLong * 2654435761L) % 6).toInt.abs) & 0xff
      (b - 128) / 128.0f
    }
    assert(f1(0).features.toSeq == want)
  }

  // --- RealCodec: actual javax.imageio decode over generated PNG/JPEG ---

  /** A w×h image with a deterministic two-tone pattern, encoded as `fmt`. */
  private def makeImage(w: Int, h: Int, fmt: String, seed: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y + seed) % 2 == 0) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private lazy val realMedia = {
    import spark.implicits._
    Seq(
      (1L, "image", makeImage(12, 8, "png", 0)),
      (2L, "image", makeImage(30, 20, "jpg", 1)),
      (3L, "image", makeImage(5, 5, "bmp", 0)))
      .toDF("doc_id", "media_type", "payload")
  }

  test("RealCodec.decode reads true dimensions from PNG/JPEG/BMP payloads") {
    val d = Multimodal.decode(realMedia, Multimodal.RealCodec).collect().sortBy(_.doc_id)
    assert(d.map(x => (x.doc_id, x.width, x.height, x.n_frames)).toSeq ==
      Seq((1L, 12, 8, 1), (2L, 30, 20, 1), (3L, 5, 5, 1)))
    assert(d.forall(x => x.byte_len > 0))
  }

  test("RealCodec.resize emits a PNG that decodes to exactly the target box") {
    val r = Multimodal.resize(realMedia, width = 7, height = 3, codec = Multimodal.RealCodec)
      .collect().sortBy(_.doc_id)
    assert(r.forall(x => x.width == 7 && x.height == 3))
    for (x <- r) {
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(x.payload))
      assert(back != null && back.getWidth == 7 && back.getHeight == 3,
        s"resized payload of doc ${x.doc_id} is not a 7x3 image")
    }
  }

  test("RealCodec.features are a grayscale strip in [-1,1), deterministic, dedup-compatible") {
    val f1 = Multimodal.extractFeatures(realMedia, dim = 16, codec = Multimodal.RealCodec)
      .collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(realMedia.repartition(5), dim = 16,
        codec = Multimodal.RealCodec).collect().sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length == 16))
    assert(f1.forall(_.features.forall(v => v >= -1.0f && v < 1.0f)))
    // the two-tone checkerboards average mid-gray; a feature strip must not
    // be all-equal to the zero vector (i.e., it actually read pixels)
    assert(f1.exists(_.features.exists(_ != f1.head.features.head)) ||
      f1.head.features.exists(_ != 0f))
  }

  test("RealCodec.sampleFrames: single-frame stills emit frame 0; equal rasters hash equal") {
    import spark.implicits._
    // same raster encoded twice as PNG: compressed bytes may differ, the
    // decoded-pixel hash must not
    val twice = Seq(
      (1L, "image", makeImage(9, 9, "png", 3)),
      (2L, "image", makeImage(9, 9, "png", 3)))
      .toDF("doc_id", "media_type", "payload")
    val f = Multimodal.sampleFrames(twice, step = 1, codec = Multimodal.RealCodec).collect()
    assert(f.map(_.frame_idx).toSeq == Seq(0, 0))
    assert(f.map(_.frame_hash).distinct.length == 1)
  }

  test("processAll (fused, one decode) equals the per-stage composition under both codecs") {
    for ((m, codec) <- Seq((media, Multimodal.StubCodec), (realMedia, Multimodal.RealCodec))) {
      val fused = Multimodal.processAll(m, width = 7, height = 3, dim = 8, codec = codec)
        .collect().sortBy(_.doc_id)
      val dec = Multimodal.decode(m, codec).collect().sortBy(_.doc_id)
      val rz = Multimodal.resize(m, width = 7, height = 3, codec = codec)
        .collect().sortBy(_.doc_id)
      val ft = Multimodal.extractFeatures(m, dim = 8, codec = codec)
        .collect().sortBy(_.doc_id)
      // step larger than any frame count -> exactly frame 0 per doc
      val fh = Multimodal.sampleFrames(m, step = 1000, codec = codec).collect()
        .map(f => f.doc_id -> f.frame_hash).toMap
      assert(fused.map(x => (x.doc_id, x.media_type, x.byte_len, x.width, x.height, x.n_frames))
        .toSeq == dec.map(x => (x.doc_id, x.media_type, x.byte_len, x.width, x.height, x.n_frames)).toSeq)
      assert(fused.map(_.resized.toSeq).toSeq == rz.map(_.payload.toSeq).toSeq)
      assert(fused.map(x => (x.r_width, x.r_height)).forall(_ == (7, 3)))
      assert(fused.map(_.features.toSeq).toSeq == ft.map(_.features.toSeq).toSeq)
      assert(fused.map(x => x.frame_hash).toSeq == fused.map(x => fh(x.doc_id)).toSeq)
    }
  }

  /** A real WAV: `n` frames of silence at `rate` Hz, 16-bit mono PCM. */
  private def makeWav(n: Int, rate: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio reads true sample rate / channels / frame count from WAV payloads") {
    import spark.implicits._
    val audio = Seq(
      (1L, "audio", makeWav(8000, 8000f)),   // 1 s at 8 kHz
      (2L, "audio", makeWav(22050, 44100f))) // 0.5 s at 44.1 kHz
      .toDF("doc_id", "media_type", "payload")
    val d = Multimodal.decodeAudio(audio).collect().sortBy(_.doc_id)
    assert(d.map(x => (x.doc_id, x.sample_rate, x.channels, x.n_frames)).toSeq ==
      Seq((1L, 8000, 1, 8000L), (2L, 44100, 1, 22050L)))
    assert(d(0).duration_ms == 1000.0)
    assert(d(1).duration_ms == 500.0)
  }

  test("audioFeatures: RMS energy envelope of real PCM, silence -> zeros, sine -> A/sqrt(2)") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a full-scale-half sine (A = 16384) for the first half, silence after
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val v = (16384 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong), AudioFileFormat.Type.WAVE, bos)
    val media = Seq((1L, "audio", bos.toByteArray)).toDF("doc_id", "media_type", "payload")

    val f = Multimodal.audioFeatures(media, dim = 8).collect().head.features
    assert(f.length == 8)
    // sine buckets: RMS ~ A/sqrt(2)/32768 ~ 0.3536; silent buckets exactly 0
    val expected = 16384.0 / math.sqrt(2) / 32768.0
    assert(f.take(4).forall(v => math.abs(v - expected) < 0.01), f.toSeq.toString)
    assert(f.drop(4).forall(_ == 0f), f.toSeq.toString)
  }

  test("audioFeatures streams clips larger than its 64 KiB window buffer, identical envelope") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 48000 samples = 96000 PCM bytes: the streaming loop must refill its
    // 65536-byte buffer mid-clip, crossing a read boundary inside the data
    val n = 48000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (12000 * math.sin(2 * math.Pi * 331 * i / 8000.0) +
        7000 * math.sin(2 * math.Pi * 7 * i / 8000.0)).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong), AudioFileFormat.Type.WAVE, bos)
    val media = Seq((1L, "audio", bos.toByteArray)).toDF("doc_id", "media_type", "payload")

    val dim = 8
    val got = Multimodal.audioFeatures(media, dim = dim).collect().head.features
    // buffered reference: same accumulation order and arithmetic over the
    // whole little-endian PCM array -> results must be bit-identical
    val perBucket = math.max(1L, (n.toLong + dim - 1) / dim)
    val sumSq = new Array[Double](dim)
    val counts = new Array[Long](dim)
    for (i <- 0 until n) {
      val s = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
      val b = math.min((dim - 1).toLong, i / perBucket).toInt
      sumSq(b) += s.toDouble * s.toDouble
      counts(b) += 1
    }
    val want = (0 until dim).map(j =>
      if (counts(j) > 0) (math.sqrt(sumSq(j) / counts(j)) / 32768.0).toFloat else 0f)
    assert(got.toSeq == want)
    assert(got.forall(v => v > 0f && v <= 1f)) // every window saw signal
  }

  test("decodeAudio rejects non-audio bytes with a clear error") {
    import spark.implicits._
    val junk = Seq((9L, "audio", "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(junk).collect()
    }
    assert(Option(e.getMessage).exists(_.nonEmpty))
  }

  test("RealCodec rejects an undecodable payload with a clear error") {
    import spark.implicits._
    val junk = Seq((1L, "image", Array[Byte](1, 2, 3, 4))).toDF("doc_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(junk, Multimodal.RealCodec).collect()
    }
    assert(Option(e.getMessage).exists(_.nonEmpty))
  }

  test("synthesizePngs: RealCodec decodes the formula dimensions and the exact pixel polynomial") {
    import spark.implicits._
    val ids = Seq(0L, 20L, 140L).toDF("doc_id")
    val media = Multimodal.synthesizePngs(ids).toDF()
    val got = Multimodal.processAll(media, width = 8, height = 8, dim = 4,
        codec = Multimodal.RealCodec)
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(0L, 20L, 140L)) {
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      assert(got(id).width == w && got(id).height == h && got(id).n_frames == 1)
      // the raster hash RealCodec computes from the DECODED png equals the
      // polynomial over the formula pixels — png round-tripped losslessly
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = ((x * 7 + y * 11 + id) % 256).toInt
        val g = ((x * 13 + y * 3 + 2 * id) % 256).toInt
        val b = ((x + y * 5 + 3 * id) % 256).toInt
        exp = exp * 1000003L + ((r << 16) | (g << 8) | b)
      }
      assert(got(id).frame_hash == exp, s"doc $id raster hash")
    }
  }

  test("features flow into the embedding dedup path (identical payloads pair up)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dup = Multimodal.asMediaTable(
      Seq((1L, "same payload"), (2L, "same payload"), (3L, "different one"))
        .toDF("doc_id", "text"))
    val feats = Multimodal.extractFeatures(dup, dim = 16).toDF()
    val pairs = graft.operators.Dedup.embeddingCosinePairsLsh(
        feats, threshold = 0.999, nPlanes = 4, dim = 16,
        idCol = "doc_id", vecCol = "features")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("dhash: stable across lossless re-encodes (PNG vs BMP of one " +
      "raster), equal formula images collide, stub handles empty") {
    import spark.implicits._
    // one deterministic raster, two encodings — dHash is raster-derived,
    // so the compressed-byte difference must not move a single bit
    val img = new java.awt.image.BufferedImage(
      20, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 14; x <- 0 until 20)
      img.setRGB(x, y, ((x * 37 + y * 11) % 256 << 16) |
        ((x * 5 + y * 3) % 256 << 8) | ((x + y) % 256))
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val hPng = Multimodal.RealCodec.dhash(enc("png"))
    val hBmp = Multimodal.RealCodec.dhash(enc("bmp"))
    assert(hPng == hBmp)
    // equal-seed formula images collide through the whole table op
    val recs = Multimodal.synthesizePngs(Seq(5L, 5L + 0L).toDF("doc_id")
      .unionByName(Seq(7L).toDF("doc_id"))).toDF()
    val hs = Multimodal.dHashes(recs, Multimodal.RealCodec)
      .collect().map(m => m.doc_id -> m.dhash).toMap
    val again = Multimodal.dHashes(
      Multimodal.synthesizePngs(Seq(5L).toDF("doc_id")).toDF(),
      Multimodal.RealCodec).collect().head.dhash
    assert(hs(5L) == again) // deterministic
    // stub: empty payload -> 0, non-empty deterministic
    assert(Multimodal.StubCodec.dhash(Array.empty[Byte]) == 0L)
    val b = Array.tabulate[Byte](100)(i => (i * 7 % 256).toByte)
    assert(Multimodal.StubCodec.dhash(b) == Multimodal.StubCodec.dhash(b.clone()))
  }

  test("energySegments: alternating loud/silent windows split into exact runs") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 6 windows of 16 samples: loud (constant 20000), silent (0), loud,
    // loud, silent, loud-but-short tail (8 samples) -> runs
    // [0,0], [2,3], [5,5]; window 5 is partial but its RMS is still
    // full-amplitude, so the per-window cnt in the integer decision
    // matters (a fixed-length assumption would misclassify it)
    val amp = Seq(20000, 0, 20000, 20000, 0)
    val samples = amp.flatMap(a => Seq.fill(16)(a)) ++ Seq.fill(8)(20000)
    val pcm = new Array[Byte](samples.size * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.size.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val media = Seq((7L, "audio", bos.toByteArray)).toDF("doc_id", "media_type", "payload")
    // threshold 500 milli = rms 0.5 fs = 16384; 20000 > that, 0 below
    val got = Multimodal.energySegments(media, windowSamples = 16,
        thresholdMilli = 500)
      .collect().map(s => (s.seg_idx, s.start_win, s.end_win, s.n_windows,
        s.ssq_total)).sortBy(_._1).toSeq
    val loudW = 16L * 20000L * 20000L
    assert(got == Seq(
      (0L, 0L, 0L, 1L, loudW),
      (1L, 2L, 3L, 2L, 2 * loudW),
      (2L, 5L, 5L, 1L, 8L * 20000L * 20000L)))
    // a lower threshold merges nothing across the true silence
    val all = Multimodal.energySegments(media, windowSamples = 16,
        thresholdMilli = 0)
      .collect().map(s => (s.start_win, s.end_win)).toSeq
    assert(all == Seq((0L, 5L))) // threshold 0: every window active, one run
  }
}
