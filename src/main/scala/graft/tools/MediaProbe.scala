package graft.tools

import graft.GraftSession
import graft.operators.Multimodal

/** Measure the cost of chaining the per-stage media operators (each of
  * resize / features / frameHash re-decodes the compressed payload under
  * [[Multimodal.RealCodec]]) against the fused [[Multimodal.processAll]]
  * stage, which decodes once. Synthetic 256×256 PNGs — the probe isolates
  * decode cost, not I/O. */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val nImages = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.local(32, "graft-mediaprobe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def makePng(seed: Int): Array[Byte] = {
      import java.awt.image.BufferedImage
      val img = new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 256) {
        var x = 0
        while (x < 256) {
          img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xffffff); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    // generate ON EXECUTORS, pin the frame so generation cost is excluded
    val media = spark.range(nImages)
      .map(i => (i, "image", makePng(i.toInt)))
      .toDF("doc_id", "media_type", "payload")
      .localCheckpoint(true)
    println(s"[probe] $nImages 256x256 PNGs pinned")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }

    val codec = Multimodal.RealCodec
    for (pass <- 1 to 3) {
      println(s"-- pass $pass")
      time("per-stage chain (3 re-decodes)") {
        val d = Multimodal.decode(media, codec).count()
        val r = Multimodal.resize(media, 224, 224, codec).count()
        val ft = Multimodal.extractFeatures(media, 16, codec).count()
        val fh = Multimodal.sampleFrames(media, step = 1000, codec).count()
        d + r + ft + fh
      }
      time("processAll (fused, 1 decode)") {
        Multimodal.processAll(media, 224, 224, 16, codec).count()
      }
    }
    spark.stop()
  }
}
