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
}
