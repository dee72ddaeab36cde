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
}
