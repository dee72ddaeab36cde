package graft

import graft.operators.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkSpec {

  test("overlap counts distinct shingles hit by any benchmark doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown"+"quick brown fox" with bench
      (2L, "totally novel training text"), // zero overlap
      (3L, "the quick brown fox jumps over the lazy dog"), // superset of doc 1's hits
      (4L, "a b")) // < 3 tokens: no shingles, absent from output
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox ate"),
      (101L, "over the lazy dog indeed"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlap(docs, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 1: shingles {the quick brown, quick brown fox, brown fox jumps} -> 2 hits
    // doc 3: 7 shingles; hits = {the quick brown, quick brown fox, over the lazy, the lazy dog} -> 4
    assert(got.toSeq == Seq((1L, 3L, 2L), (2L, 2L, 0L), (3L, 7L, 4L)))
  }

  test("a fully-contained doc is 100% contaminated; thresholding is one filter") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq((9L, "prefix alpha beta gamma delta suffix")).toDF("doc_id", "text")
    val r = Decontaminate.overlap(docs, bench).first()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }
}
