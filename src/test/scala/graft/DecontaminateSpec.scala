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

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  test("overlapBloom is row-identical to overlap (false positives confirmed away)") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
      (i, s"token$i shared common words plus unique$i tail$i end"))
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 7 === 0)
    val exact = sorted(Decontaminate.overlap(docs, bench))
    // a deliberately tiny, collision-prone bitmap: correctness must hold
    // at ANY fpp because of the exact confirm join
    val sloppy = sorted(Decontaminate.overlapBloom(docs, bench,
      expectedItems = 4L, fpp = 0.5))
    val tuned = sorted(Decontaminate.overlapBloom(docs, bench,
      expectedItems = 10000L, fpp = 0.01))
    assert(sloppy == exact)
    assert(tuned == exact)
  }

  test("overlapBloom with an empty benchmark: all hits zero") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = sorted(Decontaminate.overlapBloom(docs,
      docs.filter($"doc_id" < 0), expectedItems = 10L, fpp = 0.1))
    assert(got == Seq((1L, 2L, 0L)))
  }

  test("overlapBloom rejects bad sizing parameters") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Decontaminate.overlapBloom(docs, docs, expectedItems = 0))
    intercept[IllegalArgumentException](
      Decontaminate.overlapBloom(docs, docs, fpp = 1.0))
  }
}
