package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).first().get(0)
  }

  test("tokens splits on whitespace runs like the reference (Operators.java:166)") {
    assert(one(TextFunctions.tokens(col("t")), "  a  b\tc ")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
  }

  test("shingles produce n-grams; short docs yield empty") {
    assert(one(TextFunctions.shingles(col("t"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b c", "b c d"))
    assert(one(TextFunctions.shingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("jaccard of identical sets is 1.0, disjoint is 0.0") {
    import spark.implicits._
    val df = Seq(("x y z", "x y z"), ("a b c", "d e f")).toDF("l", "r")
    val got = df.select(TextFunctions.jaccard(
      TextFunctions.shingleSet(col("l"), 1), TextFunctions.shingleSet(col("r"), 1)))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("langId: stopword argmax with listed-order ties, und when no hits") {
    assert(one(TextFunctions.langId(col("t")), "the cat of the hat is it") == "en")
    assert(one(TextFunctions.langId(col("t")), "el que la de los y") == "es")
    assert(one(TextFunctions.langId(col("t")), "xyzzy plugh") == "und")
    // 'de' is in both es and fr lists; es wins (listed first)
    assert(one(TextFunctions.langId(col("t")), "de") == "es")
  }

  test("quality counts are exact integers") {
    import spark.implicits._
    val cols = TextFunctions.qualityCounts(col("t")).map { case (n, c) => c.as(n) }
    val r = Seq("the cat sat").toDF("t").select(cols: _*).first()
    assert(r.getAs[Long]("n_chars") == 11L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("sum_token_len") == 9L)
    assert(r.getAs[Long]("n_stop") == 1L)
  }

  test("bpe estimate counts alnum runs plus punctuation chars") {
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "a,b c!") == 5)
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "hello world") == 2)
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "don't stop") == 4)
  }
}
