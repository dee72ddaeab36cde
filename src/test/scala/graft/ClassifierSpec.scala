package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "y")
  }

  test("hashedBowCounts: token counts per bucket + one bias posting per doc") {
    import spark.implicits._
    val d = Seq((1L, "a a b"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Classifier.hashedBowCounts(d, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc gets its bias row, even empty/null texts
    assert(got.count(_._2 == -1L) == 3)
    assert(got.filter(_._2 == -1L).forall(_._3 == 1L))
    // doc 1: "a" x2 and "b" x1 in their md5 buckets; 2 and 3 have no tokens
    val d1 = got.filter(t => t._1 == 1L && t._2 >= 0L).map(_._3).sorted
    assert(d1.toSeq == Seq(1L, 2L))
    assert(!got.exists(t => t._1 != 1L && t._2 >= 0L))
  }

  test("trainPerceptron: separable corpus converges to 100% and a " +
      "zero-gradient fixed point") {
    // two disjoint vocabularies (the separable twin of the gate's fixture,
    // where lang is independent of text and ~chance is the Bayes rate)
    val d = docs(
      (1L, "good fine nice", 1L), (2L, "good good fine", 1L),
      (3L, "nice fine", 1L), (4L, "bad awful", -1L),
      (5L, "awful awful bad", -1L), (6L, "bad bad", -1L))
    val label = col("y")
    val w5 = Classifier.trainPerceptron(d, label, buckets = 64, epochs = 5)
    val acc = Classifier.marginsUnder(d, w5, label, buckets = 64)
      .agg(sum(when(col("correct"), 1L).otherwise(0L))).collect()(0).getLong(0)
    assert(acc == 6L)
    // once separated, the misclassified set is empty: more epochs are a
    // no-op (weights at 5 == weights at 8)
    val w8 = Classifier.trainPerceptron(d, label, buckets = 64, epochs = 8)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(w5) == m(w8))
  }

  test("trainPerceptron: buckets above maxBuckets fails fast (driver-resident " +
      "weight table), at the bound it trains") {
    val d = docs((1L, "a b", 1L), (2L, "c d", -1L))
    val e = intercept[IllegalArgumentException] {
      Classifier.trainPerceptron(d, col("y"), buckets = 9, epochs = 1, maxBuckets = 8)
    }
    assert(e.getMessage.contains("exceeds maxBuckets"))
    assert(Classifier.trainPerceptron(d, col("y"), buckets = 8, epochs = 1,
      maxBuckets = 8).count() >= 1)
  }

  test("trainPerceptron: epoch-1 gradient is the full label-weighted count " +
      "(all-zero weights misclassify everything)") {
    val d = docs((1L, "t t", 1L), (2L, "t", -1L))
    val w = Classifier.trainPerceptron(d, col("y"), buckets = 4, epochs = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token bucket: +2 (doc1) - 1 (doc2) = 1; bias: +1 - 1 = 0
    assert(w(-1L) == 0L)
    assert(w.values.toSeq.sorted == Seq(0L, 1L))
  }

  test("trainPerceptron: non-±1 labels fail fast") {
    val d = docs((1L, "a", 2L))
    val e = intercept[IllegalArgumentException] {
      Classifier.trainPerceptron(d, col("y"), epochs = 1)
    }
    assert(e.getMessage.contains("must be ±1"))
  }

  test("marginsUnder: exact integer margins on a hand-computed fixture") {
    import spark.implicits._
    val d = docs((1L, "x x y", 1L), (2L, "y", -1L))
    // all weights +3 except bias -1: margin = 3*(n_tokens) - 1
    val posts = Classifier.hashedBowCounts(d, buckets = 8)
    val wdf = posts.select(col("b")).distinct()
      .select(col("b"), when(col("b") === -1L, -1L).otherwise(3L).as("w"))
    val got = Classifier.marginsUnder(d, wdf, col("y"), buckets = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got == Map(1L -> ((8L, true)), 2L -> ((2L, false))))
  }
}
