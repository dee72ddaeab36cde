package graft

import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  private def simhashOf(text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(Sketches.simhash64(TextFunctions.tokens(col("t")))).first().getLong(0)
  }

  test("simhash is deterministic and near-dup-sensitive") {
    val a = simhashOf("the quick brown fox jumps over the lazy dog again and again")
    val a2 = simhashOf("the quick brown fox jumps over the lazy dog again and again")
    val near = simhashOf("the quick brown fox jumps over the lazy cat again and again")
    val far = simhashOf("completely unrelated words about database partition shuffles")
    assert(a == a2)
    assert(java.lang.Long.bitCount(a ^ near) < java.lang.Long.bitCount(a ^ far))
  }

  test("portable simhash matches an independent md5 reimplementation") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "wörds with ünïcode — and punctuation!",
      "", "   ", "single")
    val got = texts.toDF("t")
      .select(Sketches.simhash64(TextFunctions.tokens(col("t")), portable = true))
      .collect().map(_.getLong(0)).toSeq
    // from scratch: tokens = split(trim, \s+); per-token 60-bit hash = first
    // 15 md5 hex chars; vote per bit; sign -> signature
    def expected(text: String): Long = {
      val toks = text.trim.split("\\s+").toSeq
      val votes = new Array[Int](60)
      for (t <- toks) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(15), 16)
        for (b <- 0 until 60)
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      }
      (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    assert(got == texts.map(expected))
    // the top 4 bits are always clear (60-bit hash)
    assert(got.forall(s => (s >>> 60) == 0L))
  }

  test("minhash signature has length k; identical inputs agree elementwise") {
    import spark.implicits._
    val df = Seq("a b c d e f g h", "a b c d e f g h").toDF("t")
    val sigs = df.select(Sketches.minhashSignature(
      TextFunctions.shingleSet(col("t")), 16)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
  }

  test("minhash estimates jaccard within tolerance on similar sets") {
    import spark.implicits._
    val x = (1 to 100).map(i => s"tok$i").mkString(" ")
    val y = ((1 to 90).map(i => s"tok$i") ++ (101 to 110).map(i => s"tok$i")).mkString(" ")
    // true jaccard of 1-gram sets = 90/110 = 0.818
    val df = Seq((x, y)).toDF("x", "y")
    val Array(sx, sy) = df.select(
      Sketches.minhashSignature(TextFunctions.shingleSet(col("x"), 1), 128),
      Sketches.minhashSignature(TextFunctions.shingleSet(col("y"), 1), 128))
      .first() match { case r => Array(r.getSeq[Long](0), r.getSeq[Long](1)) }
    val est = sx.zip(sy).count { case (a, b) => a == b }.toDouble / 128
    assert(math.abs(est - 0.818) < 0.15, s"estimate $est too far from 0.818")
  }

  test("lshBands: equal signatures collide in every band, disjoint in none") {
    import spark.implicits._
    val df = Seq("p q r s t u v w").toDF("t")
      .select(Sketches.minhashSignature(TextFunctions.shingleSet(col("t"), 1), 8).as("sig"))
    val bands = df.select(Sketches.lshBands(col("sig"), 4, 2).as("b")).first()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(bands.length == 4)
    assert(bands.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
  }

  test("rollingHash is order-sensitive") {
    import spark.implicits._
    val df = Seq(("ab c", "ba c")).toDF("x", "y")
    val r = df.select(Sketches.rollingHash(col("x")), Sketches.rollingHash(col("y"))).first()
    assert(r.getLong(0) != r.getLong(1))
  }

  /** Independent md5-60 reimplementation (mirrors the portable-simhash
    * test's): first 15 md5 hex chars as a long. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("kmvSketch: under k distinct values the sketch IS the distinct hash set") {
    import spark.implicits._
    val vals = Seq("a", "b", "c", "b", "a", "c", "d") // 4 distinct
    val got = vals.toDF("v").agg(Sketches.kmvSketch(col("v"), 16))
      .first().getSeq[Long](0)
    assert(got == vals.distinct.map(h60).sorted)
  }

  test("kmvSketch: bounded at k, equals the k smallest brute-force hashes, merge-invariant") {
    import spark.implicits._
    val vals = (0 until 500).map(i => s"val_$i")
    val expected = vals.map(h60).sorted.take(32)
    val one = vals.toDF("v").coalesce(1)
      .agg(Sketches.kmvSketch(col("v"), 32)).first().getSeq[Long](0)
    // 8 partitions forces the serialize/merge path through partial aggs
    val many = vals.toDF("v").repartition(8)
      .agg(Sketches.kmvSketch(col("v"), 32)).first().getSeq[Long](0)
    assert(one == expected)
    assert(many == expected)
  }

  test("kmvSketch ignores nulls; estimate is exact below k and ~n above") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => s"doc $i") :+ null
    val df = vals.toDF("v")
    val small = df.limit(10).agg(
      Sketches.kmvEstimate(Sketches.kmvSketch(col("v"), 64), 64)).first().getDouble(0)
    assert(small == 10.0) // 10 non-null distinct, under k: exact
    val est = df.agg(
      Sketches.kmvEstimate(Sketches.kmvSketch(col("v"), 64), 64)).first().getDouble(0)
    assert(math.abs(est - 2000) / 2000.0 < 0.35, s"est=$est") // ~1/sqrt(k-2) rel err
  }

  test("kmvMerge of two group sketches equals the sketch of the unioned data") {
    import spark.implicits._
    val a = (0 until 300).map(i => ("a", s"x$i"))
    val b = (150 until 450).map(i => ("b", s"x$i"))
    val df = (a ++ b).toDF("g", "v")
    val merged = df.groupBy("g").agg(Sketches.kmvSketch(col("v"), 24).as("sk"))
      .agg(collect_list(col("sk")).as("sks"))
      .select(Sketches.kmvMerge(element_at(col("sks"), 1), element_at(col("sks"), 2), 24))
      .first().getSeq[Long](0)
    val direct = df.agg(Sketches.kmvSketch(col("v"), 24)).first().getSeq[Long](0)
    assert(merged == direct)
  }
}
