package graft

import graft.operators.Retrieval
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkSpec {

  /** Plain-Scala BM25 for tiny corpora — the spec's reference formula. */
  private def bm25Ref(
      corpus: Seq[(Long, String)],
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): Map[Long, (Double, Long)] = {
    val toks = corpus.map { case (id, tx) => id -> tx.trim.split("\\s+").toSeq }
    val n = corpus.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfs = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val perTerm = terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
        (idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)), tf.toLong)
      }
      id -> ((0.0 +: perTerm.map(_._1)).reduceLeft(_ + _), perTerm.map(_._2).sum)
    }.toMap
  }

  test("bm25TopK: ranking matches the reference formula; zero-hit docs excluded") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "fast scan fast scan fast"),
      (2L, "slow table walk"),
      (3L, "fast table scan table"),
      (4L, "nothing relevant here"),
      (5L, "scan"),
      (6L, "fast fast fast fast fast fast fast fast fast fast"))
    val terms = Seq("fast", "table", "scan")
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        Seq("q" -> terms), k = 10, emitScore = true)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)

    val ref = bm25Ref(corpus, terms)
    val expected = ref.toSeq
      .filter(_._2._2 > 0)
      .sortBy { case (id, (s, _)) => (-s, id) }
      .zipWithIndex
      .map { case ((id, (s, h)), i) => (i + 1, id, h, s) }
    assert(got.toSeq == expected)
    assert(!got.map(_._2).contains(4L)) // no query term -> not a candidate
  }

  test("bm25TopK: k truncates per query; multi-query independence") {
    import spark.implicits._
    val corpus = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) s"alpha ${"alpha " * (i.toInt % 5)}end" else "beta beta gamma"))
    val df = corpus.toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df,
      Seq("qa" -> Seq("alpha"), "qb" -> Seq("beta", "gamma")), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.count(_._1 == "qa") == 3)
    assert(out.count(_._1 == "qb") == 3)
    // every qa hit is an even doc, every qb hit odd
    assert(out.filter(_._1 == "qa").forall(_._3 % 2 == 0))
    assert(out.filter(_._1 == "qb").forall(_._3 % 2 == 1))
    // ranks are 1..3 within each query
    assert(out.filter(_._1 == "qa").map(_._2).sorted.toSeq == Seq(1, 2, 3))
    assert(out.filter(_._1 == "qb").map(_._2).sorted.toSeq == Seq(1, 2, 3))
  }

  test("reciprocalRankFusion: doc in both systems outranks single-system docs; missing contributes 0") {
    import spark.implicits._
    val sysA = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3)).toDF("query_id", "doc_id", "rnk")
    val sysB = Seq(("q", 2L, 1), ("q", 4L, 2)).toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.reciprocalRankFusion(Seq("a" -> sysA, "b" -> sysB), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .sortBy(_._1)
    // doc 2: 1/62 + 1/61 wins; then doc 1 (1/61), doc 4 (1/62), doc 3 (1/63)
    val exp = Seq(
      (1, 2L, 1.0 / 62 + 1.0 / 61, 2),
      (2, 1L, 1.0 / 61, 1),
      (3, 4L, 1.0 / 62, 1),
      (4, 3L, 1.0 / 63, 1))
    assert(got.toSeq == exp)
  }

  test("reciprocalRankFusion: mirrored ranks tie and break by doc id") {
    import spark.implicits._
    val sysA = Seq(("q", 10L, 1), ("q", 20L, 2)).toDF("query_id", "doc_id", "rnk")
    val sysB = Seq(("q", 20L, 1), ("q", 10L, 2)).toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.reciprocalRankFusion(Seq("a" -> sysA, "b" -> sysB), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1, 10L), (2, 20L)))
  }

  test("bm25TopK: corpus-absent term gets df=0 idf without error") {
    import spark.implicits._
    val df = Seq((1L, "x y z"), (2L, "x q")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, Seq("q" -> Seq("x", "zzz_absent")), k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // both docs contain x once; shorter doc scores higher
    assert(out.toSeq == Seq((1, 2L, 1L), (2, 1L, 1L)))
  }

  test("tfidfTopTerms: rare terms outrank common ones, term tiebreak, k cap") {
    import spark.implicits._
    // 'rare' df=1, 'both' df=2, 'all' df=3 over N=3 docs
    val docs = Seq(
      (1L, "all both rare rare"),
      (2L, "all both"),
      (3L, "all")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTopTerms(docs, k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rnk"),
        r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
      .sortBy(t => (t._1, t._2)).toSeq
    // doc 1: rare (tf=2, df=1) first, then both (tf=1, df=2)
    assert(out.filter(_._1 == 1L) ==
      Seq((1L, 1, "rare", 2L, 1L), (1L, 2, "both", 1L, 2L)))
    // doc 2: both before all (lower df wins at equal tf)
    assert(out.filter(_._1 == 2L) ==
      Seq((2L, 1, "both", 1L, 2L), (2L, 2, "all", 1L, 3L)))
    // doc 3 has only one term; k=2 does not pad
    assert(out.filter(_._1 == 3L) == Seq((3L, 1, "all", 1L, 3L)))
  }

  test("tfidfTopTerms: equal-score ties break by term ascending") {
    import spark.implicits._
    // identical tf and df for both terms in both docs -> same score;
    // the rank must order alpha < beta deterministically
    val docs = Seq((1L, "beta alpha"), (2L, "alpha beta")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTopTerms(docs, k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rnk"),
        r.getAs[String]("term"))).sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq((1L, 1, "alpha"), (1L, 2, "beta"),
      (2L, 1, "alpha"), (2L, 2, "beta")))
  }

  test("tfidfTopTerms: emitScore column present only on request; empty input") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    assert(!Retrieval.tfidfTopTerms(docs).columns.contains("score"))
    assert(Retrieval.tfidfTopTerms(docs, emitScore = true).columns.contains("score"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Retrieval.tfidfTopTerms(empty).count() == 0)
  }

  test("bm25WithFeedback: expansion recalls docs sharing only feedback terms; mExp=0 = plain bm25") {
    import spark.implicits._
    // doc 1 matches the query and co-occurs with "alpha"; doc 2 contains
    // ONLY "alpha" — invisible to the raw query, reachable after expansion
    val docs = Seq(
      (1L, "needle alpha alpha filler"),
      (2L, "alpha body text here"),
      (3L, "unrelated tokens entirely distinct")).toDF("doc_id", "text")
    val q = Seq("find" -> Seq("needle"))
    val plain = Retrieval.bm25TopK(docs, q, k = 10)
      .collect().map(_.getLong(2)).toSet
    assert(plain == Set(1L)) // only the direct match
    val rm3 = Retrieval.bm25WithFeedback(docs, q, k = 10, kFb = 1, mExp = 1)
      .collect().map(_.getLong(2)).toSet
    // top feedback doc is 1; its most frequent non-query term is "alpha"
    // (tf 2 beats filler's 1); doc 2 now matches through the expansion
    assert(rm3 == Set(1L, 2L))
    // mExp = 0 degenerates to the plain ranking
    val zero = Retrieval.bm25WithFeedback(docs, q, k = 10, kFb = 1, mExp = 0)
      .collect().map(_.getLong(2)).toSet
    assert(zero == plain)
  }


  test("Bm25Fold native expression == the aggregate-HOF reference on edge " +
      "cases (missing term, zero tf, null bag/query elements, null idf)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // bags: normal, missing-term, empty, null-element, null-tf
    val rows = Seq(
      (1L, Seq(("fast", 3L), ("scan", 1L)), 10L),
      (2L, Seq(("slow", 2L)), 3L),
      (3L, Seq.empty[(String, Long)], 7L),
      (4L, Seq(("fast", 5L)), 1L)
    ).toDF("id", "bag0", "dl")
      .withColumn("qtfs", transform(col("bag0"),
        x => struct(x.getField("_1").as("tok"), x.getField("_2").as("tf"))))
    val k1 = 1.2; val b = 0.75; val avgdl = 5.25
    val qarr = array(
      struct(lit(0).as("ti"), lit("fast").as("term"), lit(0.9).as("idf")),
      struct(lit(1).as("ti"), lit("scan").as("term"), lit(1.7).as("idf")),
      struct(lit(2).as("ti"), lit("absent").as("term"), lit(2.5).as("idf")))
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))
    def tfOf(t: org.apache.spark.sql.Column) =
      coalesce(try_element_at(filter(col("qtfs"),
        x => x.getField("tok") === t.getField("term")), lit(1))
        .getField("tf"), lit(0L)).cast("double")
    val hof = aggregate(qarr, struct(lit(0.0).as("s"), lit(0L).as("h")),
      (acc, t) => {
        val tf = tfOf(t)
        struct((acc.getField("s") +
          t.getField("idf") * (tf * lit(k1 + 1.0)) / (tf + norm)).as("s"),
          (acc.getField("h") + tf.cast("long")).as("h"))
      })
    val nat = graft.functions.TextFunctions.bm25Fold(
      col("qtfs"), qarr, norm, k1 + 1.0)
    val out = Seq("id", "hs", "hh", "ns", "nh")
    val both = rows.withColumn("h2", hof).withColumn("n2", nat)
      .select(col("id"), col("h2.s").as("hs"), col("h2.h").as("hh"),
        col("n2.s").as("ns"), col("n2.h").as("nh"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    both.foreach { case (id, hs, hh, ns, nh) =>
      assert(java.lang.Double.doubleToLongBits(hs) ==
        java.lang.Double.doubleToLongBits(ns), s"s mismatch at id=$id")
      assert(hh == nh, s"h mismatch at id=$id")
    }
    // null-poisoning parity: a null idf nulls s from that term on, h keeps
    val qarrNull = array(
      struct(lit(0).as("ti"), lit("fast").as("term"),
        lit(null).cast("double").as("idf")),
      struct(lit(1).as("ti"), lit("scan").as("term"), lit(1.7).as("idf")))
    val hofN = aggregate(qarrNull, struct(lit(0.0).as("s"), lit(0L).as("h")),
      (acc, t) => {
        val tf = tfOf(t)
        struct((acc.getField("s") +
          t.getField("idf") * (tf * lit(k1 + 1.0)) / (tf + norm)).as("s"),
          (acc.getField("h") + tf.cast("long")).as("h"))
      })
    val natN = graft.functions.TextFunctions.bm25Fold(
      col("qtfs"), qarrNull, norm, k1 + 1.0)
    val bothN = rows.withColumn("h2", hofN).withColumn("n2", natN)
      .select(col("id"), col("h2.s").as("hs"), col("h2.h").as("hh"),
        col("n2.s").as("ns"), col("n2.h").as("nh"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getLong(2),
        r.isNullAt(3), r.getLong(4)))
    bothN.foreach { case (id, hNull, hh, nNull, nh) =>
      assert(hNull && nNull, s"null-poison mismatch at id=$id")
      assert(hh == nh, s"h mismatch at id=$id")
    }
  }

  test("rougeN: clipped bigram overlap by hand — repeated-gram min, " +
      "short/null sides define-away to zeros") {
    import spark.implicits._
    val pairs = Seq(
      // cand bigrams {ab, bc, cd}; ref {ab:2, bc, ca} -> match 2 (ab 1+bc 1)
      (1L, "a b c d", "a b c a b"),
      // repeated gram clipping: cand {xx:2}, ref {xx:1} -> match 1
      (2L, "x x x", "x x"),
      // cand too short for a bigram -> all-zero counts AND ratios
      (3L, "solo", "a b c"),
      // null candidate -> zeros, not nulls
      (4L, null.asInstanceOf[String], "a b")).toDF("doc_id", "cand", "text")
    val got = Retrieval.rougeN(pairs, n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val f1a = 2.0 * (2.0 / 3.0) * (2.0 / 4.0) / (2.0 / 3.0 + 2.0 / 4.0)
    assert(got(1L) == ((2L, 3L, 4L, 2.0 / 3.0, 2.0 / 4.0, f1a)))
    assert(got(2L) == ((1L, 2L, 1L, 0.5, 1.0, 2.0 * 0.5 * 1.0 / 1.5)))
    assert(got(3L) == ((0L, 0L, 2L, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((0L, 0L, 1L, 0.0, 0.0, 0.0)))
  }

  test("phraseSearch: adjacency-exact occurrence counts, overlapping hits, 3-word phrases") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a"),   // "a b" at pos 0 and 2
      (2L, "b a b"),       // at pos 1
      (3L, "a a b"),       // at pos 1 (the bag-of-words FP "a...b" at 0 is NOT a hit)
      (4L, "b a"),         // reversed - no hit
      (5L, "c c c"))       // vocabulary miss - no hit
      .toDF("doc_id", "text")
    val two = graft.operators.Retrieval.phraseSearch(d, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // 3-word phrase, overlapping matches count individually
    val three = graft.operators.Retrieval.phraseSearch(d, Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three == Map(1L -> 2L)) // "a b a" at pos 0 and pos 2 overlap
  }
}
