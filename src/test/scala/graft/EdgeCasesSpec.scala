package graft

import graft.operators.{Curation, Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty and degenerate inputs: every operator must return an empty (or
  * schema-correct) result, never throw — at 100 TB a partition-pruned scan
  * routinely yields zero rows. */
class EdgeCasesSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.DataFrame
  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }
  private def emptyEmb: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  }

  test("dedup operators return empty on empty input") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, 0.5).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, 0.5, maxShingleDf = Some(3)).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, 0.5).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, portable = true).count() == 0)
    assert(Dedup.embeddingCosinePairs(emptyEmb, 0.5).count() == 0)
    assert(Dedup.embeddingCosinePairsLsh(emptyEmb, 0.5).count() == 0)
  }

  test("similarity operators return empty on empty corpus/queries") {
    import spark.implicits._
    val q = Seq((1L, Array.fill(64)(0.5f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emptyEmb, emptyEmb, 5).count() == 0)
    assert(Similarity.bruteForceTopK(q, emptyEmb, 5).count() == 0)
    assert(Similarity.annLsh(q, emptyEmb, 5).count() == 0)
    assert(Similarity.annIvf(q, emptyEmb, 5).count() == 0)
  }

  test("cluster resolution handles empty and no-op pair sets") {
    import spark.implicits._
    val emptyPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(graft.operators.Dedup.clusters(emptyPairs).count() == 0)
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    // no pairs -> every doc survives untouched
    assert(graft.operators.Dedup.survivors(docs, emptyPairs).count() == 2)
  }

  test("round-7 operators handle empty and degenerate input") {
    import spark.implicits._
    val emptyEvents = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "ts")
    val someEvents = Seq((1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")

    assert(graft.operators.Funnel.sessionize(emptyEvents).count() == 0)
    assert(graft.operators.Funnel.sessionize(someEvents).count() == 1)

    // as-of: empty right -> all left rows, null matches; empty left -> empty
    val asofEmptyRight = graft.operators.AsOfJoin.asofJoin(
      someEvents, emptyEvents.withColumn("v", lit(1.0)), Seq("user_id"),
      rightValueCols = Seq("v"))
    assert(asofEmptyRight.count() == 1 && asofEmptyRight.first().isNullAt(3))
    assert(graft.operators.AsOfJoin.asofJoin(
      emptyEvents, someEvents.withColumn("v", lit(1.0)), Seq("user_id"),
      rightValueCols = Seq("v")).count() == 0)

    // decontamination: empty benchmark -> zero hits, full shingle counts
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val d = graft.operators.Decontaminate.overlap(docs, emptyDocs).first()
    assert(d.getLong(1) == 2L && d.getLong(2) == 0L)
    assert(graft.operators.Decontaminate.overlap(emptyDocs, docs).count() == 0)

    // star contraction: empty edges, pure self-loops
    assert(Dedup.starContraction(emptyDocs.toDF("a_id", "text")
      .select(col("a_id"), col("a_id").as("b_id"))).count() == 0)
    val selfOnly = Seq((5L, 5L)).toDF("a_id", "b_id")
    assert(Dedup.starContraction(selfOnly).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 5L)))

    // containment, redaction, repetition over empty docs
    assert(Dedup.ngramContainmentPairs(emptyDocs, 0.5).count() == 0)
    import graft.functions.TextFunctions
    assert(emptyDocs.select(TextFunctions.redactPii(col("text"))).count() == 0)
    assert(emptyDocs.select(TextFunctions.topBigramFraction(col("text"))).count() == 0)
  }

  test("round-8 operators: tolerance 0, hot-key cap boundary, empty inputs") {
    import spark.implicits._
    // tolerance 0: ONLY same-instant matches survive, in both forms
    val l = Seq((1L, 10L), (1L, 11L)).toDF("k", "ts")
    val r = Seq((1L, 10L, "x")).toDF("k", "ts", "v")
    for (df <- Seq(
        graft.operators.AsOfJoin.asofJoin(l, r, Seq("k"), tolerance = Some(0L)),
        graft.operators.AsOfJoin.asofJoinStreamStatic(l, r, Seq("k"), tolerance = Some(0L)))) {
      val got = df.select("ts", "asof_v").collect()
        .map(x => (x.getLong(0), Option(x.getString(1)))).sorted.toSeq
      assert(got == Seq((10L, Some("x")), (11L, None)))
    }
    // hot-key cap: exactly maxRows rows survive; maxRows+1 drops
    val at = (1 to 5).map(i => (1L, i)) ++ (1 to 6).map(i => (2L, i))
    val capped = graft.ops.Skew.dropHotKeys(at.toDF("k", "v"), Seq("k"), maxRows = 5L)
    assert(capped.select("k").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // empty inputs flow through the new ops
    val emptyD = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.dropExistingIn(emptyD, emptyD).count() == 0)
    assert(graft.ops.Skew.dropHotKeys(emptyD, Seq("doc_id"), 1L).count() == 0)
    // dropExistingIn with an empty corpus keeps everything
    val d2 = Seq((1L, "t")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.dropExistingIn(d2, emptyD).count() == 1)
  }

  test("curation and multimodal handle empty input") {
    assert(Curation.withSplit(emptyDocs, "doc_id", Seq("a" -> 1.0)).count() == 0)
    assert(Curation.sampleFraction(emptyDocs, "doc_id", 0.5).count() == 0)
    assert(Curation.mixtureSample(emptyDocs.withColumn("source", col("text")),
      "doc_id", "source", Seq("a" -> 0.5)).count() == 0)
    assert(Curation.tokenBudget(emptyDocs, Seq(col("doc_id"))).count() == 0)
    assert(Curation.profile(emptyDocs, Seq("text")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq == Seq((0L, 0L, 0L)))
    assert(Multimodal.decode(Multimodal.asMediaTable(emptyDocs)).count() == 0)
    assert(Multimodal.extractFeatures(Multimodal.asMediaTable(emptyDocs)).count() == 0)
  }

  test("round-10 operators: null text/weight, empty input, single-token docs") {
    import spark.implicits._
    assert(Curation.bigramRarity(emptyDocs).count() == 0)
    assert(Curation.sampleWeighted(emptyDocs.withColumn("w", lit(1L)),
      "doc_id", "w", 0.5).count() == 0)
    // null text and single-token docs have no transitions -> absent, like
    // the DuckDB oracle's unnest of an empty/null bigram list
    val docs = Seq((1L, "a b"), (2L, null: String), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val ids = Curation.bigramRarity(docs).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
    // null weight rows drop (comparison is null), like the oracle's WHERE
    val w = Seq((1L, Some(1000000L)), (2L, None)).toDF("doc_id", "w")
    assert(Curation.sampleWeighted(w, "doc_id", "w", 1.0)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("round-11 operators: empty input, null token counts, ascending-boundary guard") {
    import spark.implicits._
    val emptyIds = spark.emptyDataset[Long].toDF("id")
    assert(Curation.sampleNGlobal(emptyIds, "id", 10).count() == 0)
    assert(Curation.lengthBucketBatches(
      emptyIds.withColumn("n", lit(1L)), col("n"), "id", Seq(5.0), 4).count() == 0)
    // null token count: BucketIndex nullsFirst -> bucket 0 (a row always
    // gets a batch; null length reads as "shortest")
    val docs = Seq((1L, Some(3L)), (2L, None), (3L, Some(100L))).toDF("id", "n")
    val got = Curation.lengthBucketBatches(docs, col("n"), "id", Seq(10.0), 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("len_bucket")).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1))
    intercept[IllegalArgumentException] {
      Curation.lengthBucketBatches(docs, col("n"), "id", Seq(10.0, 5.0), 4)
    }
    intercept[IllegalArgumentException] { Curation.sampleNGlobal(docs, "id", 0) }
  }

  test("r11 batch-4+ operators tolerate empty inputs") {
    import spark.implicits._
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ed = emptyDocs
    import graft.operators.{Contrastive, EventSignals, Funnel}
    assert(EventSignals.abLift(emptyEvents).collect()
      .forall(!_.getAs[Boolean]("significant"))) // 0 or 2 rows, never a throw
    assert(EventSignals.resampleHourly(emptyEvents).count() == 0)
    assert(EventSignals.rollingActiveUsers(emptyEvents).count() == 0)
    assert(EventSignals.userGrowth(emptyEvents).count() == 0)
    assert(EventSignals.attributeLinear(emptyEvents).count() == 0)
    assert(Funnel.associationRules(emptyEvents).count() == 0)
    assert(Curation.modePerGroup(emptyEvents, "event_type", Seq("user_id")).count() == 0)
    assert(Curation.vocabCoverage(ed).count() == 0)
    assert(Curation.collocations(ed).count() == 0)
    assert(Curation.skyline(
      Seq.empty[(Long, Long)].toDF("id", "x"), Seq("x")).count() == 0)
    assert(Curation.exactQuantilesDistributed(
      Seq.empty[(String, Long)].toDF("g", "v"), "v", Seq(0.5), Seq("g")).count() == 0)
    assert(Curation.medianAbsDeviation(
      Seq.empty[(String, Long)].toDF("g", "v"), "v", Seq("g")).count() == 0)
    assert(Curation.robustScale(
      Seq.empty[(String, Long)].toDF("g", "v"), "v", Seq("g")).count() == 0)
    assert(Curation.packingStats(ed,
      graft.functions.TextFunctions.tokenCount(col("text")),
      Seq(col("doc_id")), 64L).count() == 0)
    assert(Contrastive.ringNegatives(
      Seq.empty[Tuple1[Long]].toDF("doc_id"), "doc_id").count() == 0)
    assert(graft.operators.Retrieval.tfidfTopTerms(ed).count() == 0)
    // pct rank: empty query side, and empty REFERENCE side (n_ref 0)
    val docs = Seq((1L, 5L)).toDF("id", "v")
    val noQ = Curation.percentileRankAgainst(
      Seq.empty[(Long, Long)].toDF("id", "v"), docs, "v", "id")
    assert(noQ.count() == 0)
    val noRef = Curation.percentileRankAgainst(docs,
      Seq.empty[(Long, Long)].toDF("id", "v"), "v", "id").collect()
    assert(noRef.length == 1 && noRef(0).getAs[Long]("n_le") == 0
      && noRef(0).getAs[Long]("n_ref") == 0)
  }

  test("curriculumOrder empty input yields empty, not a percentile failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "difficulty")
    assert(Curation.curriculumOrder(empty, "difficulty", "id").count() == 0)
  }

  test("batch-5/6 operators survive empty and degenerate inputs") {
    import spark.implicits._
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val tri = graft.operators.Graph.triangleCount(emptyEdges).collect()
    assert(tri.length == 1 &&
      tri(0).toSeq == Seq(0L, 0L, 0L)) // one all-zero summary row
    assert(graft.operators.Graph.kCore(emptyEdges, k = 2).count() == 0)
    assert(graft.operators.Graph.coOccurrenceEdges(
      Seq.empty[(Long, Long)].toDF("g", "id"), "g", "id").count() == 0)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.operators.History.scd2(emptyEv).count() == 0)
    assert(graft.operators.EventSignals.activityTrend(emptyEv).count() == 0)
    val evV = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    assert(graft.operators.EventSignals.ohlcBars(evV).count() == 0)
    assert(Curation.heavyHitters(emptyDocs, minCount = 1).count() == 0)
    // null keys: scd2 groups all-null users into one run stream; cdc
    // keeps the null-key group's state too (null is a legal key value)
    val nullKey = Seq((null.asInstanceOf[java.lang.Long],
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.operators.History.scd2(nullKey).count() == 1)
    assert(Similarity.pqSearch(emptyEmb, emptyEmb, m = 2, k = 4, dim = 4,
      topK = 3).count() == 0)
  }

  test("r12 operators survive empty and degenerate inputs") {
    import spark.implicits._
    // span removal / boilerplate strip: empty corpora produce empty output
    assert(Dedup.removeRepeatedSpans(emptyDocs).count() == 0)
    assert(Dedup.stripBoilerplateLines(emptyDocs, minDocs = 2).count() == 0)
    // single doc: nothing can repeat across docs; within-doc spans CAN
    val one = Seq(1L -> "x y z").toDF("doc_id", "text")
    val kept = Dedup.removeRepeatedSpans(one, windowTokens = 3, minCount = 2)
      .collect().head
    assert(kept.getString(1) == "x y z" && kept.getLong(2) == 0L)
    // pairRecall with an empty side: recall/prec are NULL, not fake zeros
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val r1 = Dedup.pairRecall(noPairs, pairs).collect().head
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 0L && r1.getLong(2) == 0L)
    assert(r1.getDouble(3) == 0.0 && r1.isNullAt(4)) // hits/0 -> null prec
    val r2 = Dedup.pairRecall(pairs, noPairs).collect().head
    assert(r2.getLong(0) == 0L && r2.isNullAt(3)) // recall null
    // mmrRerank: k beyond the candidate depth emits what exists, ranks
    // contiguous from 1
    val vecs = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(1f, 1f)).toDF("vec_id", "embedding")
    val cand = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
    val mmr = Similarity.mmrRerank(cand, vecs, k = 5, lambda = 0.7)
      .collect().map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1)
    assert(mmr.map(_._1).toSeq == Seq(1L, 2L))
    // pqTrainCodebooks: corpus smaller than k shrinks the codebook
    val tiny = Seq(0L -> Array(1f, 2f), 1L -> Array(3f, 4f))
      .toDF("vec_id", "embedding")
    assert(Similarity.pqTrainCodebooks(tiny, m = 1, k = 8, dim = 2,
      rounds = 2).length == 2)
  }
}
