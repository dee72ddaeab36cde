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
}
