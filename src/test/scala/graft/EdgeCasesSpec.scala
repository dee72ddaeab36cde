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
