package graft.tools

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for [[Curation.perplexityScore]]: the mean-logprob
  * distribution at sf0.01 (threshold selection for the gate) and the
  * cross-reference fallback path's hit rate. */
object PerplexityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    val scored = Curation.perplexityScore(docs, docs)
      .withColumn("mean_lp",
        when(col("n_bigrams") > 0,
          col("sum_lp_q").cast("double") / col("n_bigrams") / 1e6))
    scored.select(
      min("mean_lp"), expr("percentile(mean_lp, array(0.05,0.25,0.5,0.75,0.95))"),
      max("mean_lp"), count(lit(1)), sum(when(col("n_bigrams") === 0, 1).otherwise(0)))
      .show(false)

    // candidate thresholds -> keep fraction
    for (thr <- Seq(-8500000L, -8300000L, -8200000L, -8100000L, -8000000L, -7800000L)) {
      val kept = Curation.perplexityFilter(docs, docs, thr)
        .agg(sum(when(col("keep"), 1).otherwise(0)), count(lit(1))).collect()(0)
      println(s"thr=$thr keep=${kept.get(0)}/${kept.get(1)}")
    }

    // cross-corpus: reference = doc_id % 3 == 0 slice; fallback hit rate
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val cross = Curation.perplexityScore(docs, ref)
    cross.agg(count(lit(1)), sum("n_bigrams"), sum("sum_lp_q")).show(false)
    spark.stop()
  }
}
