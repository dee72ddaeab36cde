package graft.tools

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.{Curation, Decontaminate}
import org.apache.spark.sql.functions._

/** Decompose the q_pipeline_curation cost at sf0.1. */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-curprobe")
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    docs.count() // warmup

    for (_ <- 1 to 2) {
      time("repetition filters only") {
        docs.filter(TextFunctions.duplicateTokenFraction(col("text")) <= 0.8)
          .filter(TextFunctions.topBigramFraction(col("text")) <= 0.2).count()
      }
      time("decontam filter only") {
        val bench = docs.filter(col("doc_id") % 97 === 0)
        Decontaminate.overlap(docs, bench)
          .filter(col("n_hit") * 2 > col("n_shingles")).count()
      }
      time("redact+split only") {
        Curation.withSplit(
          docs.select(col("doc_id"), TextFunctions.redactPii(col("text")).as("clean")),
          "doc_id", Seq("train" -> 0.9, "val" -> 0.1)).count()
      }
      time("full pipeline") {
        graft.SparkEntry.queries("q_pipeline_curation")(spark, sfDir).count()
      }
    }
    for (_ <- 1 to 2) {
      time("filter dup only (no HOF)") {
        docs.filter(TextFunctions.duplicateTokenFraction(col("text")) <= 0.8).count()
      }
      time("filter top only (HOF)") {
        docs.filter(TextFunctions.topBigramFraction(col("text")) <= 0.2).count()
      }
      time("project-then-filter") {
        docs.select(col("doc_id"), col("text"),
            TextFunctions.duplicateTokenFraction(col("text")).as("dup"),
            TextFunctions.topBigramFraction(col("text")).as("top"))
          .filter(col("dup") <= 0.8 && col("top") <= 0.2).count()
      }
      time("projection only (q_repetition shape)") {
        docs.select(col("doc_id"),
          TextFunctions.duplicateTokenFraction(col("text")).as("dup"),
          TextFunctions.topBigramFraction(col("text")).as("top")).count()
      }
    }
    // how many times does each heavy expression appear in the final plan?
    val df = graft.SparkEntry.queries("q_pipeline_curation")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    for (token <- Seq("wordshingles", "aggregate(", "sort_array", "array_distinct", "regexp_replace"))
      println(f"[plan] $token%-16s x ${token.r.findAllIn(plan.toLowerCase).size}")
    spark.stop()
  }
}
