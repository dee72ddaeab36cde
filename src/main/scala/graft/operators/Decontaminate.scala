package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: for every training document, how much of it
  * appears verbatim in an evaluation/benchmark corpus — the n-gram-overlap
  * check run before any serious pre-training mix ships (a contaminated doc
  * leaks test answers into the train set). Overlap unit = distinct word
  * n-gram shingles (the dedup shingle machinery reused).
  *
  * Scale shape: training docs explode to (doc, shingle) postings; the
  * benchmark's DISTINCT shingle set is built once (benchmarks are tiny next
  * to a 100 TB corpus — the planner broadcasts the set when it fits, keyed
  * join otherwise); one shingle-keyed join + one doc-keyed partial-agg
  * count. Nothing quadratic, no driver collection. */
object Decontaminate {

  /** Per-document overlap counts against `bench`: `n_shingles` distinct
    * shingles in the doc, `n_hit` of them present anywhere in the
    * benchmark. Documents with fewer than `n` tokens have no shingles and
    * are absent from the output (nothing to contaminate). Downstream
    * policy is one filter away (e.g. drop when n_hit/n_shingles > 0.1). */
  def overlap(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
    val bsh = bench
      .select(explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
      .distinct()
    sh.join(bsh.withColumn("__hit", lit(1)), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hit"))
  }
}
