package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions.col

/** Interleaved A/B of the PPJoin positional filter's COST on this corpus:
  * the full exact pair pipeline (prefix candidates → tightest-bound cut →
  * verify joins) with the filter on vs off, min-of-5 warm, alternating
  * passes so load drift hits both arms equally. The BENEFIT side (the
  * candidate cut) is PpPlan's readout; this tool prices it. */
object PpAb {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "pp-ab")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def run(positional: Boolean): Long = {
      val (ranked, cand) = graft.operators.Dedup
        .ppjoinSelfCandidates(docs, 0.6, 3, "text", "doc_id", positional)
      import org.apache.spark.sql.functions._
      cand
        .join(ranked.select(col("id").as("a_id"), col("tok")), Seq("a_id"))
        .join(ranked.select(col("id").as("b_id"), col("tok")), Seq("b_id", "tok"))
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jac", col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
        .filter(col("jac") >= 0.6)
        .queryExecution.toRdd.count()
    }
    run(true); run(false) // warm
    val best = scala.collection.mutable.Map(true -> Double.MaxValue,
      false -> Double.MaxValue)
    for (_ <- 1 to 5; p <- Seq(true, false)) {
      val t0 = System.nanoTime(); run(p)
      best(p) = math.min(best(p), (System.nanoTime() - t0) / 1e9)
    }
    println(f"[pp-ab] positional=on ${best(true)}%6.3f s  off ${best(false)}%6.3f s  " +
      f"delta ${(best(true) - best(false)) / best(false) * 100}%+.1f%%")
    spark.stop()
  }
}
