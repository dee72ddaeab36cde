package graft.tools

import org.apache.spark.sql.functions._

/** r18: where does q_dedup_ppjoin spend its 100 CPU-seconds — candidate
  * generation or the explode-join verify? Times each piece separately. */
object PpStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "pp-stage-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ppstage] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm
    graft.operators.Dedup.ppjoinPairs(docs, threshold = 0.6).queryExecution.toRdd.count()
    for (_ <- 1 to 2) {
      val (ranked, cand) = time("candidates (pin+cand)") {
        val rc = graft.operators.Dedup.ppjoinSelfCandidates(
          docs, 0.6, 3, "text", "doc_id")
        rc._2.queryExecution.toRdd.count()
        rc
      }
      println(s"[ppstage] cand rows = ${cand.count()}")
      time("verify (explode joins)") {
        cand
          .join(ranked.select(col("id").as("a_id"), col("tok")), Seq("a_id"))
          .join(ranked.select(col("id").as("b_id"), col("tok")), Seq("b_id", "tok"))
          .groupBy("a_id", "b_id", "a_sz", "b_sz")
          .agg(count(lit(1)).as("inter"))
          .queryExecution.toRdd.count()
      }
      graft.ops.Pins.releaseCheckpoint(ranked)
    }
    spark.stop()
  }
}
