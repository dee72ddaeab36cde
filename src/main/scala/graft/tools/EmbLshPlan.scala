package graft.tools

import graft.GraftSession

/** r11 drift follow-up: pin q_dedup_embed_lsh's plan shape — the scalar
  * min-meeting-bucket filter must keep the candidate distinct() exchange
  * OUT of the plan (one bucket join, one id-pair distinct NOWHERE, vectors
  * joined back only for the verify). */
object EmbLshPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "emb-lsh-plan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_dedup_embed_lsh")(spark, "/root/testdata/sf0.1")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    println("== exchanges: " + "Exchange".r.findAllIn(plan).size)
    println("== hash-dedup aggs over pair ids: " +
      "HashAggregate.*a_id.*b_id".r.findAllIn(plan).size)
    println("== scans: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
