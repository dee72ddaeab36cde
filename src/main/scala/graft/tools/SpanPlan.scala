package graft.tools

import graft.GraftSession

/** Plan audit for q_dedup_spans: does the md5-keyed window shuffle carry
  * the chunk text, or only (ids, fingerprint)? */
object SpanPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "graft-spanplan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_dedup_spans")(spark, sfDir)
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
