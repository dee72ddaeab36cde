package graft.tools

import graft.GraftSession

/** Plan audit for q_asof_iv: the interval (snapshot) side should build one
  * keyed window, then BROADCAST into the events join — events never
  * shuffle. */
object AsofIvPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-asofivplan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_asof_iv")(spark, sfDir)
    df.queryExecution.toRdd.count() // settle AQE
    println(df.queryExecution.executedPlan.toString.take(6000))
    println("== exchanges: " + graft.sources.Layouts.countExchanges(df))
    spark.stop()
  }
}
