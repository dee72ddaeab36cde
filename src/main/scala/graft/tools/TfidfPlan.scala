package graft.tools
object TfidfPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "tfidf-plan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_tfidf_terms")(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
