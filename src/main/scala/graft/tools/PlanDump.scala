package graft.tools

import graft.GraftSession

object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plan-dump")
    spark.sparkContext.setLogLevel("WARN")
    Seq("q_user_features", "q_pivot", "q_cluster_assign").foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan.toString)
    }
    spark.stop()
  }
}
