package graft.tools

import graft.GraftSession

/** Plan pin for q_top_global: orderBy+limit must plan TakeOrderedAndProject
  * (per-partition heaps + one k-row merge), NOT a global sort. */
object TopGlobalPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "top-global-plan")
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.SparkEntry.queries("q_top_global")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    println("== TakeOrderedAndProject: " + "TakeOrderedAndProject".r.findAllIn(plan).size)
    println("== global Sort nodes: " +
      "Sort \\[".r.findAllIn(plan).size)
    spark.stop()
  }
}
