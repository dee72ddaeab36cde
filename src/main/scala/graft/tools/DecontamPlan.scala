package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe: q_decontam's physical plan + stage timing at sf0.1 —
  * the r12 re-measure of the r11-flagged 0.37->0.71 s drift. */
object DecontamPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-decontam-plan")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q_decontam")(spark, sfDir)
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString.take(4000))
  }
}
