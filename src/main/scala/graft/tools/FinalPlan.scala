package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dump the AQE FINAL physical plan (post-execution) for named queries at a
  * given SF — `explain` shows the initial plan, which can differ materially
  * from what actually ran (broadcast demotions/promotions, coalescing). */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-finalplan")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q3_join", "q5_join")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val fin = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      println(s"\n######## $name (AQE final, $sfDir) ########")
      println(fin.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("FileScan"))
        .map(_.trim.take(140)).mkString("\n"))
    }
    spark.stop()
  }
}
