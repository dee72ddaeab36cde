package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off plan + stage-cost probe for q_bm25 (r09): counts parquet scans,
  * checks the stats broadcast reuses one exchange, and confirms the
  * per-query top-k window runs with a Partial WindowGroupLimit. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "bm25-probe")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_bm25")(spark, "/root/testdata/sf0.1")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    println("== scans: " + "Scan parquet".r.findAllIn(plan).size)
    println("== reused exchanges: " + "ReusedExchange".r.findAllIn(plan).size)
    println("== window group limit: " + "WindowGroupLimit".r.findAllIn(plan).size)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"== warm run ${(System.nanoTime()-t0)/1e9}%.3f s")
    println(plan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("ReusedExchange") ||
      l.contains("WindowGroupLimit") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
