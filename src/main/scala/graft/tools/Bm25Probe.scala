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
    // same-QueryExecution rerun: identical RDD lineage -> every shuffle
    // stage SKIPS (map output reuse). This is the incremental cost over
    // cached shuffles, NOT a warm execution — the r09 "0.046 s warm" read
    // came from here and understated the honest cost ~30x.
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"== same-lineage rerun (shuffle stages skipped) ${(System.nanoTime() - t0) / 1e9}%.3f s")
    // honest warm run: a FRESH plan (new shuffle ids, like every bench
    // pass and every real repeated query) on a warmed JVM
    val t1 = System.nanoTime()
    graft.SparkEntry.queries("q_bm25")(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.count()
    println(f"== fresh-plan warm run ${(System.nanoTime() - t1) / 1e9}%.3f s")
    println(plan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("ReusedExchange") ||
      l.contains("WindowGroupLimit") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
