package graft.tools

import graft.{GraftSession, SparkEntry}

/** Job-count probe for the iterative graph queries: the 5-node q_hits
  * bench cost is FIXED overhead (scheduling + broadcast subqueries), so
  * the lever is job COUNT, not data — this prints it. */
object HitsJobs {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_hits"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "hits-jobs")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
          stages.addAndGet(js.stageInfos.size): Unit
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          tasks.addAndGet(sc.stageInfo.numTasks): Unit
      })
    // optional A/B: SPARK_GRAFT_AQE=false probes the no-runtime-replan cost
    sys.env.get("SPARK_GRAFT_AQE")
      .foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    def run() = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    run()
    Thread.sleep(500)
    println(s"[hitsjobs] $name warm jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    jobs.set(0); stages.set(0); tasks.set(0)
    val t0 = System.nanoTime()
    run()
    Thread.sleep(500)
    println(f"[hitsjobs] $name jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
