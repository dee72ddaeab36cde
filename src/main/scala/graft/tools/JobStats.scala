package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-query job/stage/task census for MANY queries in one JVM —
  * [[HitsJobs]] generalized. For each name: one warm run, then a timed
  * run reporting jobs, stages, tasks, and shuffle bytes — the
  * fixed-overhead diagnosis for the optimization rounds (at bench scale
  * the data is tiny, so seconds track scheduling structure, not bytes). */
object JobStats {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "job-stats")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
          stages.addAndGet(js.stageInfos.size): Unit
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          tasks.addAndGet(sc.stageInfo.numTasks): Unit
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
          // slow-stage trace (>=200 ms wall): the serial-compute smoking gun
          val i = sc.stageInfo
          val wall = (for (a <- i.submissionTime; b <- i.completionTime)
            yield b - a).getOrElse(0L)
          if (wall >= 200 && sys.env.contains("SPARK_GRAFT_STAGETRACE")) {
            val m = i.taskMetrics
            System.err.println(f"[stage] ${wall}%6d ms ${i.numTasks}%4d tasks " +
              f"run=${m.executorRunTime}%5d deser=${m.executorDeserializeTime}%4d " +
              f"gc=${m.jvmGCTime}%4d cpu=${m.executorCpuTime / 1000000}%5d " +
              i.name.take(60))
          }
        }
      })
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    println(f"${"query"}%-26s ${"warm_s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"shufKB"}%8s")
    names.foreach { name =>
      def run() = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      try {
        run() // warm
        Thread.sleep(300)
        jobs.set(0); stages.set(0); tasks.set(0); shuffleBytes.set(0)
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$name%-26s $dt%7.2f ${jobs.get}%5d ${stages.get}%6d " +
          f"${tasks.get}%6d ${shuffleBytes.get / 1024}%8d")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
