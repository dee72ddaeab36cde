package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import scala.collection.mutable.ArrayBuffer

/** One-off probe for the r06 q3_join bench regression (0.74 -> 1.54 s under
  * min-of-3 interleaved passes). Measures, per hypothesis:
  *
  *  A. q3_join alone, 6 reps — the plan's intrinsic warm cost;
  *  B. the bench prefix (q1_agg, q3_join, q5_join) x3 interleaved — exactly
  *     the r06 harness shape, with and without q5_join in the rotation;
  *  C. stage decomposition (all stages > 100 ms) for the slowest A rep;
  *  D. the AQE final plan, to confirm the broadcast/shuffle shape.
  */
object Q3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-q3probe")
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[(Int, Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime)
          stages.synchronized { stages += ((si.stageId, si.numTasks, c - s, si.name.take(70))) }
      }
    })

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (same as Bench)
    run("q1_agg")

    println("== A: q3_join alone, 6 reps ==")
    val aReps = (1 to 6).map { i =>
      stages.synchronized(stages.clear())
      val t = run("q3_join")
      val st = stages.synchronized(stages.toList)
      println(f"  rep$i: $t%.3f s  (${st.size} stages, slowest ${st.map(_._3).maxOption.getOrElse(0L)} ms)")
      (t, st)
    }

    println("== C: stage decomposition of slowest A rep ==")
    val worst = aReps.maxBy(_._1)
    worst._2.filter(_._3 > 100).sortBy(-_._3).foreach { case (id, n, ms, nm) =>
      println(f"  stage=$id%-4d tasks=$n%-3d ${ms / 1000.0}%6.2fs  $nm")
    }

    println("== B1: bench prefix WITH q5_join, 3 interleaved passes ==")
    for (p <- 1 to 3) {
      val ts = Seq("q1_agg", "q3_join", "q5_join").map(n => n -> run(n))
      println("  pass" + p + ": " + ts.map { case (n, t) => f"$n=$t%.3f" }.mkString(" "))
    }

    println("== B2: bench prefix WITHOUT q5_join, 3 interleaved passes ==")
    for (p <- 1 to 3) {
      val ts = Seq("q1_agg", "q3_join").map(n => n -> run(n))
      println("  pass" + p + ": " + ts.map { case (n, t) => f"$n=$t%.3f" }.mkString(" "))
    }

    println("== D: AQE final plan for q3_join ==")
    val df = SparkEntry.queries("q3_join")(spark, sfDir)
    df.count() // materialize so AQE finalizes
    val executed = df.queryExecution.executedPlan
    val fin = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(fin.toString.linesIterator.take(60).mkString("\n"))
    spark.stop()
  }
}
