package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to plans/<round>/ files —
  * the before/after plan evidence for optimization rounds. Usage:
  *   runMain graft.tools.PlanSnap <round> <tag> q_a q_b ...
  * writes plans/<round>/q_a_<tag>.txt etc. Uses the SAME session factory
  * and core count as Bench so the captured plan is the benched plan. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val round = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.local(cpus.toInt, "graft-plansnap")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$round")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$tag.txt"), txt)
      println(s"[plansnap] wrote plans/$round/${name}_$tag.txt " +
        s"(${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
