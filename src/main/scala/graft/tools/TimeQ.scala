package graft.tools

import graft.{GraftSession, SparkEntry}

/** Min-of-N warm timings for named queries — the bench harness's timing
  * discipline (toRdd.count, interleaved passes) without the full set. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-timeq")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_sim_topk")
    def run(n: String) = SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    names.foreach(run) // warmup
    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (_ <- 1 to 3; n <- names) {
      val t0 = System.nanoTime(); run(n)
      best(n) = math.min(best(n), (System.nanoTime() - t0) / 1e9)
    }
    names.foreach(n => println(f"[timeq] $n%-24s ${best(n)}%6.3f s (min of 3, warm)"))
    spark.stop()
  }
}
