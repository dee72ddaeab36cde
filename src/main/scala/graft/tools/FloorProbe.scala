package graft.tools

import graft.SparkEntry

/** r18: decompose the per-query fixed cost of cheap tail queries —
  * analysis/optimization/physical planning vs execution. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "floor-probe")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter", "q_transform_upper", "q6_agg", "q_token_count")
    // warm the session
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count())
    for (_ <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()           // DataFrame construction + analysis trigger?
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val t2 = System.nanoTime()
      qe.optimizedPlan                      // force optimizer
      val t3 = System.nanoTime()
      qe.executedPlan                       // physical planning
      val t4 = System.nanoTime()
      val rdd = qe.toRdd
      val t5 = System.nanoTime()
      rdd.count()
      val t6 = System.nanoTime()
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"[floor] $n%-22s build=${ms(t0,t1)}%6.1f analyze=${ms(t1,t2)}%6.1f " +
        f"optimize=${ms(t2,t3)}%6.1f physical=${ms(t3,t4)}%6.1f toRdd=${ms(t4,t5)}%6.1f " +
        f"exec=${ms(t5,t6)}%7.1f total=${ms(t0,t6)}%7.1f")
    }
    spark.stop()
  }
}
