package graft.tools

import graft.GraftSession

/** r12 plan pins: the span-removal census must exchange md5s only (no
  * text column past the Generate), and the boilerplate census likewise. */
object R12Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "r12-plans")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_substr", "q_boilerplate")
    names.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan.toString)
    }
    spark.stop()
  }
}
