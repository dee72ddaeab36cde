package graft.tools

import graft.GraftSession
import graft.operators.Curation

/** Compare the two-profiles-join shape the q_profile_approx gate used to
  * run against the one-pass profileWithApprox at sf0.1. */
object ProfileApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profprobe")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    orders.count() // warmup
    for (_ <- 1 to 3) {
      time("two profiles + join") {
        val exact = Curation.profile(orders, cols)
        val apx = Curation.profile(orders, cols, approx = true)
          .select(col("col_name"), col("n_distinct").as("__a"))
        exact.join(apx, "col_name").queryExecution.toRdd.count()
      }
      time("profileWithApprox (1 pass)") {
        Curation.profileWithApprox(orders, cols).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
