package graft.tools

object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "read-cost-probe")
    spark.sparkContext.setLogLevel("WARN")
    val p = "/root/testdata/sf0.1/lineitem.parquet"
    // warm
    spark.read.parquet(p).queryExecution.assertAnalyzed()
    val sch = spark.read.parquet(p).schema
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0; while (i < 20) { f; i += 1 }
      println(f"[readcost] $tag%-28s ${(System.nanoTime() - t0) / 20e6}%7.1f ms/call")
    }
    time("read.parquet analyzed") {
      spark.read.parquet(p).queryExecution.assertAnalyzed()
    }
    time("read.schema(s).parquet") {
      spark.read.schema(sch).parquet(p).queryExecution.assertAnalyzed()
    }
    time("read.parquet lazy (no analyze)") {
      spark.read.parquet(p)
    }
    val cached = spark.read.parquet(p)
    time("reuse analyzed df (filter)") {
      cached.filter(org.apache.spark.sql.functions.col("l_orderkey") > 0)
        .queryExecution.assertAnalyzed()
    }
    spark.stop()
  }
}
