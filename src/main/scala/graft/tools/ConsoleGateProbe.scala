package graft.tools

import graft.GraftSession

/** Where does q_stream_console_gate spend its time? */
object ConsoleGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "console-gate-probe")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("q_stream_console_gate")(spark, "/root/testdata/sf0.01")
    val t1 = System.nanoTime()
    df.queryExecution.toRdd.count()
    val t2 = System.nanoTime()
    println(f"[probe] build (staging+stream drain) = ${(t1 - t0) / 1e9}%.1f s, readout = ${(t2 - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
