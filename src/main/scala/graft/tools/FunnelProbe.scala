package graft.tools

import graft.GraftSession
import graft.operators.Funnel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures the two funnel shapes at bench scale (VERDICT r06 item 3):
  *
  *  A. per-step scans (current `Funnel.funnelTimes`): k steps = k parquet
  *     scans, each with its own pushed `event_type` predicate;
  *  B. one-scan: filter `event_type IN steps` once, pin with an eager
  *     localCheckpoint, then run the same per-step aggregations against
  *     the pinned frame.
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-funnelprobe")
    spark.sparkContext.setLogLevel("WARN")
    val steps = Seq("view", "click", "purchase")

    def events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

    def oneScan(ev: DataFrame): DataFrame = {
      val pinned = ev.filter(col("event_type").isin(steps: _*))
        .select("user_id", "ts", "event_type").localCheckpoint(true)
      Funnel.funnelTimes(pinned, steps)
    }

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-18s $s%7.3f s  rows=$n")
      s
    }

    // warmup
    events.count()
    for (rep <- 1 to 3) {
      time(s"per-step#$rep")(Funnel.funnelTimes(events, steps).count())
      time(s"one-scan#$rep")(oneScan(events).count())
    }
    spark.stop()
  }
}
