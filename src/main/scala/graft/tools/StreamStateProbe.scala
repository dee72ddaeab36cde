package graft.tools

import graft.GraftSession
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** State-size evidence for the stateful drains (SCALE.md): drain each
  * stateful stream at a given SF dir and report, from the LAST batch's
  * StreamingQueryProgress.stateOperators, total state rows and bytes —
  * run at sf0.1 and the ScaleUp sf1 to show watermark/keyed state grows
  * with KEYS, not with the stream.
  *   runMain graft.tools.StreamStateProbe [sfDir ...]
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/.bench-data/sf1")
    val spark = GraftSession.local(16, "graft-stream-state")
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach(run(spark, _))
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String): Unit = {
    def asDir(table: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_ssp_$table")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(s"$table.parquet"), java.nio.file.Paths.get(s"$sfDir/$table.parquet"))
      d.toString
    }
    val evPath = asDir("events")
    val evSchema = spark.read.parquet(evPath).schema
    def ev = {
      val e = spark.readStream.schema(evSchema).parquet(evPath)
      if (evSchema("ts").dataType == LongType)
        e.withColumn("ts", expr("timestamp_micros(ts DIV 1000)")) else e
    }
    def drain(name: String, mode: OutputMode)(df: DataFrame): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ssp_ckpt").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = df.writeStream.format("noop").outputMode(mode)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val last = q.recentProgress.reverse
          .find(_.stateOperators.nonEmpty)
        val (rows, bytes, name2) = last.map { p =>
          (p.stateOperators.map(_.numRowsTotal).sum,
           p.stateOperators.map(_.memoryUsedBytes).sum,
           p.stateOperators.map(_.operatorName).mkString("+"))
        }.getOrElse((0L, 0L, "none"))
        println(f"[sstate] $sfDir%-28s $name%-22s state_rows=$rows%-9d state_bytes=$bytes%-11d ops=$name2")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    drain("window", OutputMode.Update)(StreamingPipeline.windowedCounts(ev))
    drain("sessions", OutputMode.Append)(
      StreamingPipeline.sessionCounts(ev, gap = "30 minutes", watermark = Some("2 hours")))
    drain("sessionize", OutputMode.Append)(
      StreamingPipeline.sessionize(ev, gap = "30 minutes"))
    drain("transitions", OutputMode.Append)(StreamingPipeline.transitions(ev))
    drain("anomaly", OutputMode.Append)(StreamingPipeline.anomalyFlags(ev))
    drain("ohlc", OutputMode.Append)(StreamingPipeline.ohlcBars(ev))
    drain("cdc", OutputMode.Append)(
      StreamingPipeline.cdcLatestStream(ev.select(col("user_id"),
        when(col("event_id") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("value"), col("ts"), col("event_id"))))
    drain("interval_join", OutputMode.Append)(
      StreamingPipeline.intervalJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("cts")),
        Seq("user_id"), "ts", "cts",
        within = "30 minutes", watermark = "2 hours"))
  }
}
