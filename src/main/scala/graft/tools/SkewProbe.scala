package graft.tools

import graft.GraftSession
import graft.ops.Skew
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Measure the skew levers doing their job: plant a hot key carrying ~half
  * the fact rows (a bot user — orders of magnitude past any organic key at
  * sf0.1), then join against a broadcast-ineligible dim both ways and
  * compare wall time AND the per-task time distribution. The claim under
  * test: the plain shuffle join funnels the hot key through ONE task (max
  * task ~= wall time, the straggler that caps a 1000-executor cluster at
  * single-task throughput), while [[Skew.saltedJoin]] spreads it over
  * `salt` sub-keys (max task ~= median). AQE is OFF so the static plans
  * are what's measured (AQE's skew split only helps sort-merge shuffle
  * partitions, and real clusters still hit this via aggregation hot keys
  * and disabled/ineligible AQE paths); a third timing with AQE ON records
  * what the runtime splitter adds back. Broadcast is disabled to force the
  * shuffle join — with a broadcastable dim there is no skew problem, which
  * is exactly why saltedJoin documents itself as the non-broadcastable
  * case's lever. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-skewprobe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // per-task (duration ms, shuffle-read bytes) since the last clear().
    // Bytes are the load-bearing number: durations wobble with host load,
    // but the per-task shuffle-read distribution IS the skew — structural,
    // deterministic, and what sizes the straggler at any scale.
    val tasks = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.synchronized {
        val sr = Option(t.taskMetrics).map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        tasks += ((t.taskInfo.duration, sr))
      }
    })

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // plant the skew: every even event_id lands on user 0, then amplify the
    // fact 64x (sf0.1's 100k rows are too small for ANY key to straggle a
    // task — the amplified 6.4M puts ~3.2M rows behind the hot key, the
    // shape one bot user has at real scale)
    val rep = 64
    val fact = events.select(
        when(col("event_id") % 2 === 0, lit(0L)).otherwise(col("user_id")).as("user_id"),
        col("event_id"), col("value"))
      .withColumn("__rep", explode(array((0 until rep).map(lit): _*)))
      .withColumn("event_id", col("event_id") * rep + col("__rep"))
      .drop("__rep")
      .localCheckpoint(true)
    // dim pinned once (eager localCheckpoint) so both runs pay zero dim cost
    val dim = fact.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
      .localCheckpoint(true)

    val hotRows = fact.filter(col("user_id") === 0).count()
    val total = fact.count()
    val users = dim.count()
    println(s"[probe] fact=$total hot_key_rows=$hotRows (${100 * hotRows / total}%) dim_users=$users")

    def time(label: String)(f: => Long): Unit = {
      tasks.synchronized(tasks.clear())
      val t0 = System.nanoTime(); val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      val all = tasks.synchronized(tasks.toArray)
      val d = all.map(_._1).sorted
      // skew lives in the shuffle-READING (join) tasks; scan tasks read 0
      val sr = all.map(_._2).filter(_ > 0).sorted
      def p50(a: Array[Long]) = if (a.isEmpty) 0L else a(a.length / 2)
      def mx(a: Array[Long]) = if (a.isEmpty) 0L else a.last
      val ratio = if (p50(sr) == 0) 0.0 else mx(sr).toDouble / p50(sr)
      println(f"[probe] $label%-26s wall=$wall%7.3f s  tasks=${d.length}%4d  " +
        f"task_p50=${p50(d) / 1e3}%6.3f s  task_max=${mx(d) / 1e3}%7.3f s  " +
        f"shufread_p50=${p50(sr) / 1e6}%7.1f MB  shufread_max=${mx(sr) / 1e6}%7.1f MB  " +
        f"read_skew=${ratio}%5.1fx  rows=$n")
    }

    def plain() = fact.join(dim, Seq("user_id"), "inner")
    def salted() = Skew.saltedJoin(fact, dim, Seq("user_id"), salt = 32)

    for (pass <- 1 to 2) {
      println(s"[probe] pass $pass (AQE off)")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("plain shuffle join")(plain().queryExecution.toRdd.count())
      time("salted join (salt=32)")(salted().queryExecution.toRdd.count())
      println(s"[probe] pass $pass (AQE on: runtime skew split for context)")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      time("plain join + AQE")(plain().queryExecution.toRdd.count())
      time("salted join + AQE")(salted().queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
