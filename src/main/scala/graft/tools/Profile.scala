package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query profiling harness: times selected SparkEntry queries (warm,
  * twice each) and prints candidate counts for the LSH paths. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        if (ms.exists(_ > 500))
          println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d ${ms.get / 1000.0}%6.2fs  ${si.name.take(60)}")
      }
    })

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter", "q_pipeline_filter_count", "q_dedup_ngram", "q_dedup_minhash",
        "q_dedup_simhash", "q_sim_ann", "q_events_window", "q1_agg")
    for (name <- names; i <- 1 to 2)
      time(s"$name#$i")(SparkEntry.queries(name)(spark, sfDir).count())

    // LSH candidate volume (explains verify cost)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.functions.{Sketches, TextFunctions}
    val sets = docs.select(col("doc_id").as("id"),
      TextFunctions.shingleSet(col("text"), 3).as("sh"))
    val buckets = sets
      .select(col("id"), explode(Sketches.minhashBands(col("sh"), 32, 4)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.key").as("key"))
    val cand = buckets.toDF("a_id", "band", "key")
      .join(buckets.toDF("b_id", "band", "key"), Seq("band", "key"))
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id")
    time("minhash candidates (raw)")(cand.count())
    time("minhash candidates (dist)")(cand.distinct().count())
    // postings-join volume for ngram
    val posts = sets.select(col("id"), explode(col("sh")).as("shingle"))
    time("ngram postings rows")(posts.count())
    time("ngram join pair-rows")(
      posts.toDF("a", "shingle").join(posts.toDF("b", "shingle"), Seq("shingle"))
        .filter(col("a") < col("b")).count())
    spark.stop()
  }
}
