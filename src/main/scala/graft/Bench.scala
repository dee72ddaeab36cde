package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Brute-force O(n²) oracle variants (q_dedup_ngram,
  * q_dedup_embed) are excluded: they exist as correctness oracles for the
  * LSH scale paths, which ARE benchmarked. */
object Bench {
  /** Scale-appropriate headliners (every one holds at 100TB-style plans:
    * keyed shuffles, broadcasts, LSH bucketing — no all-pairs joins). */
  val headliners: Seq[String] = Seq(
    "q1_agg", "q3_join", "q_events_window", "q_running_count",
    "q_filter", "q_column_filter", "q_split_words",
    "q_lang_id", "q_quality", "q_token_count", "q_fingerprint", "q_sketches",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embed_lsh",
    "q_sim_topk", "q_sim_ann", "q_sim_ivf", "q_media_decode", "q_media_frames")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region.
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    // Three timed passes, min per query: the host shows intermittent load
    // bursts (measured up to minutes) unrelated to the plan under test. The
    // passes are INTERLEAVED (all queries once, then all again) so a burst
    // must span multiple full passes to inflate a query's reported minimum.
    def pass(): Map[String, Double] = headliners.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val passes = Seq(pass(), pass(), pass())
    val results = headliners.map(n => n -> passes.map(_(n)).min)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
