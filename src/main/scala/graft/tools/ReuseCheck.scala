package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch: do the dedup self-joins reuse their shuffles at runtime?
  * Prints, per query, the final AQE plan's ReusedExchange / Exchange /
  * parquet-scan / Generate counts — SCANS and GENERATES are the direct
  * evidence of whether the shingle subtree executes once or N times. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def report(name: String, df: DataFrame): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def n(re: String) = re.r.findAllIn(plan).length
      println(s"[$name] REUSED_EXCHANGE=${n("ReusedExchange")} " +
        s"EXCHANGE=${n("Exchange")} SCANS=${n("Scan parquet")} GENERATES=${n("Generate")}")
    }
    report("simhash", Dedup.simhashPairs(docs, maxHamming = 6))
    report("ngram_capped", Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxShingleDf = Some(5)))
    report("minhash", Dedup.minhashLsh(docs, threshold = 0.5))
    spark.stop()
  }
}
