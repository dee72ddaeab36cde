package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch: does the simhash banded self-join reuse its shuffle at runtime? */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 6)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(plan).length)
    println("EXCHANGE_COUNT=" + "Exchange".r.findAllIn(plan).length)
    spark.stop()
  }
}
