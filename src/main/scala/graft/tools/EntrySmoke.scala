package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: SparkEntry.entry(spark) on a plain
  * session (no graft-specific configs), rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
