package graft.tools

import graft.GraftSession
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Scratch timing probe for bigramRarity at sf0.1 (not shipped API). */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "bigram-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = Curation.bigramRarity(docs).queryExecution.toRdd.count()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("cold"); time("warm1"); time("warm2")
    spark.stop()
  }
}
