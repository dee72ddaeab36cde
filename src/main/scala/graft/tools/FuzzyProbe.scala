package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Decompose q_dedup_fuzzy's cost at a given SF: join+lenfilter vs the
  * levenshtein pass vs the full operator. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-fuzzyprobe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        if (best == (System.nanoTime() - t0) / 1e9) ()
        System.err.println(f"[fuzzy] $tag n=$n")
      }
      println(f"[fuzzy] $tag%-22s $best%6.2f s")
    }
    val keyed = docs.select(col("doc_id").as("a_id"), col("text").as("__ta"),
        substring(lower(trim(col("text"))), 1, 12).as("__blk"))
      .filter(col("__blk").isNotNull && length(col("__blk")) > 0)
    val hot = keyed.groupBy("__blk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 80).select("__blk")
    val capped = keyed.join(hot, Seq("__blk"), "left_anti")
    val right = capped.select(col("__blk"), col("a_id").as("b_id"),
      col("__ta").as("__tb"))
    val joined = capped.join(right, Seq("__blk"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= 10)
    time("join+lenfilter")(joined.count())
    time("plus levenshtein") {
      joined.withColumn("dist", levenshtein(col("__ta"), col("__tb"), 10).cast("long"))
        .filter(col("dist") >= 0L).count()
    }
    time("full operator") {
      graft.operators.Dedup.fuzzyPairs(docs, maxDist = 10, blockPrefix = 12,
        maxBlockSize = Some(80)).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
