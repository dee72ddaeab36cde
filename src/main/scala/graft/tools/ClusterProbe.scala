package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Decompose the iterative cluster-resolution cost at sf0.1: pair
  * generation vs the propagation loop (rounds × edges), and the survivors
  * anti-join on top. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-clusterprobe")
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    docs.count() // warmup

    for (_ <- 1 to 2) {
      time("pairs only") {
        Dedup.ngramJaccardPairs(docs, threshold = 0.5).count()
      }
      time("pairs -> clusters") {
        graft.SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      time("pairs -> survivors") {
        graft.SparkEntry.queries("q_dedup_survivors")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    // loop shape on the real pair graph: edge count and component stats
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5).cache()
    val nEdges = pairs.count()
    val cl = Dedup.clusters(pairs)
    val stats = cl.groupBy("cluster_id").count()
      .agg(count(lit(1)).as("n_clusters"), max("count").as("max_size")).collect()(0)
    println(s"[probe] edges=$nEdges clusters=${stats.getLong(0)} largest=${stats.getLong(1)}")
    spark.stop()
  }
}
