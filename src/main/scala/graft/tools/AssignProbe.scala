package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Times the nearest-centroid assignment fold on an amplified corpus to
  * decide whether the HOF fold needs a native expression (r09). */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "assign-probe")
    spark.sparkContext.setLogLevel("WARN")
    // amplify embeddings 100x -> 200k rows of dim-64
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .crossJoin(spark.range(100))
      .select((col("vec_id") * 100 + col("id")).as("vec_id"), col("embedding"))
      .repartition(32)
      .localCheckpoint()
    println("rows=" + emb.count())
    // by-name: a FRESH plan per call — rerunning one QueryExecution lets
    // its shuffle stages (here the tiny centroid build) skip via map-output
    // reuse, which is not an execution (see Bm25Probe)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("assign k=8")(graft.operators.Similarity.assignToCentroids(emb, k = 8))
    time("assign k=32")(graft.operators.Similarity.assignToCentroids(emb, k = 32))
    spark.stop()
  }
}
