package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: LSH-candidate bitext winner agreement vs brute at
  * several pruning levels (threshold selection for the gate). */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val xs = emb.filter(col("vec_id") % 2 === 0)
    val ys = emb.filter(col("vec_id") % 2 === 1)
    val brute = Similarity.bitextMarginMine(xs, ys, k = 4)
      .select(col("x_id"), col("y_id").as("yb"))
    for (n <- Seq(2, 3, 4)) {
      val lsh = Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = n)
        .select(col("x_id"), col("y_id").as("yl"))
      val a = brute.join(lsh, Seq("x_id"))
        .agg(sum(when(col("yb") === col("yl"), 1).otherwise(0)), count(lit(1)))
        .collect()(0)
      println(s"nPlanes=$n agree=${a.get(0)}/${a.get(1)}")
    }
    spark.stop()
  }
}
