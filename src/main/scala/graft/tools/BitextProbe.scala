package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the bitext LSH path, two readouts:
  *
  * 1. PLAN pin — with size-based broadcasts disabled
  *    (autoBroadcastJoinThreshold = -1) the physical plan of
  *    `bitextMarginMineLsh` must contain ZERO BroadcastExchange nodes:
  *    every join is keyed shuffle, so neither corpus side is ever
  *    required to fit in executor memory. An explicit `broadcast()`
  *    in the operator would survive the threshold and fail this pin
  *    (the r14 finding: `y.join(broadcast(x), "bucket")` broadcast a
  *    corpus-sized exploded probe frame).
  * 2. RECALL table — LSH-candidate winner agreement vs brute at several
  *    pruning levels and SEED COUNTS (multi-seed candidate union), the
  *    threshold-selection evidence for the q_bitext_recall* gates.
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val xs = emb.filter(col("vec_id") % 2 === 0)
    val ys = emb.filter(col("vec_id") % 2 === 1)

    // --- plan pin: zero BroadcastExchange under threshold = -1 ---
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for ((name, df) <- Seq(
        "lsh" -> Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = 4),
        "ivf" -> Similarity.bitextMarginMineIvf(xs, ys, k = 4,
          nlist = 16, nprobe = 4))) {
      val plan = df.queryExecution.executedPlan.toString()
      val nBroadcast = "BroadcastExchange".r.findAllIn(plan).length
      println(s"${name}_broadcast_exchanges_with_threshold_off=$nBroadcast " +
        s"(MUST be 0: all joins keyed shuffle, no corpus side resident)")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // --- recall: agreement vs brute across nPlanes and seed counts ---
    val brute = Similarity.bitextMarginMine(xs, ys, k = 4)
      .select(col("x_id"), col("y_id").as("yb"))
    val seedPool = Seq(0x5DEECE66DL, 0x9E3779B9L, 0x2545F491L)
    for (n <- Seq(2, 4); nSeeds <- Seq(1, 2, 3)) {
      val lsh = Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = n,
          seeds = seedPool.take(nSeeds))
        .select(col("x_id"), col("y_id").as("yl"))
      val a = brute.join(lsh, Seq("x_id"))
        .agg(sum(when(col("yb") === col("yl"), 1).otherwise(0)), count(lit(1)))
        .collect()(0)
      println(s"nPlanes=$n seeds=$nSeeds agree=${a.get(0)}/${a.get(1)}")
    }
    spark.stop()
  }
}
