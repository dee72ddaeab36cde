package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** PPJoin positional filter on a DF-SKEWED corpus at sf0.1 scale — the
  * DedupSpec rank-skew fixture ("positional filter bites on rank-skewed
  * pairs") replicated at 50k documents, where the decorrelated synthetic
  * documents table (1.4% cut, tools/PpPlan) understates the filter.
  *
  * Corpus shape (all unigrams, τ = 0.6, |doc| = 10 ⇒ prefix = 5):
  * pairs k = 0..nPairs-1 in groups of 4 pairs sharing a 9-token
  * high-df filler vocabulary cg_1..cg_9;
  *   doc 2k   = r_k + cg_1..cg_9      (r_k df 2 ⇒ rank 1; prefix also
  *                                     carries cg_6..cg_9)
  *   doc 2k+1 = u_k1..u_k4 + r_k + cg_1..cg_5   (four df-1 uniques front
  *                                     the prefix; r_k lands at rank 5)
  * Every (2k, 2k+1) pair is a prefix candidate via r_k with bound
  * min(1,5) + min(9,5) = 6 < ceil(0.375·20) = 8 — CUT by the positional
  * filter, and correctly so (true J = 6/14 < τ). The even-even
  * boilerplate pairs inside a group share cg_6..cg_9 at EQUAL ranks
  * (bound 10 ≥ 8, true J = 9/11 ≥ τ) — genuine near-dups the filter must
  * keep. Readouts: candidate count on/off (the cut %), result-set
  * equality, and the full-pipeline interleaved min-of-3 A/B. */
object PpSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "pp-skew")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nPairs = 25000
    val docs = spark.range(nPairs).flatMap { k =>
      val g = k / 4
      val fill = (1 to 9).map(i => s"cg${g}_$i")
      val a = (s"r$k" +: fill).mkString(" ")
      val b = ((1 to 4).map(i => s"u${k}_$i") ++
        Seq(s"r$k") ++ fill.take(5)).mkString(" ")
      Seq((2 * k, a), (2 * k + 1, b))
    }.toDF("doc_id", "text").localCheckpoint(true) // generation off the clock
    def cands(positional: Boolean) = graft.operators.Dedup
      .ppjoinSelfCandidates(docs, 0.6, 1, "text", "doc_id", positional)
    val cOff = cands(positional = false)._2.count()
    val cOn = cands(positional = true)._2.count()
    println(f"[pp-skew] docs=${2 * nPairs} candidates off=$cOff on=$cOn " +
      f"cut=${(cOff - cOn) * 100.0 / cOff}%.1f%%")
    def run(positional: Boolean): Long = {
      val (ranked, cand) = cands(positional)
      cand
        .join(ranked.select(col("id").as("a_id"), col("tok")), Seq("a_id"))
        .join(ranked.select(col("id").as("b_id"), col("tok")), Seq("b_id", "tok"))
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jac", col("inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
        .filter(col("jac") >= 0.6)
        .queryExecution.toRdd.count()
    }
    // exactness: same surviving pair count both arms
    val nOn = run(true); val nOff = run(false)
    require(nOn == nOff, s"positional filter changed the result: $nOn != $nOff")
    println(s"[pp-skew] result pairs=$nOn (identical on/off)")
    val best = scala.collection.mutable.Map(true -> Double.MaxValue,
      false -> Double.MaxValue)
    for (_ <- 1 to 3; p <- Seq(true, false)) {
      val t0 = System.nanoTime(); run(p)
      best(p) = math.min(best(p), (System.nanoTime() - t0) / 1e9)
    }
    println(f"[pp-skew] positional=on ${best(true)}%6.3f s  off " +
      f"${best(false)}%6.3f s  delta " +
      f"${(best(true) - best(false)) / best(false) * 100}%+.1f%%")
    spark.stop()
  }
}
