package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan pins for the r14 census-shaped quality families (SCALE.md
  * evidence): the DSIR model join must BROADCAST (the 256-row log-ratio
  * table rides to the scan, never a shuffle of the postings on bucket),
  * and the perplexity scorer's occurrence census must partial-aggregate
  * (map-side combine before its one keyed exchange). Also counts
  * exchanges so a plan regression (an extra shuffle creeping into either
  * chain) fails loudly here. runMain graft.tools.QualityPlanProbe */
object QualityPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-quality-planprobe")
    spark.sparkContext.setLogLevel("WARN")

    def planOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan.toString
    }

    val dsir = planOf("q_dsir_weights")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(dsir).length
    val nShuffleJoin = "SortMergeJoin".r.findAllIn(dsir).length
    println(s"[qplan] q_dsir_weights: broadcast joins = $nBroadcast, " +
      s"sort-merge joins = $nShuffleJoin")
    require(nBroadcast >= 1,
      "DSIR log-ratio model must broadcast onto the per-doc counts")

    val ppx = planOf("q_perplexity_filter")
    val nPartial = "partial_".r.findAllIn(ppx).length +
      "HashAggregate".r.findAllIn(ppx).length
    val nMem = "InMemoryTableScan".r.findAllIn(ppx).length
    println(s"[qplan] q_perplexity_filter: hash aggregates = $nPartial, " +
      s"in-memory census reads = $nMem")
    require(ppx.contains("HashAggregate"),
      "perplexity census must partial-aggregate before its exchange")
    // the bigram census must be PINNED: its four consumers (cpre/n1fwd,
    // n1back, type count, probability readout) read one materialization —
    // unpinned, each re-derived the corpus scan + shuffle
    require(nMem >= 3,
      "perplexity census must be persisted and read by its consumers")

    // r15: the TRIGRAM scorer's census must likewise be pinned — ONE
    // trigram-keyed aggregation read by all five model-table consumers
    // (c12, t2, c2, u1, U) plus the scoring join, never re-derived
    val ppx3 = planOf("q_perplexity3")
    val nMem3 = "InMemoryTableScan".r.findAllIn(ppx3).length
    println(s"[qplan] q_perplexity3: in-memory census reads = $nMem3")
    require(ppx3.contains("HashAggregate"),
      "trigram census must partial-aggregate before its exchange")
    require(nMem3 >= 4,
      "trigram census must be persisted and read by its model-table consumers")

    // execution smoke at the probe SF so the pinned plans are the ones
    // that actually ran
    Seq("q_dsir_weights", "q_perplexity_filter", "q_perplexity3").foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[qplan] $n%-20s ran ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
