package graft.tools

import graft.GraftSession

/** Plan pins for q_dedup_ppjoin: (1) the rank-postings census is CACHED
  * and read back (no recomputation per branch — a first-cut array census
  * recomputed 3x and ran 7x slower); (2) the exact-verify joins build on
  * the tiny CANDIDATE side (BroadcastHashJoin), never shuffling the
  * corpus after the prefix join. Asserted, not printed (the BitextProbe
  * discipline). */
object PpPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "pp-plan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_dedup_ppjoin")(spark, "/root/testdata/sf0.1")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    val nCacheReads = "TableCacheQueryStage".r.findAllIn(plan).size
    require(nCacheReads >= 3,
      s"ppjoin census must be read from cache on every branch: $nCacheReads")
    val verifyBroadcasts = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && (l.contains("[a_id") || l.contains("[b_id")))
    require(verifyBroadcasts >= 2,
      s"verify joins must broadcast the candidate side: $verifyBroadcasts")
    // (3) the positional filter must CUT candidates vs the bare prefix
    // join (the whole point of carrying ranks into the candidate rows) —
    // count both forms at the gate's tau on the same corpus
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nRaw = graft.operators.Dedup
      .ppjoinSelfCandidates(docs, 0.6, 3, "text", "doc_id", positional = false)
      ._2.count()
    val nPos = graft.operators.Dedup
      .ppjoinSelfCandidates(docs, 0.6, 3, "text", "doc_id", positional = true)
      ._2.count()
    require(nPos <= nRaw, s"positional filter grew the candidate set: $nPos > $nRaw")
    require(nPos < nRaw,
      s"positional filter cut nothing at tau=0.6 on sf0.1: raw=$nRaw pos=$nPos")
    println(s"[pp-plan] OK: cacheReads=$nCacheReads verifyBroadcasts=$verifyBroadcasts " +
      s"candidates raw=$nRaw positional=$nPos " +
      f"(cut ${100.0 * (nRaw - nPos) / math.max(nRaw, 1)}%.1f%%)")
    spark.stop()
  }
}
