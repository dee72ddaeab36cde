package graft.ops

import org.apache.spark.sql.DataFrame

/** Storage-block release for EAGERLY materialized `localCheckpoint` pins.
  *
  * The repo's iterative loops (cluster propagation, pageRank, k-core,
  * farthest-first selection) pin each round's frame with a localCheckpoint
  * so the iterated plan stays constant-size. `Dataset.unpersist` is a
  * NO-OP on such frames — a checkpointed Dataset never registers in the
  * CacheManager — so without an explicit release every round's
  * corpus-sized pin stays resident until the ContextCleaner happens to GC
  * the RDD reference: a 50-round job holds up to 50 corpus-sized block
  * sets. This walks the plan to its LogicalRDD leaves and unpersists the
  * checkpoint RDDs themselves.
  *
  * SAFETY CONTRACT: a localCheckpoint has no lineage — a released block
  * cannot be recomputed — so release a pin ONLY once (a) the next round's
  * pin has MATERIALIZED (eager checkpoint, or a lazy one forced by an
  * action) and (b) no returned plan reads the released frame. Every call
  * site must hold both. Pass the CHECKPOINTED FRAME ITSELF, not a plan
  * derived from several pins: the release unpersists EVERY LogicalRDD
  * leaf it finds, so a join of two pinned frames would release a sibling
  * pin that later reads still need — unrecoverable, since there is no
  * lineage to recompute from. The leaf count is asserted. */
object Pins {

  /** Live census per scope tag — see [[scopedPersist]]. */
  private val censuses =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Scoped-lifetime persist for the shared CENSUSES behind the scoring
    * operators (knModel's bigram census, the trigram census, DSIR's
    * (id, bucket) counts): persist `df` MEMORY_AND_DISK and register it
    * under `tag`; the PREVIOUS census registered under the same tag is
    * unpersisted. A long-lived session calling the same entry point
    * repeatedly thus holds AT MOST ONE cached census per scope — the
    * bound the lazy `.persist` alone can't give (its blocks linger until
    * the context cleaner happens to GC the dropped result).
    *
    * Unlike [[releaseCheckpoint]]'s pins, a persist HAS lineage — a
    * superseded census still referenced by an old returned frame simply
    * recomputes on next use (slower, never wrong), so the replace is
    * always safe. A re-registration with the SAME logical plan (same
    * corpus scored twice) is a no-op replace: Spark's cache is keyed by
    * plan, so unpersisting the old frame would evict the new one's entry
    * too — `sameResult` guards it. */
  def scopedPersist(tag: String, df: DataFrame): DataFrame = {
    val pinned =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = censuses.put(tag, pinned)
    if (prev != null &&
        !prev.queryExecution.analyzed.sameResult(pinned.queryExecution.analyzed))
      prev.unpersist(blocking = false): Unit
    pinned
  }

  /** The census currently registered under `tag` (spec introspection). */
  private[graft] def scopedEntry(tag: String): Option[DataFrame] =
    Option(censuses.get(tag))

  def releaseCheckpoint(df: DataFrame): Unit = {
    val leaves = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr
    }
    require(leaves.size <= 1,
      s"Pins.releaseCheckpoint: plan has ${leaves.size} LogicalRDD leaves — " +
        "releasing would unpersist sibling pins with no lineage to recover " +
        "from; pass the single checkpointed frame itself")
    leaves.foreach(_.rdd.unpersist(blocking = false): Unit)
  }
}
