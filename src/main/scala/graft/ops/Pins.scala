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
