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
  * site must hold both. */
object Pins {
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
