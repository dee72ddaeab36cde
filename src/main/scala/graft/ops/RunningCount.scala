package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global running count (the reference's AGGREGATE op,
  * Operators.java:57-63 / :93-100 — emits 1,2,3,... one output per input).
  *
  * A naive `count(*) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` collapses the
  * whole dataset into ONE partition (Spark's empty-partition-spec window), so
  * it cannot scale past a single executor. Instead we use the classic
  * two-phase prefix-sum:
  *
  *   1. range-repartition by the order key (each partition holds a contiguous
  *      key range, partitions are mutually ordered);
  *   2. per-partition row_number via a window PARTITIONED BY the physical
  *      partition id (parallel, no global shuffle to one task);
  *   3. per-partition row counts (a tiny `numPartitions`-row aggregate) are
  *      prefix-summed on the driver and broadcast-joined back as offsets.
  *
  * Wall-clock is two parallel passes over the data + an O(numPartitions)
  * driver step — this holds at 1000 executors, where the single-partition
  * window would OOM one task with the entire dataset.
  *
  * Rows with equal order keys get an arbitrary (but consistent) tie order,
  * same as the reference's arrival-order results log (SURVEY.md §4
  * "partitioning" note) — callers wanting determinism must order by a unique
  * key.
  */
object RunningCount {

  def withRunningCount(
      df: DataFrame,
      orderCols0: Seq[Column],
      outputCol: String = "running_count",
      numPartitions: Option[Int] = None): DataFrame = {
    val pidCol = "__graft_pid"
    val arrivalCol = "__graft_arrival"
    // No order key (e.g. a Select dropped the lineage columns): fall back to
    // arrival order via monotonically_increasing_id — matching the
    // reference's nondeterministic arrival-order results log (SURVEY.md §4).
    val (base, orderCols, dropExtra) =
      if (orderCols0.nonEmpty) (df, orderCols0, Seq.empty[String])
      else (df.withColumn(arrivalCol, monotonically_increasing_id()),
            Seq(col(arrivalCol)), Seq(arrivalCol))
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    // Eager localCheckpoint pins the sampled range boundaries AND the
    // partition ids so phases 2/3 see identical partitioning on
    // re-execution, without a session-lifetime cache entry (the round-1
    // persist() here leaked; checkpointed blocks are GC'd with the RDD).
    val ranged = base
      .repartitionByRange(parts, orderCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint(true)

    val counts: Array[(Int, Long)] = ranged
      .groupBy(col(pidCol)).count()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)

    // Prefix-sum the per-partition counts: offset(p) = rows in partitions < p.
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offsetByPid = counts.map(_._1).zip(offsets.map(_._2)).toMap

    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsetByPid.toSeq.toDF(pidCol + "_k", "__graft_offset")

    val w = Window.partitionBy(col(pidCol)).orderBy(orderCols: _*)
    ranged
      .withColumn("__graft_rn", row_number().over(w).cast("long"))
      .join(broadcast(offsetDf), col(pidCol) === col(pidCol + "_k"))
      .withColumn(outputCol, col("__graft_rn") + col("__graft_offset"))
      .drop(pidCol, pidCol + "_k", "__graft_rn", "__graft_offset")
      .drop(dropExtra: _*)
  }
}
