package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable global running count (the reference's AGGREGATE op,
  * Operators.java:57-63 / :93-100 — emits 1,2,3,... one output per input).
  *
  * A naive `count(*) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` collapses
  * the whole dataset into ONE window partition, so it cannot scale past a
  * single executor. Instead: classic two-phase prefix sum.
  *
  * Preferred path (numeric/temporal first order key): VALUE-RANGE buckets.
  *   1. in-plan `percentile_approx` of the key -> ~equi-depth boundaries,
  *      broadcast (no driver collect);
  *   2. bucket(row) = #boundaries <= key — a pure function of the VALUE, so
  *      both passes below see identical bucketing with no pinning/caching;
  *   3. pass A: row_number windowed per bucket (parallel);
  *      pass B: per-bucket counts -> prefix-summed offsets via a window over
  *      the tiny (numPartitions-row) aggregate, broadcast-joined back.
  * Spark reuses the boundary broadcast across both passes; nothing is
  * persisted and nothing round-trips the driver — this holds on a
  * 1000-executor cluster.
  *
  * Fallback path (non-orderable-by-percentile key types, e.g. strings):
  * range-repartition by the key and pin the sampled partitioning with an
  * eager localCheckpoint (sampling is nondeterministic, so phases must not
  * re-draw), then the same per-partition prefix sum keyed on partition id.
  *
  * Ties get an arbitrary but consistent order, same as the reference's
  * arrival-order results log (SURVEY.md §4); order by a unique key for
  * determinism. All-equal keys degenerate to one bucket — the inherent
  * serial case of a totally-ordered running count.
  */
object RunningCount {

  private val B = "__graft_bucket"

  def withRunningCount(
      df: DataFrame,
      orderCols0: Seq[Column],
      outputCol: String = "running_count",
      numPartitions: Option[Int] = None): DataFrame = {
    val arrivalCol = "__graft_arrival"
    // No order key (e.g. a Select dropped the lineage columns): fall back to
    // arrival order via monotonically_increasing_id — matching the
    // reference's nondeterministic arrival-order results log.
    val (base, orderCols, dropExtra) =
      if (orderCols0.nonEmpty) (df, orderCols0, Seq.empty[String])
      else (df.withColumn(arrivalCol, monotonically_increasing_id()),
            Seq(col(arrivalCol)), Seq(arrivalCol))
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)

    val keyType = base.select(orderCols.head).schema.head.dataType
    val quantileable = keyType match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val out =
      if (parts <= 1) singlePartition(base, orderCols, outputCol)
      else if (quantileable) quantileBuckets(base, orderCols, outputCol, parts)
      else rangeCheckpoint(base, orderCols, outputCol, parts)
    out.drop(dropExtra: _*)
  }

  /** Degenerate single-partition case: the plain global window. */
  private def singlePartition(df: DataFrame, orderCols: Seq[Column], outputCol: String) =
    df.withColumn(outputCol,
      row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  private def quantileBuckets(
      df: DataFrame, orderCols: Seq[Column], outputCol: String, parts: Int): DataFrame = {
    val key = orderCols.head
    val probs = (1 until parts).map(i => lit(i.toDouble / parts))
    val bounds = df.agg(
      percentile_approx(key, array(probs: _*), lit(10000)).as("__graft_bounds"))
    val bucketed = df
      .crossJoin(broadcast(bounds))
      .withColumn(B, coalesce(
        aggregate(col("__graft_bounds"), lit(0),
          (acc, b) => acc + when(key >= b, 1).otherwise(0)),
        lit(0)))
      .drop("__graft_bounds")

    val w = Window.partitionBy(col(B)).orderBy(orderCols: _*)
    val withRn = bucketed.withColumn("__graft_rn", row_number().over(w).cast("long"))

    // numPartitions-row aggregate: a single tiny window partition is fine.
    val offsets = bucketed.groupBy(col(B))
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn("__graft_offset", coalesce(
        sum(col("__graft_cnt")).over(
          Window.orderBy(col(B)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(B), col("__graft_offset"))

    withRn.join(broadcast(offsets), B)
      .withColumn(outputCol, col("__graft_rn") + col("__graft_offset"))
      .drop(B, "__graft_rn", "__graft_offset")
  }

  private def rangeCheckpoint(
      df: DataFrame, orderCols: Seq[Column], outputCol: String, parts: Int): DataFrame = {
    val pidCol = "__graft_pid"
    // Eager localCheckpoint pins the sampled range boundaries AND the
    // partition ids so both phases see identical partitioning on
    // re-execution, without a session-lifetime cache entry (checkpointed
    // blocks are released with the RDD).
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint(true)

    val w = Window.partitionBy(col(pidCol)).orderBy(orderCols: _*)
    val withRn = ranged.withColumn("__graft_rn", row_number().over(w).cast("long"))

    val offsets = ranged.groupBy(col(pidCol))
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn("__graft_offset", coalesce(
        sum(col("__graft_cnt")).over(
          Window.orderBy(col(pidCol)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(pidCol), col("__graft_offset"))

    withRn.join(broadcast(offsets), pidCol)
      .withColumn(outputCol, col("__graft_rn") + col("__graft_offset"))
      .drop(pidCol, "__graft_rn", "__graft_offset")
  }
}
