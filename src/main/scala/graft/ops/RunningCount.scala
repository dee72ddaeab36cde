package graft.ops

import graft.functions.BucketIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpr
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
  *      eagerly localCheckpoint'ed (ONE tiny row) so the nondeterministic
  *      approx-percentile draw is pinned — both passes below must bucket
  *      identically, and relying on ReuseExchange to dedupe the two plan
  *      subtrees is not a guarantee (config-off or AQE canonicalization
  *      divergence would silently re-draw);
  *   2. bucket(row) = binary search of the key in the broadcast boundary
  *      array (native codegen'd [[BucketIndex]], O(log parts) per row) —
  *      a pure function of the VALUE, honoring desc/nulls ordering;
  *   3. pass A: row_number windowed per bucket (parallel);
  *      pass B: per-bucket counts -> prefix-summed offsets via a window over
  *      the tiny (numPartitions-row) aggregate, broadcast-joined back.
  * Nothing round-trips the driver — this holds on a 1000-executor cluster.
  *
  * Order keys may be plain columns or explicit sort orders
  * (`col(k).desc`, `col(k).asc_nulls_last`, ...): the head key's direction
  * and null placement are honored in the bucketing so the concatenated
  * per-bucket numbering matches the window's global order.
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

    // The head key drives the bucketing; callers may hand us a SortOrder
    // (col(k).desc) — unwrap it and carry direction + null placement into
    // the bucket function (Spark defaults: asc = NULLS FIRST, desc = LAST).
    val (keyCol, descending, nullsFirst) =
      GraftExpr.sortOrder(orderCols.head).getOrElse((orderCols.head, false, true))
    val keyType = base.select(keyCol).schema.head.dataType
    val rankKey = toRankDouble(keyCol, keyType)
    val out =
      if (parts <= 1) singlePartition(base, orderCols, outputCol)
      else if (rankKey.isDefined)
        quantileBuckets(base, rankKey.get, orderCols, descending, nullsFirst, outputCol, parts)
      else rangeCheckpoint(base, orderCols, outputCol, parts)
    out.drop(dropExtra: _*)
  }

  /** Monotone double image of an orderable key, for percentile bucketing.
    * Monotone-non-decreasing is all bucketing needs: a (rare, >2^53) double
    * collision merges two adjacent buckets' boundary rows, affecting balance
    * only, never the final numbering. */
  private def toRankDouble(key: Column, keyType: DataType): Option[Column] = keyType match {
    case _: NumericType => Some(key.cast("double"))
    case DateType => Some(unix_date(key).cast("double"))
    case TimestampType => Some(key.cast("double"))
    case TimestampNTZType => Some(key.cast("timestamp").cast("double"))
    case _ => None
  }

  /** Degenerate single-partition case: the plain global window. */
  private def singlePartition(df: DataFrame, orderCols: Seq[Column], outputCol: String) =
    df.withColumn(outputCol,
      row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  private def quantileBuckets(
      df: DataFrame,
      rankKey: Column,
      orderCols: Seq[Column],
      descending: Boolean,
      nullsFirst: Boolean,
      outputCol: String,
      parts: Int): DataFrame = {
    val probs = (1 until parts).map(i => lit(i.toDouble / parts))
    // ONE row of ~parts doubles; the eager localCheckpoint pins the
    // approx-percentile draw (see scaladoc) at the cost of materializing a
    // single tiny partition.
    val bounds = df.agg(
      percentile_approx(rankKey, array(probs: _*), lit(10000)).as("__graft_bounds"))
      .localCheckpoint(true)
    val bucketed = df
      .crossJoin(broadcast(bounds))
      .withColumn(B, GraftExpr.column(BucketIndex(
        GraftExpr.expression(rankKey),
        GraftExpr.expression(col("__graft_bounds")),
        descending, nullsFirst)))
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
