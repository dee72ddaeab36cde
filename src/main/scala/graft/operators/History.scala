package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal table maintenance — the two operators every warehouse-shaped
  * corpus store needs around its fact tables: slowly-changing-dimension
  * (Type 2) history derivation from an event log, and CDC-changelog
  * compaction to latest state. The reference has no analog (its jobs are
  * stateless per-tuple chains); these are the standard "what did the
  * record look like over time / what does it look like now" queries a
  * 100 TB ingest pipeline answers before training-data snapshots are cut.
  */
object History {

  /** SCD Type-2 history: collapse an ordered per-key event stream into
    * value RUNS — one row per maximal span of consecutive equal
    * `stateCol` values, with `valid_from_us` (epoch micros of the run's
    * first event), `valid_to_us` (first event of the NEXT run; null for
    * the key's current run) and `n_events` in the run. The classic
    * gaps-and-islands derivation: change-flag via lag (null-safe, so a
    * null state is a legal value and the key's first event always opens
    * run 1), running sum of flags = run id, then one aggregate per run.
    *
    * Determinism: ties in `tsCol` are broken by `tieCol` (a unique id),
    * so the run segmentation is a pure function of the data.
    *
    * Scale shape: ONE shuffle. The lag + running-sum windows hash-partition
    * by `keyCol`; the (key, run) aggregate and the lead(valid_from) window
    * both require only clustering by a SUPERSET of `keyCol`, which the
    * existing HashPartitioning(key) already satisfies — EnsureRequirements
    * inserts no further exchange (sorts are partition-local). Per-key state
    * is a window sort, so the scale hazard is the usual hot-key one
    * (documented with [[graft.ops.Skew.dropHotKeys]] as the guard); rows
    * carried are (key, state, ts) — the payload never rides along. */
  def scd2(
      events: DataFrame,
      keyCol: String = "user_id",
      stateCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val order = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val runs = events
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      // IS DISTINCT FROM: the first row's lag is null, which differs from
      // any non-null state; two consecutive nulls are the SAME run.
      .withColumn("__chg",
        when(lag(col(stateCol), 1).over(w) <=> col(stateCol), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perRun = runs
      .groupBy(col(keyCol), col("__run"))
      .agg(
        // all states within a run are equal by construction; min is just
        // the engine-portable way to pick the representative
        min(col(stateCol)).as("state"),
        min(unix_micros(col(tsCol))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    perRun
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wNext))
      .select(col(keyCol), col("state"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
  }

  /** Point-in-time (AS OF) snapshot from the [[scd2]] history: each key's
    * state whose validity span covers `asOfUs` — the temporal-table read
    * every backfill/repro job needs ("what did every user look like when
    * the training snapshot was cut"). A key whose FIRST run opens after
    * `asOfUs` is absent (it did not exist yet); the current run's open
    * end (null valid_to) covers any later time.
    *
    * Scale shape: inherits [[scd2]]'s single keyed exchange; the span
    * filter is a per-row predicate on the run rows (at most one run per
    * key matches, by construction of the non-overlapping spans). */
  def asOf(
      events: DataFrame,
      asOfUs: Long,
      keyCol: String = "user_id",
      stateCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame =
    scd2(events, keyCol, stateCol, tsCol, tieCol)
      .where(col("valid_from_us") <= asOfUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
      .select(col(keyCol), col("state"), col("valid_from_us"), col("n_events"))

  /** CDC-changelog compaction: reduce an (insert/update/delete) log to the
    * LATEST surviving state per key — the read side of a MERGE/upsert
    * pipeline. The newest row per key (by `orderCols`, last wins) decides:
    * if its op is `deleteOp` the key is absent from the output, otherwise
    * the row's payload is the key's current state. `n_ops` reports the
    * full log depth per key (tombstoned keys report nothing — they are
    * gone, which IS the contract).
    *
    * Scale shape: ONE partial-aggregable keyed shuffle — `max_by` over a
    * struct ordering key is an ordinary declarative aggregate, so the
    * map side reduces every partition to at most one candidate row per
    * key before anything moves. This deliberately beats the
    * row_number()=1 window formulation: no per-key sort, no
    * whole-log shuffle — at 100 TB of changelog the exchange carries
    * one row per (partition x key), not one per log entry.
    *
    * @param orderCols recency order, later = newer; ties must be broken
    *   by a unique final column or the winner is undefined.
    * @param payloadCols columns to carry into the output state row. */
  def cdcLatest(
      log: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      payloadCols: Seq[String],
      opCol: String = "op",
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val payload = struct((opCol +: payloadCols).map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    log
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("__last"), count(lit(1)).as("n_ops"))
      .where(col(s"__last.$opCol") =!= lit(deleteOp))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__last.$c").as(c)) :+ col("n_ops"): _*)
  }
}
