package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series similarity search over the event stream — the distributed
  * subsequence-matching primitive (UCR-suite-style z-normalized euclidean;
  * cf. "Time Series Similarity Search for Streaming Data in Distributed
  * Systems", EDBT 2019): find the windows of each key's value series that
  * best match a query PATTERN. The anomaly/motif lookup a metrics pipeline
  * runs ("where else does this spike shape occur").
  */
object TimeSeries {

  /** Top-k best-matching sliding windows against `pattern`, by
    * z-NORMALIZED euclidean distance (shape match — offset and amplitude
    * are normalized away; `znorm = false` compares raw values). Windows
    * are the trailing `pattern.length` values per key in (ts, tie) order;
    * incomplete leading windows are skipped. Output: one row per match,
    * `(key, end_ts_us, dist, rank)`, globally ranked by
    * (dist, key, end_ts) — fully deterministic.
    *
    * Numerics: every accumulation is a LEFT-FOLD in array order (Spark
    * `aggregate`/`zip_with` == DuckDB `list_sum ∘ list_transform`, the
    * repo's cross-engine-exact contract), mean/std are single IEEE
    * divisions/sqrt of those folds, and a ZERO-VARIANCE window normalizes
    * to all-zeros (the flat-window convention — comparable, never NaN).
    * The pattern is z-normalized ON THE DRIVER once (it is a constant).
    *
    * Scale shape: ONE per-key window sort builds the trailing arrays
    * (payload = `w` doubles per row — bounded by the pattern length, not
    * the series); distances are scan-local folds; ranking is TWO-LEVEL —
    * per-key top-k first (map-side WindowGroupLimit on the keyed sort),
    * then a global top-k over the |keys|·k survivors, so the single-
    * partition global sort touches candidates, never the series. Hot-key
    * caveat = every per-key window's ([[graft.ops.Skew]]). */
  def patternTopK(
      events: DataFrame,
      pattern: Array[Double],
      k: Int,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      tieCol: String = "event_id",
      znorm: Boolean = true): DataFrame = {
    val w = pattern.length
    require(w >= 2, s"pattern must have >= 2 points: $w")
    require(k >= 1, s"k must be >= 1: $k")
    val q: Array[Double] =
      if (!znorm) pattern
      else {
        val mu = pattern.sum / w
        val sd = math.sqrt(pattern.map(x => (x - mu) * (x - mu)).sum / w)
        if (sd == 0.0) Array.fill(w)(0.0) else pattern.map(x => (x - mu) / sd)
      }
    val qLit = array(q.map(lit): _*)
    val ww = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(w - 1), Window.currentRow)
    val windows = events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__arr", collect_list(col("__v")).over(ww))
      .where(size(col("__arr")) === w)
      .select(col(keyCol), unix_micros(col(tsCol)).as("end_ts_us"), col("__arr"))
    def fsum(c: Column): Column = aggregate(c, lit(0.0), (a, x) => a + x)
    val withZ =
      if (!znorm) windows.withColumn("__z", col("__arr"))
      else {
        val mu = (fsum(col("__arr")) / w).as("__mu")
        windows.withColumn("__mu", mu)
          .withColumn("__sd", sqrt(fsum(transform(col("__arr"),
            x => (x - col("__mu")) * (x - col("__mu")))) / w))
          .withColumn("__z",
            when(col("__sd") === 0.0, transform(col("__arr"), _ => lit(0.0)))
              .otherwise(transform(col("__arr"),
                x => (x - col("__mu")) / col("__sd"))))
      }
    val dist = fsum(zip_with(col("__z"), qLit, (z, p) => (z - p) * (z - p)))
    val scored = withZ.select(col(keyCol), col("end_ts_us"), dist.as("dist"))
    val wk = Window.partitionBy(col(keyCol))
      .orderBy(col("dist").asc, col("end_ts_us").asc)
    val perKey = scored
      .withColumn("__rn", row_number().over(wk))
      .where(col("__rn") <= k)
      .drop("__rn")
    // global rank over |keys|·k candidate rows — bounded by construction
    val wg = Window.orderBy(col("dist").asc, col(keyCol).asc,
      col("end_ts_us").asc)
    perKey
      .withColumn("rank", row_number().over(wg).cast("long"))
      .where(col("rank") <= k)
      .select(col(keyCol), col("end_ts_us"), col("dist"), col("rank"))
  }
}
