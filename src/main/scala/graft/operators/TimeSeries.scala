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

  /** Holt double-exponential smoothing (level + trend, no seasonality)
    * over each key's DAILY EVENT COUNTS — the classic short-horizon
    * activity forecast ("is this user/source ramping up or churning"):
    * `l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}`, seeded `l_0 = y_0, b_0 = 0`;
    * returns `(key, n_days, level, trend, forecast = level + h·trend)`.
    * Deterministic and engine-portable: the series values are exact
    * integer counts, α/β should be dyadic (0.5, 0.25 — stateable
    * literals), and the recurrence is a FIXED-ORDER left fold over the
    * day-sorted series, so every double is the same correctly-rounded
    * IEEE sequence on any engine or partitioning. The fold runs over
    * OBSERVED days only — densify with [[graft.operators.EventSignals]]'
    * calendar resample first when gaps should decay the trend.
    *
    * Scale shape: one (key, day) partial-agg collapse (the calendar is
    * tiny next to the event volume), then one key-keyed sorted-collect
    * fold — per-key state is the day series (bounded by the calendar,
    * the sessionize-style per-key assumption), never the raw events. */
  def holtForecast(
      events: DataFrame,
      alpha: Double = 0.5,
      beta: Double = 0.25,
      horizon: Int = 7,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(horizon >= 0, s"horizon must be >= 0: $horizon")
    val daily = events
      .groupBy(col(keyCol),
        floor(unix_micros(col(tsCol)) / lit(86400000000L)).cast("long").as("__day"))
      .agg(count(lit(1)).cast("long").as("__y"))
    val series = daily.groupBy(col(keyCol))
      .agg(transform(sort_array(collect_list(struct(col("__day"), col("__y")))),
        e => e.getField("__y").cast("double")).as("__ys"))
    def lNew(acc: Column, y: Column): Column =
      lit(alpha) * y + lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
    val folded = series.withColumn("__st", aggregate(
      slice(col("__ys"), lit(2), greatest(size(col("__ys")) - 1, lit(0))),
      struct(element_at(col("__ys"), 1).as("l"), lit(0.0).as("b")),
      (acc, y) => struct(
        lNew(acc, y).as("l"),
        (lit(beta) * (lNew(acc, y) - acc.getField("l")) +
          lit(1.0 - beta) * acc.getField("b")).as("b"))))
    folded.select(col(keyCol),
      size(col("__ys")).cast("long").as("n_days"),
      col("__st.l").as("level"),
      col("__st.b").as("trend"),
      (col("__st.l") + lit(horizon.toDouble) * col("__st.b")).as("forecast"))
  }

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
