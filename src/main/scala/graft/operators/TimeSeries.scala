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
    * fold — per-key state is the day series: ONE double per OBSERVED day
    * per key, so it is bounded by the calendar span (10 years of daily
    * history = ~3.7k doubles = ~30 KB per key), never by the event
    * volume. `maxDays` fail-fasts in-plan if a key's observed-day count
    * exceeds that assumption (sub-daily keys misrouted here, a far-past
    * garbage timestamp stretching the calendar) instead of silently
    * building giant rows — re-bucket or split upstream. */
  def holtForecast(
      events: DataFrame,
      alpha: Double = 0.5,
      beta: Double = 0.25,
      horizon: Int = 7,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      maxDays: Int = 40000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(horizon >= 0, s"horizon must be >= 0: $horizon")
    require(maxDays >= 1, s"maxDays must be >= 1: $maxDays")
    val series = dailySeries(events, keyCol, tsCol, maxDays)
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

  /** Shared (key, day) collapse + day-sorted per-key count series for the
    * Holt family, with the in-plan `maxDays` guard: the per-key state
    * contract is ONE double per observed day, so a key whose calendar
    * exceeds `maxDays` raises inside the plan (zero cost on the healthy
    * path — the predicate is one `size()` compare per key row). */
  private def dailySeries(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      maxDays: Int): DataFrame = {
    val daily = events
      .groupBy(col(keyCol),
        floor(unix_micros(col(tsCol)) / lit(86400000000L)).cast("long").as("__day"))
      .agg(count(lit(1)).cast("long").as("__y"))
    val ys = transform(sort_array(collect_list(struct(col("__day"), col("__y")))),
      e => e.getField("__y").cast("double"))
    daily.groupBy(col(keyCol))
      .agg(ys.as("__ys0"))
      .select(col(keyCol),
        when(size(col("__ys0")) > maxDays,
          raise_error(concat(
            lit(s"holt: key "), col(keyCol).cast("string"),
            lit(s" has more than maxDays=$maxDays observed days — the"),
            lit(" per-key state contract is one double per observed day;"),
            lit(" re-bucket sub-daily keys or split the calendar upstream"))))
          .otherwise(col("__ys0")).as("__ys"))
  }

  /** Holt–Winters TRIPLE exponential smoothing — [[holtForecast]] plus an
    * ADDITIVE seasonal component of period `p` over each key's daily
    * event counts (the weekly-rhythm activity forecast):
    * `l_t = α(y_t − s_{t−p}) + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`,
    * `s_t = γ(y_t − l_t) + (1−γ)s_{t−p}`,
    * seeded over the FIRST period: `l_p = (Σ_{i≤p} y_i)/p`, `b_p = 0`,
    * `s_i = y_i − l_p` for `i = 1..p`; the fold then runs observations
    * `p+1..n` in day order. Returns `(key, n_days, level, trend, season,
    * forecast)` where `season` is the seasonal index of slot
    * `((n+h−1) mod p)+1` — the slot horizon `h` lands on — and
    * `forecast = level + h·trend + season`.
    *
    * Determinism: same contract as [[holtForecast]] — exact integer
    * counts, dyadic α/β/γ recommended, and a FIXED-ORDER left fold (the
    * seasonal array updates ONE slot per step), so every double is the
    * same correctly-rounded IEEE sequence on any engine or partitioning;
    * the seed mean's Σy is an exact integer sum (order-free) with one
    * division. Keys with fewer than `p` observed days are DROPPED — not
    * enough data to seed a seasonal model; densify with the calendar
    * resample or fall back to [[holtForecast]] for them. The fold runs
    * over OBSERVED days only, so gaps compress the season — resample
    * first when true calendar periodicity matters.
    *
    * Scale shape: identical to [[holtForecast]] — one (key, day)
    * partial-agg collapse, one key-keyed sorted-collect fold; per-key
    * state adds only the p-slot seasonal array ([[dailySeries]]'s
    * `maxDays` guard bounds the series itself). */
  def holtWinters(
      events: DataFrame,
      period: Int = 7,
      alpha: Double = 0.5,
      beta: Double = 0.25,
      gamma: Double = 0.25,
      horizon: Int = 7,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      maxDays: Int = 40000): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0,1]: $gamma")
    require(horizon >= 0, s"horizon must be >= 0: $horizon")
    require(maxDays >= period, s"maxDays must be >= period: $maxDays")
    val p = period
    val series = dailySeries(events, keyCol, tsCol, maxDays)
      .filter(size(col("__ys")) >= p)
    // seed: exact-integer Σ over the first period, one division; seasonal
    // slots are the first-period residuals against that mean
    val seeded = series
      .withColumn("__l0",
        aggregate(slice(col("__ys"), 1, p), lit(0.0), (a, y) => a + y) /
          lit(p.toDouble))
      .withColumn("__s0", transform(slice(col("__ys"), 1, p), y => y - col("__l0")))
    // one fold step: slot(t) = ((t-1) mod p) + 1 reads s_{t-p} (same slot,
    // written p steps ago) and writes s_t back into that slot
    def step(acc: Column, y: Column): Column = {
      val t = acc.getField("t") + 1
      val slot = pmod(t - 1, lit(p)) + 1
      val sOld = element_at(acc.getField("s"), slot)
      def lNew: Column =
        lit(alpha) * (y - sOld) +
          lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
      val bNew = lit(beta) * (lNew - acc.getField("l")) +
        lit(1.0 - beta) * acc.getField("b")
      val sVal = lit(gamma) * (y - lNew) + lit(1.0 - gamma) * sOld
      val sNew = zip_with(acc.getField("s"),
        sequence(lit(1), lit(p)),
        (sv, i) => when(i === slot, sVal).otherwise(sv))
      struct(lNew.as("l"), bNew.as("b"), sNew.as("s"), t.as("t"))
    }
    val folded = seeded.withColumn("__st", aggregate(
      slice(col("__ys"), lit(p + 1), greatest(size(col("__ys")) - p, lit(0))),
      struct(col("__l0").as("l"), lit(0.0).as("b"), col("__s0").as("s"),
        lit(p).as("t")),
      (acc, y) => step(acc, y)))
    val hSlot = pmod(size(col("__ys")) + lit(horizon) - 1, lit(p)) + 1
    folded.select(col(keyCol),
      size(col("__ys")).cast("long").as("n_days"),
      col("__st.l").as("level"),
      col("__st.b").as("trend"),
      element_at(col("__st.s"), hSlot).as("season"),
      (col("__st.l") + lit(horizon.toDouble) * col("__st.b") +
        element_at(col("__st.s"), hSlot)).as("forecast"))
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

  /** Per-key dispersion (Fano) index of the daily count series — the
    * burstiness diagnostic: a Poisson-arrival event type has Fano ≈ 1,
    * campaign-driven or incident-driven types read ≫ 1, rate-limited
    * ones ≪ 1. Fano = Var/Mean over the shared zero-filled calendar:
    * with integer daily counts, Var·n² = n·Σc² − S² and Mean = S/n, so
    * Fano = (n·Σc² − S²)/(n·S) — exact DECIMAL(38,0) integers, ONE
    * double division per key (plus the mean readout). A key with zero
    * total mass nulls the index.
    *
    * Scale shape: one (key, day) partial agg, the 1-row calendar-bounds
    * broadcast, and a key-level agg over day rows — days × keys rows
    * end to end. */
  def dispersionIndex(
      events: DataFrame,
      catCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def d18(c: Column) = c.cast("decimal(18,0)")
    val usPerDay = 86400000000L
    val daily = events.filter(col(tsCol).isNotNull && col(catCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"),
        col(catCol).cast("string").as("key"))
      .groupBy("key", "__d").agg(count(lit(1)).as("__c"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1").isNotNull, col("__d1")).otherwise(raise_error(
          lit("dispersionIndex: no events — no series to measure"))
          .cast("long")).as("__d1"))
    // the shared calendar: every key is scored over the SAME span, so a
    // key dark for half the corpus's life correctly reads as bursty
    val spine = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .crossJoin(daily.select("key").distinct())
    val series = spine.join(daily, Seq("key", "__d"), "left")
      .select(col("key"), coalesce(col("__c"), lit(0L)).as("__c"))
    val agg = series.groupBy("key")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(d18(col("__c"))).cast("decimal(38,0)").as("s"),
        sum(d18(col("__c")) * d18(col("__c"))).cast("decimal(38,0)").as("sxx"))
    val varNum = dec(col("n")) * col("sxx") - col("s") * col("s")
    agg.select(col("key"), col("n"), col("s"), col("sxx"),
      (col("s").cast("double") / col("n").cast("double")).as("mean"),
      when(col("s") =!= 0L,
        varNum.cast("double") / (col("n").cast("double") * col("s").cast("double")))
        .otherwise(lit(null).cast("double")).as("fano"))
  }

  /** EXACT Mann–Kendall trend test on the daily event-count series — the
    * nonparametric "is activity monotonically rising or falling"
    * verdict ([[EventSignals]]' activityTrend fits a least-squares SLOPE;
    * Mann–Kendall asks only about pair ORDER, so one spike day can't
    * fake a trend): S = Σ_{i<j} sign(cⱼ − cᵢ) over the zero-filled
    * calendar, with the tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t m_t(m_t−1)(2m_t+5) and the
    * continuity-corrected z = (S ∓ 1)/√(Var).
    *
    * Engine-portable arithmetic: S and the 18-scaled variance numerator
    * are exact DECIMAL(38,0) integers; z is one fixed-order double
    * expression (√(var18/18)). S = 0 reads z = 0 exactly; a constant
    * series (all-tied, Var = 0) nulls z.
    *
    * Scale shape: the day-keyed partial agg + zero-filled spine (the
    * [[autocorrelation]] machinery), then one CALENDAR-bounded pair join
    * (days², broadcast side — ten years of daily history is ~3.7k rows,
    * 13M pairs, executor-trivial) and a series-value histogram for tie
    * groups. Nothing data-sized past the first shuffle. */
  def mannKendall(
      events: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val usPerDay = 86400000000L
    val daily = events.filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__c"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1") > col("__d0"), col("__d1"))
          .otherwise(raise_error(lit(
            "mannKendall: need at least 2 days of data")).cast("long"))
          .as("__d1"))
    val series = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .join(daily, Seq("__d"), "left")
      .crossJoin(broadcast(span))
      .select((col("__d") - col("__d0") + 1L).as("__r"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val s2 = series.select(col("__r").as("__r2"), col("__c").as("__c2"))
    val sAgg = series.join(broadcast(s2), col("__r2") > col("__r"))
      .agg(coalesce(sum(signum(col("__c2") - col("__c")).cast("long")),
        lit(0L)).cast("decimal(38,0)").as("s"))
    val tot = series.agg(count(lit(1)).cast("long").as("n"))
    // tie groups over the SERIES VALUES: m_t = how many days share count t
    val ties = series.groupBy("__c").agg(count(lit(1)).as("__m"))
      .select((dec(col("__m")) * dec(col("__m") - 1) *
        dec(lit(2L) * col("__m") + 5L)).as("__tt"))
      .agg(coalesce(sum(col("__tt")), lit(0L).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("__tsum"))
    val var18 = (dec(col("n")) * dec(col("n") - 1) *
      dec(lit(2L) * col("n") + 5L) - col("__tsum")).cast("decimal(38,0)")
    sAgg.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("n"), col("s"), var18.as("var18"),
        when(var18 === 0L, lit(null).cast("double"))
          .when(col("s") > 0,
            (col("s").cast("double") - lit(1.0)) /
              sqrt(var18.cast("double") / lit(18.0)))
          .when(col("s") < 0,
            (col("s").cast("double") + lit(1.0)) /
              sqrt(var18.cast("double") / lit(18.0)))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Theil–Sen slope of the daily event-count series — the ROBUST trend
    * ESTIMATE beside [[mannKendall]]'s trend TEST (MK says whether a
    * monotone trend exists; Sen's slope says how steep, with a 29.3%
    * breakdown point where least squares ([[EventSignals]].activityTrend)
    * is wrecked by one spike day): the median over all C(n,2) pairwise
    * slopes (cⱼ−cᵢ)/(j−i).
    *
    * Engine-portable arithmetic: each pair slope is ONE double division
    * of exact integers, quantized to round(slope·10⁶) — so the median
    * runs over INTEGRAL values, the regime where the distributed
    * exact-quantile machinery is gate-proven bit-equal to the oracle
    * engine's quantile_cont ([[graft.operators.Curation
    * .exactQuantilesDistributed]]); `sen_slope_micro` is that median in
    * 10⁻⁶ counts/day units (an even pair count can land on an exact .5).
    *
    * Scale shape: the day-keyed partial agg + zero-filled spine, one
    * CALENDAR-bounded pair join (days², broadcast side — the
    * [[mannKendall]] budget), then the quantile path's distinct-value
    * histogram. Nothing data-sized past the first shuffle. */
  def theilSen(
      events: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    val usPerDay = 86400000000L
    val daily = events.filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__c"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1") > col("__d0"), col("__d1"))
          .otherwise(raise_error(lit(
            "theilSen: need at least 2 days of data")).cast("long"))
          .as("__d1"))
    val series = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .join(daily, Seq("__d"), "left")
      .crossJoin(broadcast(span))
      .select((col("__d") - col("__d0") + 1L).as("__r"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val s2 = series.select(col("__r").as("__r2"), col("__c").as("__c2"))
    // the division is GUARDED even though the join admits only gap >= 1:
    // a downstream isnotnull filter (the quantile path's) merges into
    // this non-equi join's condition, and predicate reordering can
    // evaluate it on gap = 0 pairs BEFORE the rank check — under ANSI
    // that throws; CaseWhen short-circuits, so the guard is ordering-proof
    val gap = col("__r2") - col("__r")
    val slopes = series.join(broadcast(s2), col("__r2") > col("__r"))
      .select(round(when(gap > 0,
          (col("__c2") - col("__c")).cast("double") / gap.cast("double"))
          * lit(1000000.0))
        .cast("long").as("__sq"))
    val med = graft.operators.Curation
      .exactQuantilesDistributed(slopes, "__sq", Seq(0.5))
      .select(col("value").as("sen_slope_micro"))
    val counts = series.agg(count(lit(1)).cast("long").as("n_days"),
      (count(lit(1)) * (count(lit(1)) - 1) / 2).cast("long").as("n_pairs"))
    counts.crossJoin(broadcast(med))
  }

  /** Single changepoint by BINARY SEGMENTATION over the daily count
    * series — the offline "WHEN did the level shift" answer that
    * [[cusumChanges]]' sequential detector (tuned for ingest-time
    * alerting) does not give: choose the split s maximizing the
    * between-segment fit gain G(s) = L(s)²/s + R(s)²/(n−s) (the
    * two-segment least-squares decomposition: maximizing G minimizes
    * within-segment sum of squares for mean models). Recurse on the
    * halves caller-side for multiple changepoints — each level is one
    * more pass of the same plan.
    *
    * Engine-portable arithmetic: prefix sums are exact integers (the
    * two-phase machinery); G(s) is TWO double divisions + one add of
    * exactly-representable integers, identical op order in both
    * engines, and the argmax breaks ties (score desc, s asc) — so the
    * chosen split is a pure data function. Segment means are one
    * division each.
    *
    * Scale shape: day-keyed partial agg + spine, one two-phase prefix
    * pass over the calendar-sized series, a 1-row total broadcast, and
    * a top-1 selection — nothing data-sized past the first shuffle. */
  def changepoint(
      events: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    val usPerDay = 86400000000L
    val daily = events.filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__c"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1") > col("__d0"), col("__d1"))
          .otherwise(raise_error(lit(
            "changepoint: need at least 2 days of data")).cast("long"))
          .as("__d1"))
    val series = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .join(daily, Seq("__d"), "left")
      .crossJoin(broadcast(span))
      .select(col("__d"), (col("__d") - col("__d0") + 1L).as("__r"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val pre = graft.ops.RunningCount.withRunningAgg(series, col("__c"),
      graft.ops.RunningCount.Kind.Sum, Seq(col("__r")), "__cum")
    val tot = series.agg(count(lit(1)).cast("long").as("__n"),
      sum(col("__c")).cast("long").as("__tot"))
    val lsum = col("__cum").cast("long")
    val rsum = col("__tot") - lsum
    val rn = col("__n") - col("__r")
    // rn divisions guarded (the theilSen lesson): the __r < __n filter
    // can merge into a join condition and reorder ahead of itself —
    // CaseWhen keeps the ANSI division unreachable at rn = 0
    def overRn(c: Column) = when(rn > 0, c / rn.cast("double"))
    val score = lsum.cast("double") * lsum.cast("double") / col("__r").cast("double") +
      overRn(rsum.cast("double") * rsum.cast("double"))
    val scored = pre.crossJoin(broadcast(tot))
      .filter(col("__r") < col("__n")) // s in [1, n-1]
      .select(col("__d").as("split_day"), col("__r").as("split_r"),
        col("__n").as("n_days"), lsum.as("lsum"), rsum.as("rsum"),
        score.as("__g"),
        (lsum.cast("double") / col("__r").cast("double")).as("mean_left"),
        overRn(rsum.cast("double")).as("mean_right"))
    // 1-row argmax: (score desc, split asc) via max_by on an orderable
    // struct — no global sort
    scored
      .agg(max_by(
        struct(col("split_day"), col("split_r"), col("n_days"),
          col("lsum"), col("rsum"), col("mean_left"), col("mean_right")),
        struct(col("__g"), (-col("split_r")).as("__tb"))).as("__w"))
      .select(col("__w.split_day"), col("__w.split_r"), col("__w.n_days"),
        col("__w.lsum"), col("__w.rsum"), col("__w.mean_left"),
        col("__w.mean_right"))
  }

  /** EXACT cross-correlation function between two event types' daily
    * count series at lags −K…K — the LEAD–LAG diagnostic
    * [[autocorrelation]] can't give: r_k correlates aₜ with bₜ₊ₖ, so a
    * peak at k > 0 means A LEADS B by k days (signups lead purchases,
    * errors lead churn). Both series share one zero-filled calendar; the
    * normalizer is the full-series std pair (the statsmodels `ccf`
    * convention), so r₀ is the plain Pearson correlation of the two
    * series.
    *
    * Engine-portable arithmetic (the [[autocorrelation]] discipline):
    * integer epoch-day spine, integer daily counts, n²-scaled exact
    * DECIMAL(38,0) numerators over the matched-pair sums
    *   num_k·n² = n²·Σaₜbₜ₊ₖ − n·S_b·A_k − n·S_a·B_k + (n−|k|)·S_a·S_b
    * and exact variance factors n²·Σa² − n·S_a² — ONE double expression
    * per lag (num/√(va·vb)), in fixed op order. A constant series nulls r.
    *
    * Scale shape: one day-keyed partial agg carrying BOTH series, the
    * zero-filled spine from a 1-row bounds broadcast, and a ×(2K+1)
    * explode of the DAYS frame joined back on the shifted key — days
    * × lags rows, never data-sized. */
  def crossCorrelation(
      events: DataFrame,
      typeA: String,
      typeB: String,
      tsCol: String = "ts",
      catCol: String = "event_type",
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def d18(c: Column) = c.cast("decimal(18,0)")
    val usPerDay = 86400000000L
    val daily = events.filter(col(tsCol).isNotNull &&
        (col(catCol) === typeA || col(catCol) === typeB))
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"),
        col(catCol).as("__cat"))
      .groupBy("__d")
      .agg(sum(when(col("__cat") === typeA, 1L).otherwise(0L)).as("__a"),
        sum(when(col("__cat") === typeB, 1L).otherwise(0L)).as("__b"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1") - col("__d0") + 1 >= maxLag + 2, col("__d1"))
          .otherwise(raise_error(lit(
            s"crossCorrelation: need at least ${maxLag + 2} days of data"))
            .cast("long")).as("__d1"))
    val series = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .join(daily, Seq("__d"), "left")
      .crossJoin(broadcast(span))
      .select((col("__d") - col("__d0") + 1L).as("__r"),
        coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
    val tot = series.agg(count(lit(1)).cast("long").as("n"),
      sum(d18(col("__a"))).cast("decimal(38,0)").as("sa"),
      sum(d18(col("__b"))).cast("decimal(38,0)").as("sb"),
      sum(d18(col("__a")) * d18(col("__a"))).cast("decimal(38,0)").as("saa"),
      sum(d18(col("__b")) * d18(col("__b"))).cast("decimal(38,0)").as("sbb"))
    val lags = (-maxLag to maxLag).map(k => lit(k.toLong))
    val shifted = series.select(col("__r").as("__r2"), col("__b").as("__b2"))
    val perLag = series
      .select(col("__r"), col("__a"), explode(array(lags: _*)).as("k"))
      .join(shifted, col("__r") + col("k") === col("__r2"))
      .crossJoin(broadcast(tot))
      .groupBy("k", "n", "sa", "sb", "saa", "sbb")
      .agg(sum(dec(col("__a")) * dec(col("__b2")))
          .cast("decimal(38,0)").as("sxy"),
        sum(d18(col("__a"))).cast("decimal(38,0)").as("a_k"),
        sum(d18(col("__b2"))).cast("decimal(38,0)").as("b_k"))
    val nD = dec(col("n"))
    val num = nD * nD * col("sxy") - nD * col("sb") * col("a_k") -
      nD * col("sa") * col("b_k") + (nD - dec(abs(col("k")))) * col("sa") * col("sb")
    val va = nD * nD * col("saa") - nD * col("sa") * col("sa")
    val vb = nD * nD * col("sbb") - nD * col("sb") * col("sb")
    perLag.select(col("k"), col("n"), col("sa"), col("sb"),
      col("sxy"), col("a_k"), col("b_k"),
      num.cast("decimal(38,0)").as("num"),
      // a constant series has zero variance — CCF undefined: null, not an
      // ANSI divide-by-zero (the exact decimal test agrees cross-engine)
      when(va =!= 0L && vb =!= 0L,
        num.cast("double") / sqrt(va.cast("double") * vb.cast("double")))
        .otherwise(lit(null).cast("double")).as("r"))
  }

  /** EXACT sample autocorrelation function of the daily event-count
    * series at lags 1…`maxLag` — the seasonality/memory diagnostic the
    * forecasting family reads before choosing a model ([[holtForecast]]
    * assumes short memory, [[holtWinters]] a seasonal period: ACF is how
    * you SEE the period). r_k = Σₜ(cₜ−m̄)(cₜ₊ₖ−m̄) / Σₜ(cₜ−m̄)² with the
    * full-series mean and denominator (the standard biased estimator —
    * what statsmodels/R `acf` compute).
    *
    * Engine-portable arithmetic: days are TIMEZONE-FREE integer epoch-day
    * indexes (`unix_micros div 86400000000`), missing days count 0 (the
    * series is the calendar, not the observed rows), and daily COUNTS are
    * integers — so with m̄ = S/n both sides multiply through by n²:
    *   num_k·n² = n²·Σcₜcₜ₊ₖ − n·S·(A_k + B_k) + (n−k)·S²
    *   den·n²   = n²·Σc² − n·S²
    * with A_k = Σ_{t ≤ n−k} cₜ, B_k = Σ_{t > k} cₜ — ALL exact
    * DECIMAL(38,0) integers; r_k is one fixed-order double division.
    *
    * Scale shape: one day-keyed partial agg collapses the data to the
    * day-count series (the only data-sized pass); the zero-filled
    * calendar comes from a 1-row min/max broadcast + `sequence` explode;
    * lag pairing is a ×maxLag explode of the DAYS frame joined back on
    * the shifted day key — days × maxLag rows, never data-sized. Fails
    * fast in-plan when the series is shorter than `maxLag + 2` days. */
  def autocorrelation(
      events: DataFrame,
      tsCol: String = "ts",
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val usPerDay = 86400000000L
    // integral DIV, not `/` (which is double division): epoch-day index
    // stays an exact long; positive epochs make truncation = floor on
    // both engines (DuckDB `//`)
    val daily = events.filter(col(tsCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__c"))
    val span = daily.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        when(col("__d1") - col("__d0") + 1 >= maxLag + 2, col("__d1"))
          .otherwise(raise_error(lit(
            s"autocorrelation: need at least ${maxLag + 2} days of data"))
            .cast("long")).as("__d1"))
    val series = span
      .select(explode(sequence(col("__d0"), col("__d1"))).as("__d"))
      .join(daily, Seq("__d"), "left")
      .crossJoin(broadcast(span))
      .select((col("__d") - col("__d0") + 1L).as("__r"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = series.agg(count(lit(1)).cast("long").as("n"),
      sum(col("__c").cast("decimal(18,0)")).cast("decimal(38,0)").as("s"),
      sum(col("__c").cast("decimal(18,0)") * col("__c").cast("decimal(18,0)"))
        .cast("decimal(38,0)").as("sxx"))
    val lags = (1 to maxLag).map(k => lit(k.toLong))
    // per lag k: the shifted self-join carries Σ c_t·c_{t+k}; the edge
    // sums A_k (head) and B_k (tail) ride the same exploded frame
    val withLag = series
      .select(col("__r"), col("__c"), explode(array(lags: _*)).as("k"))
    val shifted = series.select(col("__r").as("__r2"), col("__c").as("__c2"))
    val perLag = withLag.crossJoin(broadcast(tot))
      .join(shifted, col("__r") + col("k") === col("__r2"), "left")
      .groupBy("k", "n", "s", "sxx")
      .agg(
        sum(dec(col("__c")) * dec(coalesce(col("__c2"), lit(0L))))
          .cast("decimal(38,0)").as("sxy"),
        sum(when(col("__r") <= col("n") - col("k"),
          col("__c").cast("decimal(18,0)")).otherwise(lit(0L)))
          .cast("decimal(38,0)").as("a_k"),
        sum(when(col("__r") > col("k"),
          col("__c").cast("decimal(18,0)")).otherwise(lit(0L)))
          .cast("decimal(38,0)").as("b_k"))
    val nD = dec(col("n"))
    val num = nD * nD * col("sxy") - nD * col("s") * (col("a_k") + col("b_k")) +
      (nD - dec(col("k"))) * col("s") * col("s")
    val den = nD * nD * col("sxx") - nD * col("s") * col("s")
    perLag.select(col("k"), col("n"), col("s"), col("sxy"),
      col("a_k"), col("b_k"),
      num.cast("decimal(38,0)").as("num"),
      den.cast("decimal(38,0)").as("den"),
      // a constant series has zero variance — ACF undefined: null, not an
      // ANSI divide-by-zero (the exact decimal test agrees cross-engine)
      when(den =!= 0L, num.cast("double") / den.cast("double"))
        .otherwise(lit(null).cast("double")).as("r"))
  }
}
