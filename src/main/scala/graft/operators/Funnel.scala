package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event stream: for each user, the
  * earliest time they completed step 1, then step 2 STRICTLY AFTER step 1,
  * and so on — the sequential-conversion query behind every "view → click →
  * purchase" dashboard. No reference analog (its AGGREGATE is a row
  * counter); included as part of the events-analytics surface next to the
  * window aggregates.
  *
  * Scale shape: one user-keyed aggregation per step plus a user-keyed join
  * back — every stage keys on the SAME column, and each step's event scan
  * pushes its own `event_type` predicate to the source (plan-verified). The
  * per-step aggregated frames shrink monotonically (funnel survivors), so
  * AQE broadcasts them against the event scans where they fit and falls
  * back to same-key sort-merge where they don't; per-user event lists are
  * never collected (no collect_list funnel — per-user history can be
  * unbounded at 100 TB). Dropped-off users keep null step times via left
  * joins. */
object Funnel {

  /** One row per user who completed step 1, with nullable `t1..tk` epoch
    * columns: `t(i)` = min event time of `steps(i)` strictly after
    * `t(i-1)`.
    *
    * `within` bounds the WHOLE funnel: later steps count only at or before
    * `t1 + within` (the "converted within an hour" constraint every funnel
    * dashboard has). Note the min times are greedy per step — earliest
    * step-2 first, then earliest step-3 after it — which is the standard
    * dashboard semantics, not a search over all event combinations. */
  def funnelTimes(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      within: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val withinMicros = within.map(graft.ops.Intervals.subDayMicros)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.drop(1).zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val carried = if (prev == "t1") Seq(col(userCol), col(prev))
                    else Seq(col(userCol), col(prev), col("t1"))
      val windowOk = withinMicros.fold(lit(true)) { m =>
        unix_micros(col(tsCol)) <= unix_micros(col("t1")) + lit(m)
      }
      val nxt = events.filter(col(typeCol) === step)
        .join(acc.select(carried: _*).filter(col(prev).isNotNull), Seq(userCol))
        .filter(col(tsCol) > col(prev) && windowOk)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  /** Cohort retention: users bucketed by the period of their FIRST event
    * (cohort = epoch-period index of min ts), then distinct active users
    * counted per (cohort, periods-since-first). All integer date
    * arithmetic — day diffs and integer division — so the result is exact
    * and engine-portable. Scale shape: one user-keyed aggregation, one
    * same-key join back (first-event frame ≤ one row per user; AQE
    * broadcasts it when it fits), then a distinct-count shuffle keyed by
    * (cohort, offset, user) with partial aggregation — the output is
    * cohorts × offsets rows, tiny at any scale. */
  def retention(
      events: DataFrame,
      periodDays: Int = 7,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(periodDays > 0, s"periodDays must be positive: $periodDays")
    val first = events.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    events.join(first, Seq(userCol))
      .select(col(userCol),
        // floor division, not `div`: `div` truncates toward zero, so a
        // pre-1970 first event (negative days-since-epoch) would merge the
        // epoch-adjacent cohorts and diverge from DuckDB's flooring `//`.
        // datediff is an int (±2.4M days at timestamp range), exact in the
        // double floor.
        expr(s"floor(datediff(CAST(__t0 AS DATE), DATE '1970-01-01') / $periodDays)")
          .cast("long").as("cohort"),
        expr(s"floor(datediff(CAST($tsCol AS DATE), CAST(__t0 AS DATE)) / $periodDays)")
          .cast("long").as("period_offset"))
      .groupBy("cohort", "period_offset")
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Gap-based batch sessionization: events more than `gap` apart start a
    * new session; `session_idx` is the user-scoped ordinal (0-based) — the
    * batch analog of the streaming session window (which aggregates; this
    * LABELS, so downstream work can group arbitrarily). One keyed shuffle:
    * a per-user window computing lag + a running sum of session starts —
    * both incremental frames, O(1) window state, no event buffering.
    * Integer epoch-micros arithmetic throughout, engine-exact. */
  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val gapMicros = graft.ops.Intervals.subDayMicros(gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val tUs = unix_micros(col(tsCol))
    val isNew = when(
      tUs - lag(tUs, 1).over(w) > lit(gapMicros), 1L).otherwise(0L)
    events.withColumn("session_idx", sum(isNew).over(w))
  }

  /** Event-transition matrix (first-order Markov chain over event types):
    * for every consecutive pair of events BY THE SAME USER in time order,
    * count `from_type -> to_type` transitions and the transition
    * probability p = n / (transitions leaving from_type). The
    * next-event-prediction summary that sits next to funnels and
    * sessionization in every product-analytics suite.
    *
    * Determinism: the per-user order is (ts, orderCols...) so same-ts
    * events resolve identically in any engine; ties beyond the order
    * columns would be ambiguous, so pass a unique id (the default
    * `event_id`). `maxGap` drops pairs further apart than the gap — the
    * "within one session" variant — without materializing session labels.
    *
    * Scale shape: ONE user-keyed shuffle for the incremental lead() window
    * (O(1) state per row, no per-user buffering), then partial aggregation
    * collapses to |types|² rows map-side before a tiny final shuffle; the
    * totals join is over |types| rows (AQE broadcasts it). p is an exact
    * IEEE long/long division — engine-portable without rounding. Per-user
    * event volume is the usual hot-key caveat (ops.Skew.dropHotKeys is the
    * guard, as with sessionize). */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      orderCols: Seq[String] = Seq("event_id"),
      maxGap: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).asc +: orderCols.map(col(_).asc): _*)
    val gapOk = maxGap.fold(lit(true)) { g =>
      unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)) <=
        lit(graft.ops.Intervals.subDayMicros(g))
    }
    val pairs = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"), gapOk.as("__ok"))
      .filter(col("to_type").isNotNull && col("__ok"))
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
  }

  /** CONTIGUOUS sequential patterns of length `n` (the GSP/PrefixSpan
    * contiguous special case, and the n-gram generalization of
    * [[transitions]]' pairs): per user, every run of `n` consecutive
    * event types in (ts, orderCols) order is one occurrence of the
    * pattern (t0, …, t{n−1}); patterns aggregate to total occurrence
    * count and USER SUPPORT (distinct users exhibiting the pattern —
    * the support measure sequential mining ranks by, robust to one hot
    * user looping), filtered at `minSupport`. The behavioral-motif
    * rollup between the pairwise transition matrix and the whole-journey
    * [[sessionPaths]]: long enough to see "view → click → purchase" as
    * one unit, short enough to aggregate across the population.
    *
    * Scale shape: ONE user-keyed shuffle for the incremental lead()
    * window (n−1 lookahead slots per row, no per-user buffering), then
    * partial aggregation collapses map-side toward ≤|types|ⁿ rows; the
    * exact distinct-user support rides the same (pattern, user) partial
    * agg before the pattern-level count — two keyed exchanges end to
    * end. Hot users are the usual sessionize caveat
    * (ops.Skew.dropHotKeys upstream). */
  def sequencePatterns(
      events: DataFrame,
      n: Int = 3,
      minSupport: Long = 1L,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      orderCols: Seq[String] = Seq("event_id")): DataFrame = {
    require(n >= 2, s"n must be >= 2: $n")
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).asc +: orderCols.map(col(_).asc): _*)
    val steps = col(typeCol).as("t0") +:
      (1 until n).map(i => lead(col(typeCol), i).over(w).as(s"t$i"))
    val grams = events.select(col(userCol).as("__u") +: steps: _*)
      .filter((1 until n).map(i => col(s"t$i").isNotNull).reduce(_ && _))
    // (pattern, user) partial collapse first: the distinct-user support
    // never shuffles raw occurrence rows twice
    val perUser = grams.groupBy(col("__u") +: (0 until n).map(i => col(s"t$i")): _*)
      .agg(count(lit(1)).as("__occ"))
    perUser.groupBy((0 until n).map(i => col(s"t$i")): _*)
      .agg(sum(col("__occ")).cast("long").as("n_occurrences"),
        count(lit(1)).cast("long").as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Top user journeys: sessionize, render each session as its ordered
    * event-type path ("view>click>purchase"), count identical paths, top-k
    * by frequency. THE path-analysis rollup next to funnels and the
    * transition matrix (which sees only pairwise steps; this sees whole
    * journeys). `maxLen` truncates pathological sessions to their first N
    * steps — it caps the OUTPUT string, and the per-session event list the
    * agg buffers is already bounded by session length (the usual per-user
    * hot-key caveat; `ops.Skew.dropHotKeys` upstream for bot traffic).
    *
    * Scale shape: the sessionize window's one user-keyed shuffle, then a
    * (user, session)-keyed agg (same key prefix — the exchange is reused),
    * then paths collapse map-side to distinct-path counts and
    * TakeOrderedAndProject keeps k. Deterministic: in-session order is
    * (ts, orderCols), path ties break lexicographically. */
  def sessionPaths(
      events: DataFrame,
      gap: String = "30 minutes",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      orderCols: Seq[String] = Seq("event_id"),
      maxLen: Int = 20,
      topK: Int = 50): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val labeled = sessionize(events, gap, userCol, tsCol)
    val orderedTypes = transform(
      array_sort(collect_list(
        struct(col(tsCol) +: orderCols.map(col) :+ col(typeCol): _*))),
      s => s.getField(typeCol))
    labeled.groupBy(col(userCol), col("session_idx"))
      .agg(concat_ws(">", slice(orderedTypes, 1, maxLen)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
  }

  /** Step-wise conversion counts: one row per step with the number of users
    * whose funnel reached it. A funnel summary is a handful of rows at any
    * scale — the per-user frame never leaves the cluster un-aggregated. */
  def conversion(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      within: Option[String] = None): DataFrame = {
    val times = funnelTimes(events, steps, userCol, tsCol, typeCol, within)
    val counts = times.agg(
      count(lit(1)).as("t1_reached"),
      steps.indices.drop(1).map(i =>
        count(col(s"t${i + 1}")).as(s"t${i + 1}_reached")): _*)
    val entries = steps.indices.map(i => struct(
      lit(i + 1).cast("long").as("step"), lit(steps(i)).as("event_type"),
      col(s"t${i + 1}_reached").as("n_users")))
    counts.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  /** Association rules over sessions (market-basket on event types): for
    * every DIRECTED pair of event types co-occurring in a session,
    * support count, the antecedent's session count, confidence
    * c_xy / c_x and lift c_xy·N / (c_x·c_y) — the "users who did X in a
    * session also did Y" readout. Confidence and lift are each ONE
    * division of exactly-represented integers (bit-portable doubles, the
    * collocations contract); `minSupport` prunes noise pairs before the
    * count joins.
    *
    * Scale shape: sessionize's one user-keyed window shuffle, then
    * DISTINCT (session, type) collapse — sessions × |types| rows at most —
    * and a |types|²-sized pair aggregation via self-join on the session
    * key (partial-aggregated; |types| is small by construction, this is
    * the transactions-table discipline where the itemset alphabet is
    * bounded). Item counts and N are tiny aggregates broadcast back. */
  def associationRules(
      events: DataFrame,
      gap: String = "30 minutes",
      minSupport: Long = 2,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val baskets = sessionize(events, gap, userCol, tsCol)
      .select(concat_ws(":", col(userCol), col("session_idx")).as("sid"),
        col(typeCol).as("item"))
      .distinct()
    val itemCounts = baskets.groupBy("item").agg(count(lit(1)).as("c_item"))
    val n = baskets.select("sid").distinct().agg(count(lit(1)).as("n_sessions"))
    val pairs = baskets.join(
        baskets.select(col("sid"), col("item").as("cons")), Seq("sid"))
      .filter(col("item") =!= col("cons"))
      .groupBy(col("item").as("antecedent"), col("cons").as("consequent"))
      .agg(count(lit(1)).as("c_both"))
      .filter(col("c_both") >= minSupport)
    pairs
      .join(itemCounts.select(col("item").as("antecedent"),
        col("c_item").as("c_ante")), Seq("antecedent"))
      .join(itemCounts.select(col("item").as("consequent"),
        col("c_item").as("c_cons")), Seq("consequent"))
      .crossJoin(broadcast(n))
      .withColumn("confidence",
        col("c_both").cast("double") / col("c_ante"))
      .withColumn("lift",
        (col("c_both") * col("n_sessions")).cast("double") /
          (col("c_ante") * col("c_cons")))
      .select(col("antecedent"), col("consequent"), col("c_both"),
        col("c_ante"), col("c_cons"), col("n_sessions"),
        col("confidence"), col("lift"))
  }
}
