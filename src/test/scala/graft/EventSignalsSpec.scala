package graft

import graft.operators.EventSignals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventSignalsSpec extends AnyFunSuite with SparkSpec {
  import java.sql.Timestamp

  private def ts(day: Int, h: Int = 0, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")

  // ref = 2024-01-31T00:00:00 in the session's UTC zone.
  private val RefUs = {
    val fmt = java.time.LocalDateTime.of(2024, 1, 31, 0, 0)
    fmt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  }

  test("decayScore: power-of-two integer numerators, horizon clamp") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 1.00 at age 0d (weight 2^30) + 2.00 at age 1d (2^29)
      (1L, ts(30, 12), 1L, "view", 1.00),
      (2L, ts(29, 12), 1L, "view", 2.00),
      // user 2: value at age 31d -> outside the 30d horizon, weight 0
      (3L, Timestamp.valueOf("2023-12-30 12:00:00"), 2L, "view", 5.00),
      // user 2: 0.50 at age 2d (2^28)
      (4L, ts(28, 12), 2L, "view", 0.50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.decayScore(ev, RefUs)
      .orderBy("user_id").collect()
    assert(out.length == 2)
    val u1 = out(0)
    assert(u1.getAs[Long]("n_events") == 2)
    assert(u1.getAs[Long]("score_num") ==
      100L * (1L << 30) + 200L * (1L << 29))
    val u2 = out(1)
    assert(u2.getAs[Long]("n_events") == 2) // out-of-horizon still counted
    assert(u2.getAs[Long]("score_num") == 50L * (1L << 28))
  }

  test("decayScore: future events (after ref) contribute zero") {
    import spark.implicits._
    val ev = Seq((1L, Timestamp.valueOf("2024-02-01 00:00:00"), 1L, "x", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.decayScore(ev, RefUs).collect()
    assert(out.length == 1 && out(0).getAs[Long]("score_num") == 0L)
  }

  test("decayScore: decimal accumulation matches long at small scale") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(30), 1L, "v", 3.25), (2L, ts(29), 1L, "v", 1.75))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = EventSignals.decayScore(ev, RefUs).collect()(0).getAs[Long]("score_num")
    val b = EventSignals.decayScore(ev, RefUs, sumDecimal = true)
      .collect()(0).getAs[java.math.BigDecimal]("score_num")
    assert(java.math.BigDecimal.valueOf(a).compareTo(b) == 0)
  }

  test("attributeLastTouch: most recent preceding click wins; no-touch kept") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click, click, purchase -> second click attributed
      (10L, ts(5, 10, 0), 1L, "click", 0.0),
      (11L, ts(5, 11, 0), 1L, "click", 0.0),
      (12L, ts(5, 12, 0), 1L, "purchase", 40.0),
      // user 1: later purchase still attributes to the same last click
      (13L, ts(6, 9, 0), 1L, "purchase", 10.0),
      // user 2: purchase with NO preceding click -> null touch, row kept
      (20L, ts(5, 8, 0), 2L, "purchase", 7.0),
      (21L, ts(5, 9, 0), 2L, "click", 0.0),
      // user 3: same-instant click sorts before purchase by event_id
      (30L, ts(7, 7, 0), 3L, "click", 0.0),
      (31L, ts(7, 7, 0), 3L, "purchase", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.attributeLastTouch(ev)
      .orderBy("conv_id").collect()
    assert(out.map(_.getAs[Long]("conv_id")).toSeq == Seq(12L, 13L, 20L, 31L))
    assert(out(0).getAs[Long]("touch_id") == 11L)
    assert(out(0).getAs[Long]("gap_us") == 3600L * 1000000L)
    assert(out(1).getAs[Long]("touch_id") == 11L)
    assert(out(2).isNullAt(out(2).fieldIndex("touch_id")))
    assert(out(3).getAs[Long]("touch_id") == 30L)
    assert(out(3).getAs[Long]("gap_us") == 0L)
  }

  test("anomalyBuckets: integer inequality flags a planted spike, warm-up masked") {
    import spark.implicits._
    // key A: 24 calm hourly buckets of 10 events, then one 50-event spike.
    val calm = (0 until 24).flatMap { h =>
      (0 until 10).map(i => (h * 100L + i, ts(1, h, i % 60), 1L, "A", 0.0))
    }
    val spike = (0 until 50).map(i => (9000L + i, ts(2, 0, i % 60), 1L, "A", 0.0))
    val ev = (calm ++ spike)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumnRenamed("event_type", "et")
      .withColumnRenamed("et", "event_type")
    val out = EventSignals.anomalyBuckets(ev).orderBy("bucket_us").collect()
    assert(out.length == 25)
    // the 24 warm-up buckets never flag (w_prev < 24 for all of them)
    assert(out.take(24).forall(!_.getAs[Boolean]("is_anomaly")))
    val last = out.last
    assert(last.getAs[Long]("n") == 50)
    assert(last.getAs[Long]("s_prev") == 240)
    assert(last.getAs[Long]("ss_prev") == 2400)
    assert(last.getAs[Long]("w_prev") == 24)
    assert(last.getAs[Boolean]("is_anomaly"))
    // zero-variance window + equal count does NOT flag
    val flat = (0 until 25).flatMap { h =>
      (0 until 10).map(i => (h * 100L + i, ts(1 + h / 24, h % 24, i % 60),
        1L, "B", 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out2 = EventSignals.anomalyBuckets(flat).orderBy("bucket_us").collect()
    assert(out2.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("anomalyBuckets/decayScore: empty input yields empty, correct schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventSignals.decayScore(empty, RefUs).count() == 0)
    assert(EventSignals.anomalyBuckets(empty).count() == 0)
    assert(EventSignals.attributeLastTouch(empty).count() == 0)
  }

  test("abLift: planted lift flags significant; balanced split does not") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) =
      rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, ts(10), u, t, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // 100 users: evens (variant 0) convert 40/50, odds convert 5/50
    val lifted = mk((0L until 100L).map { u =>
      val converts = if (u % 2 == 0) u < 80 else u < 10
      (u, if (converts) "purchase" else "view")
    })
    val out = EventSignals.abLift(lifted).orderBy("variant").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_users") == 50 && out(0).getAs[Long]("n_conv") == 40)
    assert(out(1).getAs[Long]("n_users") == 50 && out(1).getAs[Long]("n_conv") == 5)
    assert(out.forall(_.getAs[Boolean]("significant")))
    // identical conversion in both variants -> chi-square 0 -> not significant
    val flat = mk((0L until 100L).map(u => (u, if (u < 40) "purchase" else "view")))
    assert(EventSignals.abLift(flat).collect()
      .forall(!_.getAs[Boolean]("significant")))
    // degenerate margins (everyone converts) -> 0 > 0 -> false, no error
    val allConv = mk((0L until 10L).map(u => (u, "purchase")))
    assert(EventSignals.abLift(allConv).collect()
      .forall(!_.getAs[Boolean]("significant")))
  }

  test("resampleHourly: quiet hours filled with zero on the full spine") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(1, 0), 1L, "A", 0.0), (2L, ts(1, 0, 5), 1L, "A", 0.0),
      // hour 1 quiet for A; hour 2 active again
      (3L, ts(1, 2), 1L, "A", 0.0),
      // B active only in hour 1 -> 0-filled at hours 0 and 2
      (4L, ts(1, 1), 1L, "B", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.resampleHourly(ev)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("bucket_us"), r.getAs[Long]("n"))).sortBy(t => (t._1, t._2))
    assert(out.length == 6) // 2 keys x 3 hours
    assert(out.map(_._3).toSeq == Seq(2L, 0L, 1L, 0L, 1L, 0L))
  }

  test("rollingActiveUsers: window accumulates distinct users, gaps fill 0") {
    import spark.implicits._
    // user 1 active day 1; user 2 active days 1 and 2; user 3 active day 10
    val ev = Seq(
      (1L, ts(1), 1L, "v", 0.0), (2L, ts(1), 2L, "v", 0.0),
      (3L, ts(2), 2L, "v", 0.0), (4L, ts(10), 3L, "v", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.rollingActiveUsers(ev)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_active"))
      .sortBy(_._1)
    assert(out.length == 10)
    val counts = out.map(_._2).toSeq
    // days 1-7 see users {1,2}; day 8 still sees user 2 (active day 2);
    // day 9 sees nobody; day 10 sees user 3
    assert(counts == Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 1L, 0L, 1L))
  }

  test("userGrowth: first-appearance counts and cumulative uniques") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(1), 1L, "v", 0.0), (2L, ts(1), 2L, "v", 0.0),
      (3L, ts(2), 1L, "v", 0.0), // user 1 again: NOT new on day 2
      (4L, ts(3), 3L, "v", 0.0), (5L, ts(3), 4L, "v", 0.0),
      (6L, ts(9), 1L, "v", 0.0)) // still not new
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.userGrowth(ev).orderBy("day").collect()
      .map(r => (r.getAs[Long]("n_new"), r.getAs[Long]("cum_users"))).toSeq
    assert(out == Seq((2L, 2L), (2L, 4L))) // day 1: 2 new; day 3: 2 new
  }

  test("attributeLinear: exact integer split, remainder to most recent, no-touch kept") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 3 clicks in window, purchase of 1.00 -> 100 cents:
      // 33 + 33 + 34(remainder to most recent click 12)
      (10L, ts(5, 10, 0), 1L, "click", 0.0),
      (11L, ts(5, 11, 0), 1L, "click", 0.0),
      (12L, ts(5, 12, 0), 1L, "click", 0.0),
      (13L, ts(5, 13, 0), 1L, "purchase", 1.00),
      // user 2: click OUTSIDE the 1-hour window -> null-touch row
      (20L, ts(6, 8, 0), 2L, "click", 0.0),
      (21L, ts(6, 12, 0), 2L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.attributeLinear(ev, within = "1 hour")
      .collect().map(r => (r.getAs[Long]("conv_id"),
        Option(r.getAs[java.lang.Long]("touch_id")).map(_.toLong),
        r.getAs[Long]("n_touches"),
        Option(r.getAs[java.lang.Long]("cents_share")).map(_.toLong)))
      .sortBy(t => (t._1, t._2.getOrElse(-1L)))
    // wait: clicks 10,11 are 3h and 2h before the purchase -> outside 1h!
    // only click 12 is within -> single touch takes all 100
    assert(out.toSeq == Seq(
      (13L, Some(12L), 1L, Some(100L)),
      (21L, None, 0L, None)))
    // widen the window: all three clicks share 33/33/34
    val out2 = EventSignals.attributeLinear(ev, within = "4 hours")
      .collect().filter(_.getAs[Long]("conv_id") == 13L)
      .map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("cents_share"))
      .toMap
    assert(out2 == Map(10L -> 33L, 11L -> 33L, 12L -> 34L))
    // shares always reconstruct the original cents exactly
    assert(out2.values.sum == 100L)
  }

  test("cusum: closed form equals the max(0, S+d) recursion, both sides") {
    import spark.implicits._
    // key A: 10 calm hours of 10, then 5 hours of 15 (sustained +5 shift);
    // key B: 5 calm hours of 10, then 8 hours of 2 (sustained drop).
    def burst(key: String, hour: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + hour * 100L + i, ts(1 + hour / 24, hour % 24, i % 60), 1L, key, 0.0))
    val evs = ((0 until 10).flatMap(h => burst("A", h, 10, 0L)) ++
      (10 until 15).flatMap(h => burst("A", h, 15, 0L)) ++
      (0 until 5).flatMap(h => burst("B", h, 10, 100000L)) ++
      (5 until 13).flatMap(h => burst("B", h, 2, 100000L)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventSignals.cusum(evs, ref = 10L, threshold = 15L, slack = 2L)
      .orderBy("event_type", "bucket_us").collect()
    // driver-side reference: the textbook recursion per key
    def refCusum(ns: Seq[Long], d: Long => Long): Seq[Long] =
      ns.scanLeft(0L)((s, n) => math.max(0L, s + d(n))).tail
    val aN = out.filter(_.getString(0) == "A").map(_.getAs[Long]("n")).toSeq
    val bN = out.filter(_.getString(0) == "B").map(_.getAs[Long]("n")).toSeq
    assert(aN == Seq.fill(10)(10L) ++ Seq.fill(5)(15L))
    assert(out.filter(_.getString(0) == "A").map(_.getAs[Long]("cusum_hi")).toSeq ==
      refCusum(aN, n => n - 12L))
    assert(out.filter(_.getString(0) == "B").map(_.getAs[Long]("cusum_lo")).toSeq ==
      refCusum(bN, n => 8L - n))
    // upward alarm fires on A exactly when the accumulated shift reaches 15
    val aAlarms = out.filter(r => r.getString(0) == "A" && r.getAs[Boolean]("is_alarm"))
    assert(aAlarms.map(_.getAs[Long]("cusum_hi")).toSeq == Seq(15L))
    // downward alarm on B from the third low hour (6, 12, 18 >= 15)
    val bAlarms = out.filter(r => r.getString(0) == "B" && r.getAs[Boolean]("is_alarm"))
    assert(bAlarms.map(_.getAs[Long]("cusum_lo")).toSeq == Seq(18L, 24L, 30L, 36L, 42L, 48L))
    // calm stretches never accumulate (the prefix-min clamp works)
    assert(out.filter(_.getString(0) == "A").take(10)
      .forall(_.getAs[Long]("cusum_hi") == 0L))
  }

  test("modePerGroup: deterministic tiebreak, nulls excluded") {
    import spark.implicits._
    val df = Seq(("u1", Some("b")), ("u1", Some("b")), ("u1", Some("a")),
      ("u2", Some("z")), ("u2", Some("a")), // tie -> smallest value wins
      ("u3", None)).toDF("g", "v")
    val out = graft.operators.Curation.modePerGroup(df, "v", Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[String]("mode"), r.getAs[Long]("n"))).toMap
    assert(out == Map("u1" -> ("b", 2L), "u2" -> ("a", 1L)))
  }

  test("ohlcBars: open/close by (ts, tie) order, exact cents volume") {
    import spark.implicits._
    def t(m: Int, s: Int = 0) =
      java.sql.Timestamp.valueOf(f"2026-03-01 10:$m%02d:$s%02d")
    val events = Seq(
      // bucket 10:00, type a: open 3.0 (earliest), close 1.5 (latest);
      // ties at 10:05 broken by event_id: id 4 (2.25) is later than id 3
      ("a", t(5), 3L, 9.0), ("a", t(0), 1L, 3.0), ("a", t(5), 4L, 2.25),
      ("a", t(59), 5L, 1.5),
      // type b: BOTH endpoints tied on ts — ids alone order open/close
      ("b", t(10), 6L, 4.0), ("b", t(10), 7L, 6.5))
      .toDF("event_type", "ts", "event_id", "value")
    val out = graft.operators.EventSignals.ohlcBars(events)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(out("a") == ((3.0, 9.0, 1.5, 1.5, 1575L, 4L)))
    assert(out("b") == ((4.0, 6.5, 4.0, 6.5, 1050L, 2L)))
  }

  test("activityTrend: exact integer slope fraction per user") {
    import spark.implicits._
    def ts(day: Long, k: Long) = new java.sql.Timestamp(day * 86400000L + k)
    // u1: 1 event on day 0, 2 on day 1, 3 on day 2 -> slope exactly 1
    // u2: single day -> slope_den 0 (no trend defined)
    val events = (Seq.tabulate(1)(k => (1L, ts(0, k))) ++
      Seq.tabulate(2)(k => (1L, ts(1, k))) ++
      Seq.tabulate(3)(k => (1L, ts(2, k))) ++
      Seq((2L, ts(1, 0)))).toDF("user_id", "ts")
    val out = graft.operators.EventSignals.activityTrend(events)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // u1: n=3, x=(0,1,2), y=(1,2,3): num = 3*8 - 3*6 = 6, den = 3*5 - 9 = 6
    assert(out(1L) == (3L, 6L, 6L))
    assert(out(2L)._1 == 1L && out(2L)._3 == 0L)
  }

  test("srmCheck: balanced split passes, a 60/40 break on 1000 units flags") {
    import spark.implicits._
    def ev(n0: Int, n1: Int) =
      ((0 until n0).map(i => i.toLong * 2) ++
        (0 until n1).map(i => i.toLong * 2 + 1)).toDF("user_id")
        .select(col("user_id"),
          timestamp_micros(col("user_id") + 1000L).as("ts"))
    val ok = EventSignals.srmCheck(ev(500, 490)).collect().head
    assert(ok.getAs[Long]("n0") == 500L && ok.getAs[Long]("n1") == 490L)
    assert(ok.getAs[Double]("chi2") == 100.0 / 990.0)
    assert(!ok.getAs[Boolean]("srm"))
    // 600/400: chi2 = 40000/1000 = 40 >> 3.84 -> flagged
    val bad = EventSignals.srmCheck(ev(600, 400)).collect().head
    assert(bad.getAs[Double]("chi2") == 40.0)
    assert(bad.getAs[Boolean]("srm"))
    // duplicate events per user don't inflate the unit counts
    val dup = EventSignals.srmCheck(ev(10, 10).union(ev(10, 10)))
      .collect().head
    assert(dup.getAs[Long]("n0") == 10L && !dup.getAs[Boolean]("srm"))
  }

  test("cupedLift: hand moments exact, adjusted means and rho2 in fixed order") {
    import spark.implicits._
    // us range [1000, 9000]: pre iff 2*us < 10000. Per-user (x, y):
    // u0 (2,4), u1 (3,5), u2 (1,1), u3 (1,2)
    def mk(u: Long, pre: Int, post: Int) =
      Seq.fill(pre)((u, 1000L)) ++ Seq.fill(post)((u, 9000L))
    val base = mk(0L, 2, 4) ++ mk(1L, 3, 5) ++ mk(2L, 1, 1) ++ mk(3L, 1, 2)
    val ev = base.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val out = EventSignals.cupedLift(ev).collect()
      .map(r => r.getAs[Long]("variant") -> r).toMap
    // n=4 sx=7 sy=12 sxx=15 sxy=26 syy=46:
    // covNum = 4*26-84 = 20, varX = 4*15-49 = 11 -> theta = 20/11
    val theta = 20.0 / 11.0
    val v0 = out(0L)
    assert(v0.getAs[Long]("n_u") == 2L)
    assert(v0.getAs[java.math.BigDecimal]("sx_v").longValueExact() == 3L)
    assert(v0.getAs[java.math.BigDecimal]("sy_v").longValueExact() == 5L)
    assert(v0.getAs[Double]("theta") == theta)
    assert(v0.getAs[Double]("adj_mean") == 2.5 - theta * (1.5 - 7.0 / 4.0))
    val v1 = out(1L)
    assert(v1.getAs[Double]("adj_mean") == 3.5 - theta * (2.0 - 7.0 / 4.0))
    // rho2 = 20^2 / (11 * (4*46-144)) = 400/440
    assert(v1.getAs[Double]("rho2") == (20.0 * 20.0) / (11.0 * 40.0))
    // the CUPED invariant: adjustment shrinks the gap but both variants
    // move by the same theta*(mean_x - grand_mean) construction
    assert(math.abs((v1.getAs[Double]("adj_mean") - v0.getAs[Double]("adj_mean")) -
      (1.0 - theta * 0.5)) < 1e-12)
    // zero pre-period variance -> theta/adj/rho2 null, not a divide error
    val flat = (mk(0L, 1, 4) ++ mk(1L, 1, 5)).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val f = EventSignals.cupedLift(flat).collect().head
    assert(f.isNullAt(f.fieldIndex("theta")) &&
      f.isNullAt(f.fieldIndex("adj_mean")) && f.isNullAt(f.fieldIndex("rho2")))
  }

  test("standardizedLift: adjusted rates re-weight cell rates by the pooled stratum mix") {
    import spark.implicits._
    // strata a/b via the FIRST event's type; conv via a later purchase.
    // variant 0 (even ids): 3 users in a (2 conv), 1 in b (conv);
    // variant 1 (odd ids):  1 user in a (conv), 3 in b (1 conv).
    // pooled shares: a 4/8, b 4/8. Hand-quantized terms:
    //   v0: (4/8)(2/3) -> 333333333333; (4/8)(1/1) -> 500000000000
    //   v1: (4/8)(1/1) -> 500000000000; (4/8)(1/3) -> 166666666667
    val users = Seq( // (user, stratum, conv)
      (0L, "a", true), (2L, "a", true), (4L, "a", false), (6L, "b", true),
      (1L, "a", true), (3L, "b", false), (5L, "b", true), (7L, "b", false))
    val ev = users.flatMap { case (u, s, conv) =>
      Seq((u, ts(1), u * 10L, s),
        (u, ts(2), u * 10L + 1L, if (conv) "purchase" else "view"))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = EventSignals.standardizedLift(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      0L -> (4L, 3L, 833333333333L),
      1L -> (4L, 2L, 666666666667L)))
  }

  test("calibrationBins: rank-CDF bins, observed vs forecast, exact gap arithmetic") {
    import spark.implicits._
    // 6 rows, 2 bins: ranks 1..3 -> bin 1 (sum_rnk 6), 4..6 -> bin 2
    // (sum_rnk 15); conf = sum_rnk/N/n. Labels: bin1 1/3 (gap 0),
    // bin2 2/3 (gap |2/3 - 5/6| = 1/6).
    val d = Seq((1L, 10L, 1L), (2L, 20L, 0L), (3L, 30L, 0L),
      (4L, 40L, 1L), (5L, 50L, 1L), (6L, 60L, 0L))
      .toDF("doc_id", "score", "y")
    val got = EventSignals.calibrationBins(d, "score", "y", bins = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3, 6.0 / 6 / 3, math.abs(1.0 / 3 - 6.0 / 6 / 3))))
    assert(got(2L) == ((3L, 2L, 2.0 / 3, 15.0 / 6 / 3, math.abs(2.0 / 3 - 15.0 / 6 / 3))))
    // a rank-tie on score breaks by id, so bins are a pure data function
    val tied = Seq((1L, 5L, 0L), (2L, 5L, 1L)).toDF("doc_id", "score", "y")
    val bins = EventSignals.calibrationBins(tied, "score", "y", bins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(bins == Map(1L -> 0L, 2L -> 1L)) // id 1 -> bin 1, id 2 -> bin 2
  }
}
