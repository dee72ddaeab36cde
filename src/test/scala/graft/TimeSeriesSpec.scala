package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("patternTopK: an exact planted shape ranks first with distance 0") {
    import spark.implicits._
    val pat = Array(1.0, 2.0, 5.0, 2.0)
    // user 1 contains the exact pattern scaled x10 + offset 3 (z-norm
    // invariant -> distance 0); user 2 is noise
    val u1 = Seq(8.0, 13.0, 23.0, 53.0, 23.0, 4.0)
    val u2 = Seq(1.0, 9.0, 2.0, 8.0, 3.0, 7.0)
    val rows =
      u1.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) } ++
        u2.zipWithIndex.map { case (v, i) => (2L, ts(i), (10 + i).toLong, v) }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.patternTopK(df, pat, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val best = out.find(_._4 == 1L).get
    // the planted window is u1 positions 1..4 (13, 23, 53, 23), ending at t=4s
    assert(best._1 == 1L && best._2 == 4L * 1000000L)
    assert(math.abs(best._3) < 1e-12)
    // global ranks are contiguous and at most k
    assert(out.map(_._4).sorted.toSeq == (1L to out.length).toSeq && out.length <= 3)
  }

  test("patternTopK: flat windows z-normalize to zeros, not NaN") {
    import spark.implicits._
    val rows = (0 until 4).map(i => (1L, ts(i), i.toLong, 7.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.patternTopK(df, Array(0.0, 1.0, 0.0, -1.0), k = 1)
      .collect()
    assert(out.length == 1 && !out(0).getDouble(2).isNaN)
    // flat window z-norms to zeros, so dist = Σ q_i²; pattern [0,1,0,-1]
    // has mu=0, sd=√0.5 -> q=[0,√2,0,-√2] -> Σ q_i² = 4
    assert(math.abs(out(0).getDouble(2) - 4.0) < 1e-9)
    // raw (znorm = false) distance is the plain euclidean
    val raw = TimeSeries.patternTopK(df, Array(7.0, 7.0, 7.0, 7.0), k = 1,
      znorm = false).collect()(0).getDouble(2)
    assert(raw == 0.0)
  }

  test("patternTopK: per-key candidates cap the global sort input") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = for (u <- 1L to 4L; i <- 0 until 20)
      yield (u, ts(i), u * 100 + i, rnd.nextDouble() * 10)
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.patternTopK(df, Array(0.0, 1.0, 2.0), k = 5).collect()
    assert(out.length == 5)
    // ranks strictly follow (dist, key, ts)
    val sorted = out.sortBy(r => (r.getDouble(2), r.getLong(0), r.getLong(1)))
    assert(sorted.map(_.getLong(3)).toSeq == (1L to 5L).toSeq)
  }

  test("holtForecast: hand recurrence on daily counts (dyadic alpha/beta " +
      "=> exact doubles), single-day seed, horizon extrapolation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: counts 1, 2, 3 on consecutive days; user 2: one day, 4 events
    val day = 86400000000L
    val rows =
      (Seq.fill(1)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(3)(2L)).map(d => (1L, d * day)) ++
        Seq.fill(4)((2L, 0L))
    val events = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = TimeSeries.holtForecast(events)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // fold [1,2,3] at alpha .5 beta .25: l=1.5,b=.125 then l=2.3125,
    // b=.25*(2.3125-1.5)+.75*.125 = .296875; forecast = l + 7b
    assert(got(1L) == ((3L, 2.3125, 0.296875, 2.3125 + 7 * 0.296875)))
    // single day: level = the count, trend 0, forecast = level
    assert(got(2L) == ((1L, 4.0, 0.0, 4.0)))
  }

  test("holtForecast/holtWinters: maxDays fail-fast — a key exceeding the " +
      "per-key observed-day contract raises in-plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400000000L
    val events = (0L until 5L).map(d => (1L, d * day)).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val e = intercept[Exception] {
      TimeSeries.holtForecast(events, maxDays = 3).collect()
    }
    assert(e.getMessage.contains("maxDays"))
    // within the bound it runs
    assert(TimeSeries.holtForecast(events, maxDays = 5).count() == 1)
  }

  test("holtWinters: hand recurrence at p=2 (dyadic alpha/beta/gamma => " +
      "exact doubles), seed-only key, under-seeded key dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400000000L
    // user 1: counts 1,2,3,4,5 on consecutive days; user 2: 4 then 6;
    // user 3: one day only (< p -> dropped)
    val rows =
      (0 until 5).flatMap(d => Seq.fill(d + 1)((1L, d.toLong * day))) ++
        (Seq.fill(4)((2L, 0L)) ++ Seq.fill(6)((2L, day))) ++
        Seq.fill(2)((3L, 0L))
    val events = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = TimeSeries.holtWinters(events, period = 2, alpha = 0.5,
        beta = 0.25, gamma = 0.5, horizon = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == Set(1L, 2L))
    // user 1 by hand: seed l=1.5 b=0 s=[-0.5, 0.5]
    // t=3 slot1: l=.5*(3+.5)+.5*1.5=2.5  b=.25*1=.25      s1=.5*.5+.5*-.5=0
    // t=4 slot2: l=.5*3.5+.5*2.75=3.125  b=.25*.625+.75*.25=.34375
    //            s2=.5*.875+.5*.5=.6875
    // t=5 slot1: l=.5*5+.5*3.46875=4.234375
    //            b=.25*1.109375+.75*.34375=.53515625  s1=.5*.765625=.3828125
    // horizon 1 -> slot ((5+1-1)%2)+1 = 2 -> season .6875
    assert(got(1L) == ((5L, 4.234375, 0.53515625, 0.6875,
      4.234375 + 0.53515625 + 0.6875)))
    // exactly p days: pure seed state — level = mean, trend 0, season =
    // the slot residual; horizon 1 from n=2 lands on slot 1 -> -1.0
    assert(got(2L) == ((2L, 5.0, 0.0, -1.0, 4.0)))
  }

  test("crossCorrelation: proportional series r0 = 1 exactly, shifted series peak at the lead lag") {
    import spark.implicits._
    val usPerDay = 86400000000L
    def mk(a: Seq[Int], b: Seq[Int]): org.apache.spark.sql.DataFrame =
      (a.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)((d.toLong * usPerDay + 3L, "A"))
      } ++ b.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)((d.toLong * usPerDay + 3L, "B"))
      }).toDF("us", "event_type")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    // b = 2a: r_0 = 1 exactly (num 36, sqrt(18*72) = 36); r_+-1 = 0 exactly
    val df = mk(Seq(1, 2, 3), Seq(2, 4, 6))
    val got = TimeSeries.crossCorrelation(df, "A", "B", maxLag = 1)
      .collect().map(x => x.getAs[Long]("k") -> x.getAs[Double]("r")).toMap
    assert(got(0L) == 1.0)
    assert(got(1L) == 0.0 && got(-1L) == 0.0)
    // b is a one-day-delayed copy of a: the peak sits at k = +1 (A leads B)
    val lead = mk(Seq(5, 1, 4, 2, 3, 1), Seq(1, 5, 1, 4, 2, 3))
    val g2 = TimeSeries.crossCorrelation(lead, "A", "B", maxLag = 2)
      .collect().map(x => x.getAs[Long]("k") -> x.getAs[Double]("r")).toMap
    assert((-2L to 2L).filter(_ != 1L).forall(k => g2(1L) > g2(k)))
    // a constant side has zero variance -> r is null, not a divide error
    val const = TimeSeries.crossCorrelation(
      mk(Seq(1, 2, 3), Seq(2, 2, 2)), "A", "B", maxLag = 1).collect().head
    assert(const.isNullAt(const.fieldIndex("r")))
  }

  test("dispersionIndex: constant series Fano 0, bursty series > 1, shared calendar zero-fills") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // key a: [2,2,2] constant -> var 0, fano 0; key b: [6,0,0] bursty
    // over the SHARED 3-day calendar -> var*n^2 = 3*36 - 36 = 72,
    // fano = 72/(3*6) = 4
    val rows = (0 to 2).flatMap(d => Seq.fill(2)((d.toLong * usPerDay, "a"))) ++
      Seq.fill(6)((0L, "b"))
    val df = rows.toDF("us", "event_type")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = TimeSeries.dispersionIndex(df).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"),
          r.getAs[Double]("fano")))).toMap
    assert(got("a") == ((3L, 2.0, 0.0)))
    assert(got("b") == ((3L, 2.0, 72.0 / 18.0)))
  }

  test("mannKendall: rising series z by hand, S = 0 reads 0, all-tied nulls z") {
    import spark.implicits._
    val usPerDay = 86400000000L
    def mk(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * usPerDay + 9L)
      }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    // counts [1,2,3]: S = 3, no ties -> var18 = 3*2*11 = 66
    val r = TimeSeries.mannKendall(mk(Seq(1, 2, 3))).collect().head
    assert(r.getAs[java.math.BigDecimal]("s").longValueExact() == 3L)
    assert(r.getAs[java.math.BigDecimal]("var18").longValueExact() == 66L)
    assert(r.getAs[Double]("z") == (3.0 - 1.0) / math.sqrt(66.0 / 18.0))
    // counts [1,2,1]: S = 0 -> z = 0 exactly (var18 = 66 - 18 = 48)
    val r1 = TimeSeries.mannKendall(mk(Seq(1, 2, 1))).collect().head
    assert(r1.getAs[java.math.BigDecimal]("s").longValueExact() == 0L)
    assert(r1.getAs[java.math.BigDecimal]("var18").longValueExact() == 48L)
    assert(r1.getAs[Double]("z") == 0.0)
    // constant series: all-tied -> Var = 0 -> z null, not a divide error
    val r2 = TimeSeries.mannKendall(mk(Seq(2, 2, 2))).collect().head
    assert(r2.getAs[java.math.BigDecimal]("var18").longValueExact() == 0L)
    assert(r2.isNullAt(r2.fieldIndex("z")))
    val err = intercept[Exception] {
      TimeSeries.mannKendall(mk(Seq(5))).collect()
    }
    assert(err.getMessage.contains("at least 2 days"))
  }

  test("autocorrelation: hand case exact, gap days count zero, constant series nulls r") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // daily counts [1,2,3,4] on four consecutive days
    def mk(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * usPerDay + 1000L)
      }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val r = TimeSeries.autocorrelation(mk(Seq(1, 2, 3, 4)), maxLag = 2)
      .collect().map(x => x.getAs[Long]("k") ->
        ((x.getAs[Long]("n"),
          x.getAs[java.math.BigDecimal]("num").longValueExact(),
          x.getAs[java.math.BigDecimal]("den").longValueExact(),
          x.getAs[Double]("r")))).toMap
    // n=4 S=10: num1*n^2 = 16*20-40*15+3*100 = 20, den*n^2 = 80 -> 0.25
    assert(r(1L) == ((4L, 20L, 80L, 0.25)))
    // lag 2: 16*11 - 40*10 + 2*100 = -24 -> -0.3
    assert(r(2L) == ((4L, -24L, 80L, -0.3)))
    // a missing calendar day is a 0 in the series, not an absent row:
    // counts [2,0,2] -> r1: Sxy=0 A=2 B=2, num = 9*0 - 3*4*4 + 2*16 = -16
    val gap = Seq.fill(2)(0L * usPerDay + 5L) ++ Seq.fill(2)(2L * usPerDay + 5L)
    val g = TimeSeries.autocorrelation(
      gap.toDF("us").select(timestamp_micros(col("us")).as("ts")), maxLag = 1)
      .collect().head
    assert(g.getAs[Long]("n") == 3L)
    assert(g.getAs[java.math.BigDecimal]("num").longValueExact() == -16L)
    // constant series: zero variance -> r is null, not a divide error
    val const = TimeSeries.autocorrelation(mk(Seq(2, 2, 2, 2)), maxLag = 1)
      .collect().head
    assert(const.isNullAt(const.fieldIndex("r")))
    // too-short series fails fast in-plan
    val err = intercept[Exception] {
      TimeSeries.autocorrelation(mk(Seq(1, 2)), maxLag = 7).collect()
    }
    assert(err.getMessage.contains("need at least"))
  }

  test("theilSen: median pairwise slope by hand, zero-filled gaps, spike robustness") {
    import spark.implicits._
    val usPerDay = 86400000000L
    def mk(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * usPerDay + 9L)
      }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    // counts [1,2,3]: slopes {1,1,1} -> median 1.0 day^-1 = 1e6 micro
    val r = TimeSeries.theilSen(mk(Seq(1, 2, 3))).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs")) == ((3L, 3L)))
    assert(r.getAs[Double]("sen_slope_micro") == 1000000.0)
    // one spike day barely moves Sen's slope where OLS would be wrecked:
    // [1,2,100,3]: slopes {1, 49.5, 2/3, 98, 0.5, -97} sorted ->
    // median = (2/3 + 1)/2 -> (666667 + 1000000)/2 = 833333.5
    val sp = TimeSeries.theilSen(mk(Seq(1, 2, 100, 3))).collect().head
    assert(sp.getAs[Double]("sen_slope_micro") == 833333.5)
    // a day with NO events is a real zero in the series: [2,0(gap),4]
    // via days 0 and 2 only -> series [2,0,4], slopes {-2, 1, 4} ->
    // median 1e6
    val gap = Seq.fill(2)(0L * usPerDay) ++ Seq.fill(4)(2L * usPerDay)
    val g = TimeSeries.theilSen(
      gap.toDF("us").select(timestamp_micros(col("us")).as("ts")))
      .collect().head
    assert(g.getAs[Long]("n_days") == 3L)
    assert(g.getAs[Double]("sen_slope_micro") == 1000000.0)
  }

  test("changepoint: argmax split by hand, tie breaks to the earliest split") {
    import spark.implicits._
    val usPerDay = 86400000000L
    def mk(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(d.toLong * usPerDay + 9L)
      }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    // level shift [1,1,1,5,5,5]: the true split is after day 3
    // (r = 3): G(3) = 9/3 + 225/3 = 78, the unique max
    val r = TimeSeries.changepoint(mk(Seq(1, 1, 1, 5, 5, 5))).collect().head
    assert(r.getAs[Long]("split_r") == 3L)
    assert(r.getAs[Long]("split_day") == 2L) // epoch day of day index 2
    assert((r.getAs[Long]("lsum"), r.getAs[Long]("rsum")) == ((3L, 15L)))
    assert(r.getAs[Double]("mean_left") == 1.0)
    assert(r.getAs[Double]("mean_right") == 5.0)
    // constant series [2,2,2,2]: G(s) equal everywhere -> earliest split
    val c = TimeSeries.changepoint(mk(Seq(2, 2, 2, 2))).collect().head
    assert(c.getAs[Long]("split_r") == 1L)
  }
}
