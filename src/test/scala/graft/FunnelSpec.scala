package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite with SparkSpec {
  import java.sql.Timestamp

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private lazy val events = {
    import spark.implicits._
    Seq(
      // user 1: full funnel in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: clicked BEFORE viewing — the click must not count; the
      // later click does, but there is no purchase after it
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(8), "click"),
      // user 3: view only
      (3L, ts(4), "view"),
      // user 4: never viewed — not in the funnel at all
      (4L, ts(0), "click"), (4L, ts(1), "purchase"),
      // user 5: two full passes; earliest valid times win
      (5L, ts(3), "view"), (5L, ts(4), "click"), (5L, ts(6), "purchase"),
      (5L, ts(7), "view"), (5L, ts(8), "click"), (5L, ts(9), "purchase"))
      .toDF("user_id", "ts", "event_type")
  }

  test("funnelTimes: strictly-ordered earliest step times per user") {
    val got = Funnel.funnelTimes(events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (1L, Some(ts(0)), Some(ts(5)), Some(ts(9))),
      (2L, Some(ts(2)), Some(ts(8)), None),
      (3L, Some(ts(4)), None, None),
      (5L, Some(ts(3)), Some(ts(4)), Some(ts(6)))))
  }

  test("retention: cohorts by first-activity week, distinct users per offset") {
    import spark.implicits._
    def at(day: Int) = Timestamp.valueOf(f"2026-01-${day + 1}%02d 12:00:00")
    // user 1 first active day 0, returns day 8 (offset week 1) twice;
    // user 2 first active day 7 (next cohort), returns day 7 again (offset 0)
    val ev = Seq(
      (1L, at(0), "view"), (1L, at(8), "click"), (1L, at(8), "view"),
      (2L, at(7), "view"), (2L, at(7), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.retention(ev, periodDays = 7)
      .orderBy("cohort", "period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c1 = got.filter(_._3 > 0)
    // two cohorts (2026-01-01 and 2026-01-08 land in different epoch weeks),
    // user 1 appears at offsets 0 and 1, user 2 only at offset 0
    assert(c1.length == 3)
    val byCohort = got.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(byCohort.size == 2)
    assert(byCohort.values.toSet == Set(Set((0L, 1L), (1L, 1L)), Set((0L, 1L))))
  }

  test("retention: pre-1970 first events floor into the earlier cohort (not truncate toward zero)") {
    import spark.implicits._
    // days -3 and +3 around the epoch with periodDays=7: floor(-3/7) = -1
    // and floor(3/7) = 0 — truncation would merge both into cohort 0
    val ev = Seq(
      (1L, Timestamp.valueOf("1969-12-29 12:00:00"), "view"), // day -3
      (2L, Timestamp.valueOf("1970-01-04 12:00:00"), "view")) // day +3
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.retention(ev, periodDays = 7)
      .orderBy("cohort").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((-1L, 0L, 1L), (0L, 0L, 1L)))
  }

  test("funnelTimes with `within`: steps past t1 + window no longer count") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes inside 10 minutes — full funnel
      (1L, ts(0), "view"), (1L, ts(4), "click"), (1L, ts(9), "purchase"),
      // user 2 clicks at +12m (outside): t2 null, so t3 null even though
      // a purchase exists
      (2L, ts(0), "view"), (2L, ts(12), "click"), (2L, ts(13), "purchase"),
      // user 3 clicks in time, purchases late: only t3 null
      (3L, ts(0), "view"), (3L, ts(5), "click"), (3L, ts(20), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelTimes(ev, Seq("view", "click", "purchase"),
        within = Some("10 minutes"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)).isDefined,
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (1L, true, Some(ts(4)), Some(ts(9))),
      (2L, true, None, None),
      (3L, true, Some(ts(5)), None)))
  }

  test("sessionize: gap starts a new session, ordinal per user, ties share a session") {
    import spark.implicits._
    def at(m: Int, s: Int = 0) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:$s%02d")
    val ev = Seq(
      // user 1: two events 5m apart (one session), then a 45m silence
      (10L, 1L, at(0)), (11L, 1L, at(5)), (12L, 1L, at(50)),
      // user 2: single event
      (20L, 2L, at(7)),
      // user 3: tied timestamps after a long gap — both land in session 1
      (30L, 3L, at(0)), (31L, 3L, at(59)), (32L, 3L, at(59)))
      .toDF("event_id", "user_id", "ts")
    val got = Funnel.sessionize(ev, gap = "30 minutes")
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      10L -> 0L, 11L -> 0L, 12L -> 1L,
      20L -> 0L,
      30L -> 0L, 31L -> 1L, 32L -> 1L))
  }

  test("sessionize rejects month/day gaps (calendar-dependent)") {
    import spark.implicits._
    val ev = Seq((1L, 1L, Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    intercept[IllegalArgumentException](Funnel.sessionize(ev, gap = "1 day").collect())
  }

  test("conversion: per-step user counts") {
    val got = Funnel.conversion(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "view", 4L), (2L, "click", 3L), (3L, "purchase", 2L)))
  }

  test("sessionPaths: whole-journey strings, session split, maxLen truncation") {
    import spark.implicits._
    val ev = Seq(
      // user 1 session 0: view>click>purchase; session 1 (35m later): view
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(2), "click"), (3L, 1L, ts(4), "purchase"),
      (4L, 1L, ts(39), "view"),
      // user 2: same full journey as user 1's first session
      (5L, 2L, ts(0), "view"), (6L, 2L, ts(1), "click"), (7L, 2L, ts(2), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.sessionPaths(ev, gap = "30 minutes")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("view>click>purchase", 2L), ("view", 1L)))
    val truncated = Funnel.sessionPaths(ev, gap = "30 minutes", maxLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(truncated.toSeq == Seq(("view>click", 2L), ("view", 1L)))
    intercept[IllegalArgumentException](Funnel.sessionPaths(ev, maxLen = 0))
  }

  private lazy val seqEvents = {
    import spark.implicits._
    Seq(
      // user 1: view -> click -> view  (pairs: v->c, c->v)
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(5), "click"), (3L, 1L, ts(9), "view"),
      // user 2: two same-ts events — event_id breaks the tie: click -> view
      (4L, 2L, ts(3), "click"), (5L, 2L, ts(3), "view"),
      // user 3: singleton, no transitions
      (6L, 3L, ts(1), "view"),
      // user 4: view -> view with a 40-minute gap (dropped by maxGap=30m)
      (7L, 4L, ts(0), "view"), (8L, 4L, ts(40), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
  }

  test("transitions: per-user consecutive pairs, exact probabilities") {
    val got = Funnel.transitions(seqEvents)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // from view: v->c (u1), v->v (u4) => n_from 2; from click: c->v (u1, u2)
    assert(got.toSeq == Seq(
      ("click", "view", 2L, 2L, 1.0),
      ("view", "click", 1L, 2L, 0.5),
      ("view", "view", 1L, 2L, 0.5)))
  }

  test("transitions: maxGap drops distant pairs and renormalizes") {
    val got = Funnel.transitions(seqEvents, maxGap = Some("30 minutes"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("click", "view", 2L, 2L, 1.0),
      ("view", "click", 1L, 1L, 1.0)))
  }

  test("transitions: partitioning-invariant (one user never splits)") {
    val a = Funnel.transitions(seqEvents.repartition(7)).orderBy("from_type", "to_type")
      .collect().toSeq
    val b = Funnel.transitions(seqEvents.repartition(1)).orderBy("from_type", "to_type")
      .collect().toSeq
    assert(a == b)
  }

  test("associationRules: hand-computed support/confidence/lift, direction matters") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // 3 sessions (users 1,2,3; all events within gap):
    //   s1: {view, click}; s2: {view, click}; s3: {view}
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(1), "click"),
      (2L, t(0), "view"), (2L, t(2), "click"),
      (3L, t(0), "view"), (3L, t(1), "view")) // dup item collapses
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel.associationRules(ev, minSupport = 2)
      .collect().map(r => ((r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")),
        (r.getAs[Long]("c_both"), r.getAs[Long]("c_ante"),
         r.getAs[Long]("c_cons"), r.getAs[Long]("n_sessions"),
         r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(out.size == 2)
    // view->click: 2/3 confidence; click->view: 2/2 = 1.0
    assert(out(("view", "click")) == ((2L, 3L, 2L, 3L, 2.0 / 3.0, 1.0)))
    assert(out(("click", "view")) == ((2L, 2L, 3L, 3L, 1.0, 1.0)))
  }

  test("associationRules: session gap splits baskets; minSupport prunes") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // user 1's purchase is 40m after the click: separate session, so
    // click+purchase co-occur ZERO times
    val ev = Seq((1L, t(0), "click"), (1L, t(40), "purchase"),
      (2L, t(0), "click"), (2L, t(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel.associationRules(ev, minSupport = 1)
      .collect().map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")))
    assert(!out.contains(("click", "purchase")))
    assert(out.toSet == Set(("click", "view"), ("view", "click")))
  }

  test("sequencePatterns: contiguous triples, distinct-user support vs occurrences") {
    import spark.implicits._
    val ev = Seq(
      // user 1: v c p v  -> (v,c,p), (c,p,v)
      (1L, ts(0), 1L, "v"), (1L, ts(1), 2L, "c"),
      (1L, ts(2), 3L, "p"), (1L, ts(3), 4L, "v"),
      // user 2: v c p -> (v,c,p)
      (2L, ts(0), 5L, "v"), (2L, ts(1), 6L, "c"), (2L, ts(2), 7L, "p"),
      // user 3 loops twice: v c p v c p -> (v,c,p) x2, (c,p,v), (p,v,c)
      (3L, ts(0), 8L, "v"), (3L, ts(1), 9L, "c"), (3L, ts(2), 10L, "p"),
      (3L, ts(3), 11L, "v"), (3L, ts(4), 12L, "c"), (3L, ts(5), 13L, "p"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.sequencePatterns(ev, n = 3, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // hot user 3 adds occurrences but only ONE unit of support
    assert(got == Map(
      ("v", "c", "p") -> (4L, 3L),
      ("c", "p", "v") -> (2L, 2L)))
    // (p,v,c) occurs once (user 3) -> support 1, filtered at minSupport=2
    val all = Funnel.sequencePatterns(ev, n = 3, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(all.contains(("p", "v", "c")))
  }
}
