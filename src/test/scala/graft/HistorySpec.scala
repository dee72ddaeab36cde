package graft

import graft.operators.History
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class HistorySpec extends AnyFunSuite with SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (user, state, ts-seconds, event_id)
  private val log = Seq(
    (1L, "view", 10L, 1L), (1L, "view", 20L, 2L), (1L, "click", 30L, 3L),
    (1L, "view", 40L, 4L),
    (2L, "buy", 10L, 5L),
    // user 3: tie on ts — event_id breaks it, so click (id 7) follows view
    (3L, "view", 50L, 6L), (3L, "click", 50L, 7L))

  private def scd2Rows = {
    import spark.implicits._
    History.scd2(log.map { case (u, s, t, e) => (u, s, ts(t), e) }
      .toDF("user_id", "event_type", "ts", "event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("scd2 segments runs with correct validity spans") {
    val us = 1000000L
    assert(scd2Rows == Set(
      (1L, "view", 10L * us, 30L * us, 2L),
      (1L, "click", 30L * us, 40L * us, 1L),
      (1L, "view", 40L * us, -1L, 1L),
      (2L, "buy", 10L * us, -1L, 1L),
      (3L, "view", 50L * us, 50L * us, 1L),
      (3L, "click", 50L * us, -1L, 1L)))
  }

  test("scd2 treats consecutive null states as one run") {
    import spark.implicits._
    val rows = History.scd2(
      Seq((1L, Some("a"), ts(1), 1L), (1L, None, ts(2), 2L),
        (1L, None, ts(3), 3L), (1L, Some("a"), ts(4), 4L))
        .toDF("user_id", "event_type", "ts", "event_id"))
      .collect()
    assert(rows.length == 3)
    val nullRun = rows.find(_.isNullAt(1)).get
    assert(nullRun.getLong(4) == 2L) // both nulls in one run
  }

  test("scd2 adds no exchange beyond the first user-keyed one") {
    import spark.implicits._
    val plan = History.scd2(log.map { case (u, s, t, e) => (u, s, ts(t), e) }
      .toDF("user_id", "event_type", "ts", "event_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("asOf reconstructs the point-in-time state; unborn keys are absent") {
    import spark.implicits._
    val df = log.map { case (u, st, t0, e) => (u, st, ts(t0), e) }
      .toDF("user_id", "event_type", "ts", "event_id")
    // t = 35s: user 1 is mid-'click' run (30..40), user 2 'buy', user 3
    // does not exist yet (first event at 50)
    val at35 = History.asOf(df, asOfUs = 35L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at35 == Map(1L -> "click", 2L -> "buy"))
    // t = 50s: user 3's tie-broken second run (click, id 7) is current
    val at50 = History.asOf(df, asOfUs = 50L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at50 == Map(1L -> "view", 2L -> "buy", 3L -> "click"))
  }

  private val cdcLog = Seq(
    // user 1: U then D — tombstoned
    (1L, "U", 1.0, 10L, 1L), (1L, "D", 0.0, 20L, 2L),
    // user 2: D then U — resurrected, latest value survives
    (2L, "D", 0.0, 10L, 3L), (2L, "U", 5.0, 20L, 4L),
    // user 3: ts tie, higher event_id wins
    (3L, "U", 7.0, 30L, 5L), (3L, "U", 9.0, 30L, 6L))

  test("cdcLatest keeps newest non-delete state and drops tombstoned keys") {
    import spark.implicits._
    val out = History.cdcLatest(
      cdcLog.toDF("user_id", "op", "value", "ts_us", "event_id"),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"),
      payloadCols = Seq("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(out == Set((2L, 5.0, 2L), (3L, 9.0, 2L)))
  }

  test("cdcLatest compacts with an aggregate, not a window sort") {
    import spark.implicits._
    val plan = History.cdcLatest(
      cdcLog.toDF("user_id", "op", "value", "ts_us", "event_id"),
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"),
      payloadCols = Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("cdcLatest of an empty log is empty") {
    import spark.implicits._
    assert(History.cdcLatest(
      Seq.empty[(Long, String, Double, Long)].toDF("k", "op", "v", "o"),
      keyCols = Seq("k"), orderCols = Seq("o"), payloadCols = Seq("v"))
      .count() == 0L)
  }
}
