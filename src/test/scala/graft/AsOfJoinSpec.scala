package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("asofJoin: most recent right row at or before each left ts, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 10L, "t-a"), (1L, 20L, "t-b"), (1L, 5L, "t-early"),
      (2L, 15L, "t-c"),
      (3L, 30L, "t-nomatch"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 19L, 102.0),
      (2L, 15L, 200.0), (2L, 16L, 201.0))
      .toDF("k", "ts", "px")
    val got = AsOfJoin.asofJoin(trades, quotes, Seq("k"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, 5L, "t-early", None, None),          // no quote yet
      (1L, 10L, "t-a", Some(101.0), Some(10L)), // same-instant quote visible (>=)
      (1L, 20L, "t-b", Some(102.0), Some(19L)), // latest preceding
      (2L, 15L, "t-c", Some(200.0), Some(15L)), // ties to its own ts, not the later one
      (3L, 30L, "t-nomatch", None, None)))      // key absent from right
  }

  test("asofJoin: duplicate left rows survive; explicit value column selection") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 9L, "x", "noise")).toDF("k", "ts", "v", "extra")
    val got = AsOfJoin.asofJoin(l, r, Seq("k"), rightValueCols = Seq("v")).collect()
    assert(got.length == 2)
    assert(got.forall(_.getString(2) == "x"))
    assert(!got.head.schema.fieldNames.contains("asof_extra"))
  }

  test("asofJoin plans exactly one exchange (the key shuffle) — no join explosion") {
    import spark.implicits._
    import graft.sources.Layouts
    val l = (0L until 100L).map(i => (i % 5, i)).toDF("k", "ts")
    val r = (0L until 50L).map(i => (i % 5, i, i * 1.0)).toDF("k", "ts", "v")
    val df = AsOfJoin.asofJoin(l, r, Seq("k"))
    assert(Layouts.countExchanges(df) == 1,
      s"expected one exchange:\n${df.queryExecution.executedPlan}")
  }
}
