package graft

import graft.sources.Layouts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutsSpec extends AnyFunSuite with SparkSpec {

  test("co-bucketed tables join with ZERO exchanges and match the plain join") {
    import spark.implicits._
    val orders = (0L until 2000L).map(i => (i, i % 97, s"o$i")).toDF("o_id", "cust", "note")
    val items = (0L until 6000L).map(i => (i % 2000, i % 7, i * 1.5)).toDF("o_id", "li", "amt")

    Layouts.writeBucketed(orders, "b_orders", Seq("o_id"), buckets = 8)
    Layouts.writeBucketed(items, "b_items", Seq("o_id"), buckets = 8)

    val a = Layouts.readTable(spark, "b_orders")
    val b = Layouts.readTable(spark, "b_items")
    // broadcast would trivially avoid the exchange; force the sort-merge path
    // the layout exists for
    val joined = a.hint("merge").join(b, "o_id")

    val plain = orders.join(items, "o_id")
    assert(joined.count() == plain.count())
    assert(joined.agg(sum("amt")).head.getDouble(0)
      == plain.agg(sum("amt")).head.getDouble(0))
    assert(Layouts.countExchanges(joined) == 0,
      s"expected a zero-exchange co-located join:\n${joined.queryExecution.executedPlan}")
  }

  test("bucketed groupBy on the bucket key needs no exchange either") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i % 500, i)).toDF("k", "v")
    Layouts.writeBucketed(df, "b_agg", Seq("k"), buckets = 4)
    val agg = Layouts.readTable(spark, "b_agg").groupBy("k").agg(sum("v").as("s"))
    assert(agg.count() == 500)
    assert(Layouts.countExchanges(agg) == 0,
      s"expected exchange-free agg:\n${agg.queryExecution.executedPlan}")
  }
}
