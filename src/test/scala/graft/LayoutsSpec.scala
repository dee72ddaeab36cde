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

  test("writeBucketed emits exactly one file per bucket (no small-file explosion)") {
    import spark.implicits._
    // many input partitions: without the pmod-aligned repartition(buckets, keys)
    // each write task mixes bucket ids and the table explodes into up to
    // partitions*buckets files
    val df = (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v").repartition(16)
    Layouts.writeBucketed(df, "b_files", Seq("k"), buckets = 4)
    val loc = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("b_files")).location)
    val dataFiles = loc.listFiles().filter(f => f.getName.endsWith(".parquet"))
    assert(dataFiles.length == 4,
      s"expected one file per bucket, got:\n${dataFiles.map(_.getName).mkString("\n")}")
    assert(Layouts.readTable(spark, "b_files").count() == 4000)
  }

  test("writeSorted layout prunes row groups: a selective scan reads a fraction of the rows") {
    import spark.implicits._
    val n = 100000L
    val rnd = new scala.util.Random(3)
    // shuffled ids so the unsorted layout's files all span [1, n]
    val rows = rnd.shuffle((1L to n).toVector).map(i => (i, s"payload$i"))
    val unsortedDir = java.nio.file.Files.createTempDirectory("graft_unsorted").toString
    val sortedDir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    rows.toDF("id", "v").repartition(8).write.mode("overwrite").parquet(unsortedDir)
    Layouts.writeSorted(rows.toDF("id", "v"), sortedDir, Seq("id"), partitions = 8)

    def scannedRows(dir: String): Long = {
      val df = spark.read.parquet(dir).filter(col("id") <= 1000L)
      assert(df.count() == 1000L) // correctness first
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
      scan.metrics("numOutputRows").value
    }
    val unsortedScanned = scannedRows(unsortedDir)
    val sortedScanned = scannedRows(sortedDir)
    // unsorted: every file's min/max spans the range -> no pruning; sorted:
    // only the file(s) whose range covers [1, 1000] are read
    assert(sortedScanned * 4 <= unsortedScanned,
      s"sorted layout should skip most row groups: sorted=$sortedScanned unsorted=$unsortedScanned")
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
