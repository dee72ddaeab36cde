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

  test("zorderKey interleaves bits; writeZordered prunes on BOTH columns where single-sort can't") {
    import spark.implicits._
    // zorderKey(x=0b101, y=0b011): x bits at even positions, y at odd ->
    // z = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert(spark.range(1).select(Layouts.zorderKey(lit(5), lit(3), 4))
      .head.getLong(0) == 27L)

    val n = 100000
    val rnd = new scala.util.Random(7)
    val rows = Vector.fill(n)((rnd.nextInt(10000), rnd.nextInt(10000)))
    val df = rows.toDF("x", "y")
    val xSortedDir = java.nio.file.Files.createTempDirectory("graft_xsort").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layouts.writeSorted(df, xSortedDir, Seq("x"), partitions = 16)
    Layouts.writeZordered(df, zDir, "x", "y", partitions = 16)

    def scanned(dir: String, pred: org.apache.spark.sql.Column, expect: Long): Long = {
      val q = spark.read.parquet(dir).filter(pred)
      // execute q's OWN physical plan (count() builds a column-pruned twin
      // whose scan is a different node — its metrics, not q's, would fill)
      assert(q.queryExecution.toRdd.count() == expect, s"$dir correctness first")
      q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get.metrics("numOutputRows").value
    }
    val yPred = col("y") < 625 // a 1/16 slab on the column x-sort ignores
    val expectY = rows.count(_._2 < 625).toLong
    val xSortY = scanned(xSortedDir, yPred, expectY)
    val zY = scanned(zDir, yPred, expectY)
    // x-sorted files each span y's full range -> zero pruning on y (reads
    // everything); z-ordered files cover (x, y) rectangles -> a y slab
    // touches only the rectangles it crosses (one row of the grid)
    assert(xSortY == n.toLong, s"x-sort should read everything on a y filter: $xSortY")
    assert(zY * 2 <= xSortY,
      s"z-order should prune on y where x-sort can't: z=$zY xsort=$xSortY")
    // and the z layout still prunes on x too (the trade is less x
    // resolution, not none)
    val xPred = col("x") < 625
    val expectX = rows.count(_._1 < 625).toLong
    val zX = scanned(zDir, xPred, expectX)
    assert(zX * 2 <= n.toLong, s"z-order should still prune on x: $zX of $n")
  }

  test("writeHilbert prunes row groups on BOTH columns like writeZordered") {
    import spark.implicits._
    val n = 100000
    val rnd = new scala.util.Random(11)
    val rows = Vector.fill(n)((rnd.nextInt(10000), rnd.nextInt(10000)))
    val df = rows.toDF("x", "y")
    val hDir = java.nio.file.Files.createTempDirectory("graft_hilbert").toString
    Layouts.writeHilbert(df, hDir, "x", "y", partitions = 16)
    def scanned(pred: org.apache.spark.sql.Column, expect: Long): Long = {
      val q = spark.read.parquet(hDir).filter(pred)
      assert(q.queryExecution.toRdd.count() == expect, "correctness first")
      q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get.metrics("numOutputRows").value
    }
    val expectY = rows.count(_._2 < 625).toLong
    val hY = scanned(col("y") < 625, expectY)
    assert(hY * 2 <= n.toLong, s"hilbert should prune on y: $hY of $n")
    val expectX = rows.count(_._1 < 625).toLong
    val hX = scanned(col("x") < 625, expectX)
    assert(hX * 2 <= n.toLong, s"hilbert should prune on x: $hX of $n")
  }

  test("hilbertKey: a bijective walk whose consecutive cells are UNIT steps (z-order's are not)") {
    import spark.implicits._
    val bits = 3 // 8x8 grid, 64 cells
    val grid = for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)
    val keyed = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.sources.Layouts.hilbertKey(col("x"), col("y"), bits).as("h"),
        graft.sources.Layouts.zorderKey(col("x"), col("y"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bijection onto 0..63
    assert(keyed.map(_._3).sorted.toSeq == (0L until 64L))
    // THE Hilbert property: every consecutive pair along the curve moves
    // one cell in exactly one dimension
    val walk = keyed.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, _, _), (x2, y2, _, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
    // ...which z-order provably lacks (its Z-jumps are > 1 apart)
    val zWalk = keyed.sortBy(_._4)
    assert(zWalk.sliding(2).exists { case Array((x1, y1, _, _), (x2, y2, _, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
  }
}
