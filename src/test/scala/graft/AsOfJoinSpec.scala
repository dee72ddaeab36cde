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

  test("asofJoin: null keys/ts never match (SQL join semantics), left rows survive") {
    import spark.implicits._
    val l = Seq(
      (Option(1L), Option(10L), "k-match"),
      (Option.empty[Long], Option(10L), "null-key"),
      (Option(1L), Option.empty[Long], "null-ts"))
      .toDF("k", "ts", "tag")
    val r = Seq(
      (Option(1L), Option(5L), "real"),
      (Option.empty[Long], Option(5L), "null-key-right"), // can never match anything
      (Option(1L), Option.empty[Long], "null-ts-right"))  // can never match anything
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asofJoin(l, r, Seq("k"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map(
      "k-match" -> Some("real"),
      "null-key" -> None,
      "null-ts" -> None))
  }

  test("asofJoin matches a brute-force reference on random data (property, both directions)") {
    import spark.implicits._
    for (seed <- 1 to 3; dir <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      val right = Seq.fill(60)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
        // unique (k, ts) so the reference's argmax is unambiguous
        .groupBy(t => (t._1, t._2)).map { case ((k, ts), g) => (k, ts, g.map(_._3).max) }.toSeq
      val got = AsOfJoin.asofJoin(
          left.toDF("k", "ts"), right.toDF("k", "ts", "v"), Seq("k"), direction = dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Int])))
        .sorted.toSeq
      val want = left.map { case (k, ts) =>
        val m =
          if (dir == "backward") right.filter(q => q._1 == k && q._2 <= ts)
          else right.filter(q => q._1 == k && q._2 >= ts)
        (k, ts, if (m.isEmpty) None
          else Some((if (dir == "backward") m.maxBy(_._2) else m.minBy(_._2))._3))
      }.sorted
      assert(got == want, s"seed=$seed dir=$dir")
    }
  }

  test("asofJoinStreamStatic (interval form) equals asofJoin on random data, both directions") {
    import spark.implicits._
    for (seed <- 1 to 3; dir <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(seed + 100)
      val left = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      val right = Seq.fill(60)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
        .groupBy(t => (t._1, t._2)).map { case ((k, ts), g) => (k, ts, g.map(_._3).max) }.toSeq
      def render(df: org.apache.spark.sql.DataFrame) = df
        .select("k", "ts", "asof_v", "asof_ts").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Int]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .sorted.toSeq
      val l = left.toDF("k", "ts"); val r = right.toDF("k", "ts", "v")
      assert(render(AsOfJoin.asofJoinStreamStatic(l, r, Seq("k"), direction = dir)) ==
        render(AsOfJoin.asofJoin(l, r, Seq("k"), direction = dir)),
        s"seed=$seed dir=$dir")
    }
  }

  test("tolerance nulls stale matches in BOTH implementations (random data, both directions)") {
    import spark.implicits._
    for (seed <- 1 to 3; dir <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(seed + 200)
      val tol = 7L
      val left = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      val right = Seq.fill(60)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
        .groupBy(t => (t._1, t._2)).map { case ((k, ts), g) => (k, ts, g.map(_._3).max) }.toSeq
      def render(df: org.apache.spark.sql.DataFrame) = df
        .select("k", "ts", "asof_v").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Int])))
        .sorted.toSeq
      val l = left.toDF("k", "ts"); val r = right.toDF("k", "ts", "v")
      val gotUnion = render(AsOfJoin.asofJoin(
        l, r, Seq("k"), direction = dir, tolerance = Some(tol)))
      val gotIv = render(AsOfJoin.asofJoinStreamStatic(
        l, r, Seq("k"), direction = dir, tolerance = Some(tol)))
      // brute-force reference: closest candidate, then the tolerance test
      val want = left.map { case (k, ts) =>
        val m =
          if (dir == "backward") right.filter(q => q._1 == k && q._2 <= ts && ts - q._2 <= tol)
          else right.filter(q => q._1 == k && q._2 >= ts && q._2 - ts <= tol)
        (k, ts, if (m.isEmpty) None
          else Some((if (dir == "backward") m.maxBy(_._2) else m.minBy(_._2))._3))
      }.sorted
      assert(gotUnion == want, s"union+window seed=$seed dir=$dir")
      assert(gotIv == want, s"interval seed=$seed dir=$dir")
    }
  }

  test("asofJoinStreamStatic: null keys/ts never match, null left rows survive") {
    import spark.implicits._
    val l = Seq(
      (Option(1L), Option(10L), "k-match"),
      (Option.empty[Long], Option(10L), "null-key"),
      (Option(1L), Option.empty[Long], "null-ts"))
      .toDF("k", "ts", "tag")
    val r = Seq(
      (Option(1L), Option(5L), "real"),
      (Option.empty[Long], Option(5L), "null-key-right"),
      (Option(1L), Option.empty[Long], "null-ts-right"))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asofJoinStreamStatic(l, r, Seq("k"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map(
      "k-match" -> Some("real"),
      "null-key" -> None,
      "null-ts" -> None))
  }

  test("asofJoinStreamStatic keeps an events-side __bound column (helpers dropped by reference, not name)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = Seq((1L, 12L, 99L)).toDF("k", "ts", "__bound")
    val r = Seq((1L, 10L, "v1")).toDF("k", "ts", "v")
    val got = AsOfJoin.asofJoinStreamStatic(l, r, Seq("k"))
    assert(got.columns.count(_ == "__bound") == 1)
    val row = got.select(col("__bound"), col("asof_v")).collect().head
    assert(row.getLong(0) == 99L && row.getString(1) == "v1")
  }

  test("persistSnapshots evaluates the snapshot rows once across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    implicit val sqlCtx = spark.sqlContext
    AsOfJoinSpec.snapshotEvals.set(0)
    val bump = udf((x: Long) => { AsOfJoinSpec.snapshotEvals.incrementAndGet(); x })
      .asNondeterministic()
    val snaps = Seq((1L, 10L, "v1"), (1L, 20L, "v2"), (2L, 15L, "w1"))
      .toDF("user_id", "ts0", "profile")
      .select(col("user_id"), bump(col("ts0")).as("ts"), col("profile"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val out = AsOfJoin.asofJoinStreamStatic(
      mem.toDF().toDF("event_id", "user_id", "ts"), snaps, Seq("user_id"),
      persistSnapshots = true)
    val q = out.writeStream.format("memory").queryName("persist_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 12L))
      q.processAllAvailable()
      val afterB1 = AsOfJoinSpec.snapshotEvals.get()
      assert(afterB1 > 0, "batch 1 must materialize the snapshot subplan")
      mem.addData((2L, 1L, 25L), (3L, 2L, 16L))
      q.processAllAvailable()
      // the cached interval table serves batch 2 — zero fresh evaluations
      assert(AsOfJoinSpec.snapshotEvals.get() == afterB1,
        s"snapshot subplan re-evaluated: $afterB1 -> ${AsOfJoinSpec.snapshotEvals.get()}")
      val matches = spark.table("persist_out").orderBy("event_id")
        .select("asof_profile").collect().map(_.getString(0)).toSeq
      assert(matches == Seq("v1", "v2", "w1"))
    } finally { q.stop(); spark.catalog.clearCache() }
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

  test("overlapJoin: chunk-bucketed pairs equal the brute non-equi join, once each") {
    import spark.implicits._
    val M = 60000000L // one minute in micros
    // intervals chosen to cross chunk boundaries (chunk = 1 hour) and to
    // include touching, contained, disjoint, and multi-chunk-shared cases
    val a = Seq(
      (1L, 10L * M, 70L * M),    // crosses the hour boundary
      (2L, 100L * M, 110L * M),  // inside hour 1
      (3L, 200L * M, 200L * M))  // degenerate point, hour 3
      .toDF("a_id", "start_us", "end_us")
    val b = Seq(
      (10L, 0L * M, 15L * M),     // overlaps a1 by 5 min
      (11L, 70L * M, 80L * M),    // TOUCHES a1 exactly (overlap 0)
      (12L, 30L * M, 130L * M),   // overlaps a1 (40m) and a2 (10m), shares 3 chunks with a1
      (13L, 500L * M, 510L * M))  // disjoint from everything
      .toDF("b_id", "start_us", "end_us")
    val got = AsOfJoin.overlapJoin(a, b, chunk = "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = a.join(b, a("start_us") <= b("end_us") &&
        b("start_us") <= a("end_us"))
      .select(a("a_id"), b("b_id"),
        (org.apache.spark.sql.functions.least(a("end_us"), b("end_us")) -
          org.apache.spark.sql.functions.greatest(
            a("start_us"), b("start_us"))).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute)
    assert(got == Map((1L, 10L) -> 5 * M, (1L, 11L) -> 0L,
      (1L, 12L) -> 40 * M, (2L, 12L) -> 10 * M))
    // multi-chunk pair (1, 12) appears exactly once despite 2 shared chunks
    assert(AsOfJoin.overlapJoin(a, b, chunk = "1 hour")
      .groupBy("a_id", "b_id").count().filter($"count" > 1).isEmpty)
  }
}

/** Evaluation counter for the persistSnapshots spec — a static so the
  * executor-side UDF instance and the asserting test share one cell
  * (local mode: same JVM). */
object AsOfJoinSpec {
  val snapshotEvals = new java.util.concurrent.atomic.AtomicLong(0)
}
