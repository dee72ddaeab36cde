package graft

import graft.ops.{OpCompiler, Pipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpCompilerSpec extends AnyFunSuite with SparkSpec {
  import OpCompiler.Ctx

  private lazy val lines = {
    import spark.implicits._
    Seq((0L, "The ERROR is here"), (1L, "all good"), (2L, "another Error line"))
      .toDF("id", "line")
  }

  test("FILTER: case-insensitive substring (Operators.java:121-144)") {
    val out = Pipeline.fromDescriptors(Seq("FILTER:error"), Ctx(Some("line"), Seq("id")))(lines)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L))
  }

  test("COLUMN_FILTER: trimmed exact equality (Operators.java:258-277)") {
    import spark.implicits._
    val df = Seq(("  Stop ", 1), ("stop", 2), ("Stop", 3)).toDF("Sign_Type", "n")
    val out = Pipeline.fromDescriptors(Seq("COLUMN_FILTER:Sign_Type:Stop"), Ctx(None, Seq("n")))(df)
    assert(out.select("n").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("FILTERED_TRANSFORM (fused O8) equals the FILTER + TRANSFORM chain") {
    val fused = Pipeline.fromDescriptors(Seq("FILTERED_TRANSFORM:error:uppercase"),
      Ctx(Some("line"), Seq("id")))(lines).collect().map(_.toSeq).toSet
    val chain = Pipeline.fromDescriptors(Seq("FILTER:error", "TRANSFORM:uppercase"),
      Ctx(Some("line"), Seq("id")))(lines).collect().map(_.toSeq).toSet
    assert(fused.nonEmpty && fused == chain)
  }

  test("TRANSFORM upper/lower/trim hit every string column when structured") {
    import spark.implicits._
    val df = Seq((" a ", 1)).toDF("s", "n")
    val up = Pipeline.fromDescriptors(Seq("TRANSFORM:uppercase"), Ctx(None, Seq("n")))(df)
    assert(up.first().getString(0) == " A ")
    val tr = Pipeline.fromDescriptors(Seq("TRANSFORM:trim"), Ctx(None, Seq("n")))(df)
    assert(tr.first().getString(0) == "a")
    assert(tr.first().getInt(1) == 1)
  }

  test("TRANSFORM:splitintowords explodes with stable word position") {
    val out = Pipeline.fromDescriptors(Seq("TRANSFORM:splitintowords"),
      Ctx(Some("line"), Seq("id")))(lines.filter(col("id") === 1))
    val rows = out.orderBy("__graft_word_pos").collect()
    assert(rows.map(_.getAs[String]("word")).toSeq == Seq("all", "good"))
    assert(rows.map(_.getAs[Int]("__graft_word_pos")).toSeq == Seq(0, 1))
  }

  test("TRANSFORM:select projects by name (Node.java:438-474)") {
    val out = Pipeline.fromDescriptors(Seq("TRANSFORM:select:id"), Ctx(Some("line"), Seq("id")))(lines)
    assert(out.columns.toSeq == Seq("id"))
    assert(out.count() == 3)
  }

  test("AGGREGATE emits the running count 1..n in key order") {
    val out = Pipeline.fromDescriptors(Seq("AGGREGATE"), Ctx(Some("line"), Seq("id")))(lines)
    val got = out.orderBy("id").select("running_count").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("two-op chain: FILTER then AGGREGATE (the reference job shape)") {
    val out = Pipeline.fromDescriptors(Seq("FILTER:error", "AGGREGATE"),
      Ctx(Some("line"), Seq("id")))(lines)
    val got = out.orderBy("id").select("id", "running_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (2L, 2L)))
  }

  test("Select dropping the order columns no longer breaks AGGREGATE (ADVICE r1)") {
    val out = Pipeline.fromDescriptors(
      Seq("TRANSFORM:select:line", "AGGREGATE"), Ctx(Some("line"), Seq("id")))(lines)
    val counts = out.select("running_count").collect().map(_.getLong(0)).sorted.toSeq
    assert(counts == Seq(1L, 2L, 3L)) // arrival-order fallback, still 1..n
  }
}
