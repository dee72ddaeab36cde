package graft.tools

import graft.functions.QualityFilters
import org.apache.spark.sql.functions._

/** Does the q_gopher gate shape evaluate GopherSignals ONCE per row?
  * The gate selects 8 getFields + the keep decision, each a reference to
  * its own (semantically equal) GopherSignals instance — 9 evals per row
  * unless codegen subexpression elimination dedups them. Compares:
  *   one    — a single field (the lower bound: exactly one eval)
  *   gate   — the 9-reference single-select gate shape
  *   two    — struct aliased once, fields in a second select (CollapseProject
  *            refuses to inline a non-cheap alias referenced 9 times, so
  *            this shape guarantees one eval + materialized struct)
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "quality-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-6s min ${times.drop(1).min}%.3f s (passes ${times.map(t => f"$t%.3f").mkString(" ")})")
    }

    time("one") {
      docs.select(col("doc_id"),
        QualityFilters.gopherCounts(col("text")).head._2.as("n_tokens"))
    }
    time("gate") {
      docs.select(col("doc_id") +:
        QualityFilters.gopherCounts(col("text")).map { case (n, c) => c.as(n) } :+
        QualityFilters.gopherKeep(col("text")).cast("long").as("keep"): _*)
    }
    time("two") {
      import org.apache.spark.sql.GraftExpr
      val st = GraftExpr.column(graft.functions.GopherSignals(
        GraftExpr.expression(coalesce(col("text"), lit(""))),
        graft.functions.TextFunctions.stopwords.head._2))
      docs.select(col("doc_id"), st.as("g"))
        .select(col("doc_id") +:
          graft.functions.GopherSignals.fields.map(f => col("g").getField(f).as(f)): _*)
    }
    spark.stop()
  }
}
