package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Compares q3_join shapes: the r06 plan statically broadcasts the PRUNED
  * lineitem scan (10.8 MB file x 3/16 columns ~ 2 MB estimate < 10 MB
  * threshold) — a fact-table broadcast that is wrong at scale and costs a
  * driver-side HashedRelation build per execution. Candidates keep the fact
  * on the streaming side. */
object Q3Variants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-q3var")
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    def cust = t("customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    def ord = t("orders").select("o_orderkey", "o_custkey")
    def li = t("lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    def aggIt(j: DataFrame): DataFrame = j.groupBy("l_orderkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(24,4)")).as("revenue"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "current (li bcast)" -> (() => aggIt(
        li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey")))),
      "shuffle_hash ordside" -> (() => aggIt(
        li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey")))),
      "merge join" -> (() => aggIt(
        li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))))
    )

    for ((name, mk) <- variants) {
      // cold-ish: fresh DataFrame each rep (as Bench does)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s " + times.map(x => f"$x%.3f").mkString(" "))
    }

    for ((name, mk) <- variants) {
      val df = mk(); df.count()
      val fin = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joins = fin.toString.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.take(110)).mkString("\n  ")
      println(s"== $name ==\n  $joins")
    }
    spark.stop()
  }
}
