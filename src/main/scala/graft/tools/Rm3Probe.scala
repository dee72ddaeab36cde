package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Decompose q_bm25_rm3's wall time: pin construction, round-1 scoring +
  * census + expansion collect, round-2 scoring — so the "≤ 2 s" target is
  * attacked at the right stage.  runMain graft.tools.Rm3Probe */
object Rm3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-rm3-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    // warm
    SparkEntry.queries("q_bm25_rm3")(spark, sfDir).queryExecution.toRdd.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rm3probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (_ <- 1 to 2) {
      val pinned = t("pin(tokenize+mat)") {
        docs.select(col("doc_id").as("id"),
            TextFunctions.tokens(col("text")).as("toks"))
          .withColumn("dl", size(col("toks")).cast("long"))
          .localCheckpoint(true)
      }
      val terms = Seq("window", "table", "stream", "data", "query", "join")
      val m1 = t("round1 postings agg") {
        val m = pinned.select(col("id"), col("dl"), explode(col("toks")).as("tok"))
          .filter(col("tok").isin(terms: _*))
          .groupBy("id", "dl", "tok").agg(count(lit(1)).as("tf"))
        m.queryExecution.toRdd.count(); m
      }
      t("full rm3 (fresh)") {
        SparkEntry.queries("q_bm25_rm3")(spark, sfDir).queryExecution.toRdd.count()
      }
      t("bm25 alone (fresh)") {
        SparkEntry.queries("q_bm25")(spark, sfDir).queryExecution.toRdd.count()
      }
      pinned.unpersist()
    }
    spark.stop()
  }
}
