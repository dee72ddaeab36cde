package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** r18 scratch probe: native Bm25Fold vs the aggregate-HOF reference on the
  * real corpus — prints every (query, doc) whose s bits or h differ. */
object Bm25FoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "bm25-fold-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val queries = Seq(
      "fast table scan" -> Seq("fast", "table", "scan"),
      "join merge sort" -> Seq("join", "merge", "sort"),
      "stream window agg" -> Seq("stream", "window", "agg"))
    val k1 = 1.2; val b = 0.75
    val toks = docs.select(col("doc_id").as("id"),
        TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val allTerms = queries.flatMap(_._2).distinct
    val posting = toks.select(col("id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(allTerms: _*))
    val matchedTf = posting.groupBy("id", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    val matched = matchedTf.groupBy("id", "dl")
      .agg(collect_list(struct(col("tok"), col("tf"))).as("qtfs"))
    val dfs = matched.select(explode(col("qtfs")).as("e"))
      .select(col("e.tok").as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    import spark.implicits._
    val qterms = queries.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (tm, ti) => (qid, ti, tm) }
    }.toDF("query_id", "ti", "term")
    val qidf = qterms.join(dfs, Seq("term"), "left").na.fill(0L, Seq("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("ti"), col("term"), col("idf")))).as("qarr"))
    val dlD = col("dl").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * dlD / col("avgdl"))
    def tfOf(t: org.apache.spark.sql.Column) =
      coalesce(try_element_at(filter(col("qtfs"),
        x => x.getField("tok") === t.getField("term")), lit(1))
        .getField("tf"), lit(0L)).cast("double")
    val hof = aggregate(col("qarr"), struct(lit(0.0).as("s"), lit(0L).as("h")),
      (acc, t) => {
        val tf = tfOf(t)
        struct((acc.getField("s") +
          t.getField("idf") * (tf * lit(k1 + 1.0)) / (tf + norm)).as("s"),
          (acc.getField("h") + tf.cast("long")).as("h"))
      })
    val nat = TextFunctions.bm25Fold(col("qtfs"), col("qarr"), norm, k1 + 1.0)
    val both = matched.crossJoin(broadcast(qidf)).crossJoin(broadcast(stats))
      .withColumn("h2", hof).withColumn("n2", nat)
      .select(col("query_id"), col("id"),
        col("h2.s").as("hs"), col("h2.h").as("hh"),
        col("n2.s").as("ns"), col("n2.h").as("nh"))
      .collect()
    var bad = 0
    both.foreach { r =>
      val hs = r.getDouble(2); val ns = r.getDouble(4)
      val hb = java.lang.Double.doubleToLongBits(hs)
      val nb = java.lang.Double.doubleToLongBits(ns)
      if (hb != nb || r.getLong(3) != r.getLong(5)) {
        bad += 1
        if (bad <= 10)
          println(s"DIFF q=${r.getString(0)} id=${r.getLong(1)} " +
            s"hof_s=$hs (bits $hb) nat_s=$ns (bits $nb) hof_h=${r.getLong(3)} nat_h=${r.getLong(5)}")
      }
    }
    println(s"rows=${both.length} diffs=$bad")
    spark.stop()
  }
}
