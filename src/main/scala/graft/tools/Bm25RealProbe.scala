package graft.tools

import org.apache.spark.sql.functions._

object Bm25RealProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "bm25-real-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = graft.operators.Retrieval.bm25TopK(docs, Seq(
      "fast table scan" -> Seq("fast", "table", "scan"),
      "join merge sort" -> Seq("join", "merge", "sort"),
      "stream window agg" -> Seq("stream", "window", "agg")), k = 10,
      emitScore = true)
      .orderBy(col("query_id"), col("rnk"))
      .collect()
    out.foreach { r =>
      println(s"ROW ${r.getString(0)} rnk=${r.getInt(1)} id=${r.getLong(2)} " +
        s"hits=${r.getLong(3)} bits=${java.lang.Double.doubleToLongBits(r.getDouble(4))}")
    }
    spark.stop()
  }
}
