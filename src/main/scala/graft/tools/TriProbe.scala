package graft.tools

/** Throwaway timing probe for [[graft.operators.Graph.triangleCount]] —
  * stage-level costs at a given sf dir (TRI_SF env var). */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "tri-probe")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val dir = sys.env.getOrElse("TRI_SF", "/root/testdata/sf0.1")
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val edges = graft.operators.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    time("warm scan")(li.count())
    val e = time("edges distinct + pin")(edges.localCheckpoint(true))
    time("edge count")(System.err.println(e.count()))
    time("triangleCount pinned canonical")(
      graft.operators.Graph.triangleCount(e, edgesCanonical = true)
        .collect().foreach(r => System.err.println(r)))
    time("triangleCount raw")(
      graft.operators.Graph.triangleCount(edges, edgesCanonical = true)
        .collect().foreach(r => System.err.println(r)))
    spark.stop()
  }
}
