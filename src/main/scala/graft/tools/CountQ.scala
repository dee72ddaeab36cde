package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    println(s"[count] queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
    val missing = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    println(s"[count] queries without static oracle: ${missing.toSeq.sorted.mkString(",")}")
  }
}
