package graft.tools
import graft.{GraftSession, SparkEntry}
object IvProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "iv-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/.bench-data/sf1")) {
      val n = SparkEntry.queries("q_interval_join")(spark, dir).count()
      println(s"[iv-probe] $dir pairs=$n")
    }
    spark.stop()
  }
}
