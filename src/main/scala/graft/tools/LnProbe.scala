package graft.tools
/** Does JVM Math.log bit-match libm/DuckDB ln on integer inputs? Prints
  * the doubles' raw bits for an external diff. */
object LnProbe {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter("/tmp/ln_jvm.txt")
    var i = 1
    while (i <= 50000) {
      out.println(java.lang.Double.doubleToLongBits(Math.log(i.toDouble)))
      i += 1
    }
    out.close()
    println("LN_DONE")
    // also via a Spark plan (codegen'd LOG) on a few values
    val spark = graft.GraftSession.local(2, "ln-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bits = (1 to 1000).toDF("x")
      .select(log(col("x").cast("double")).as("l")).collect()
      .map(r => java.lang.Double.doubleToLongBits(r.getDouble(0)))
    val out2 = new java.io.PrintWriter("/tmp/ln_spark.txt")
    bits.foreach(out2.println)
    out2.close()
    println("LN_SPARK_DONE")
    spark.stop()
  }
}
