package graft.tools

import graft.ops.{OpCompiler, Pipeline, StreamOp}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: what does the BATCH running decimal sum (Spark's own
  * window sum) emit once the prefix exceeds the widened result precision?
  * Drives decimal(38,0) values 9e37, 9e37, -9e37: the middle prefix
  * (1.8e38) needs 39 digits. Determines the streaming clamp semantics. */
object DecimalOverflowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", args.headOption.getOrElse("true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val big = "9" + "0" * 37
    val df = Seq((1L, big), (2L, big), (3L, "-" + big))
      .toDF("id", "v")
      .withColumn("v", col("v").cast("decimal(38,0)"))
    val out = Pipeline(Seq(StreamOp.parseUnsafe("AGGREGATE:sum:v")),
      OpCompiler.Ctx(None, Seq("id")))(df)
    println("schema: " + out.schema("running_sum").dataType)
    out.orderBy("id").collect().foreach(r =>
      println(s"id=${r.getLong(0)} sum=${r.get(2)}"))
  }
}
