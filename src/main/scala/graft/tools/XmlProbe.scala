package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
object XmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "xml-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = "/tmp/graft_xml_probe"
    docs.write.mode("overwrite").option("rowTag", "doc").format("xml").save(out)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    for (iss <- Seq("true", "false")) {
      val back = spark.read.schema(schema).option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", iss).format("xml").load(out)
      val d1 = back.exceptAll(docs).count()
      val d2 = docs.exceptAll(back).count()
      println(s"ignoreSurroundingSpaces=$iss diff: $d1 / $d2 (rows=${back.count()})")
    }
    spark.stop()
  }
}
