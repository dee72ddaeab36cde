package graft.tools

import graft.operators.Decontaminate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch drive: overlapBloom must be row-identical to overlap, and the
  * bloom-side plan should show the scalar-subquery bloom + a filtered
  * postings branch. `sbt "runMain graft.tools.BloomProbe"`. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = docs.filter(col("doc_id") % 89 === 0)

    val exact = Decontaminate.overlap(docs, bench)
    val bloom = Decontaminate.overlapBloom(docs, bench,
      expectedItems = 100000L, fpp = 0.03)
    val diff = exact.exceptAll(bloom).count() + bloom.exceptAll(exact).count()
    println(s"rows exact=${exact.count()} bloom=${bloom.count()} diff=$diff")
    bloom.explain("formatted")
  }
}
