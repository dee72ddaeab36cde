package graft.tools

import graft.functions.{Sketches, TextFunctions}
import graft.operators.{Dedup, Similarity}
import graft.ops.RunningCount
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface against real testdata.
  * Not part of the shipped API — a scratch harness for eyeballing operator
  * output (`sbt "runMain graft.tools.Drive"`). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    println("=== shingles (slice fix) ===")
    docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
      .withColumn("sh", slice(col("sh"), 1, 2)).orderBy("doc_id").show(3, 80)

    println("=== sketches via GraftExpr bridge ===")
    docs.select(col("doc_id"),
      Sketches.simhash64(TextFunctions.tokens(col("text"))).as("simhash"),
      Sketches.rollingHash(col("text")).as("rh"),
      slice(Sketches.minhashSignature(TextFunctions.shingleSet(col("text")), 8), 1, 3).as("mh3"))
      .orderBy("doc_id").show(3, false)

    println("=== minhashLsh pairs (jac>=0.5) ===")
    val pairs = Dedup.minhashLsh(docs, 0.5)
    pairs.show(5, false)
    println(s"pairs: ${pairs.count()}")

    println("=== running count (keyed) twice; cached RDD accumulation check ===")
    val rc = RunningCount.withRunningCount(docs.select("doc_id"), Seq(col("doc_id")))
    rc.orderBy("doc_id").show(3)
    val rc2 = RunningCount.withRunningCount(docs.select("doc_id"), Seq(col("doc_id")))
    println(s"rc2 rows: ${rc2.count()}")
    System.gc(); Thread.sleep(1000)
    println(s"persistent RDDs after 2 calls: ${spark.sparkContext.getPersistentRDDs.size}")

    println("=== running count (NO order cols -> arrival fallback) ===")
    val rc3 = RunningCount.withRunningCount(docs.select("lang"), Seq.empty)
    rc3.show(3)
    println(s"max running_count: ${rc3.agg(max("running_count")).first.getLong(0)}, rows: ${rc3.count()}")

    println("=== annLsh dim=64 (matches data) ===")
    Similarity.annLsh(emb.filter(col("vec_id") < 3), emb, k = 3, nPlanes = 6, dim = 64)
      .show(10, false)

    println("=== annLsh wrong dim=32 -> expect fail-fast ===")
    try {
      Similarity.annLsh(emb.filter(col("vec_id") < 3), emb, k = 3, nPlanes = 6, dim = 32).count()
      println("!!! NO ERROR (bad)")
    } catch {
      case e: Throwable => println(s"raised as expected: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
    }
    spark.stop()
  }
}
