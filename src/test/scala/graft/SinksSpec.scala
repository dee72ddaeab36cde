package graft

import graft.ops.{OpCompiler, Pipeline}
import graft.sources.{Sinks, Tables}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with SparkSpec {

  private val dataDir = "/root/reference/file_system/data_storage/local_file"
  private def available = new java.io.File(dataDir).isDirectory

  test("dual results + lineage sink mirrors the reference's two logs") {
    assume(available)
    val out = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.lines(spark, s"$dataDir/business_1.txt")
    val result = Pipeline.fromDescriptors(Seq("FILTER:profit"),
      OpCompiler.Ctx(Some("value"), Seq("file", "line_no")))(docs)
    Sinks.writeResultsWithLineage(result, s"$out/results", s"$out/tuples")

    val results = spark.read.parquet(s"$out/results")
    val tuples = spark.read.parquet(s"$out/tuples")
    assert(results.count() > 0)
    assert(results.count() == tuples.count())
    assert(tuples.columns.toSet == Set("file", "line_no", "worker"))
  }

  test("compact merges appended file sets losslessly (the MergeData analog)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").resolve("t").toString
    // three "concurrent appenders", several files each
    for (w <- 0 until 3)
      (w * 1000L until w * 1000L + 500L).toDF("v")
        .repartition(4).write.mode("append").parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 12)
    Sinks.compact(spark, dir)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1, s"expected 1 compacted file, got $after") // tiny data -> one 128MB target
    // every appended row survives, exactly once
    val got = spark.read.parquet(dir).as[Long].collect().sorted
    val want = (0 until 3).flatMap(w => w * 1000L until w * 1000L + 500L).sorted
    assert(got.toSeq == want)
  }

  test("naive CSV compatibility mode reproduces split(\",\") misparsing") {
    assume(available)
    import scala.jdk.CollectionConverters._
    val naive = Tables.trafficSignsNaive(spark, s"$dataDir/Traffic_Signs_1000.csv")
    val got = naive.select("Size_").collect().map(_.getString(0)).toSeq.sorted
    val want = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$dataDir/Traffic_Signs_1000.csv"))
      .asScala.map(l => l.split(",").lift(4).orNull).toSeq.sorted
    assert(got == want)
    // and it genuinely diverges from the RFC-4180 parse on quoted rows
    val proper = Tables.trafficSigns(spark, s"$dataDir/Traffic_Signs_1000.csv")
      .select("Size_").collect().map(_.getString(0)).toSeq.sorted
    assert(got != proper)
  }
}
