package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite with SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("lines numbers a file exactly even when it splits into many scan blocks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lines").toFile
    val f = new java.io.File(dir, "big.txt")
    val n = 500
    val content = (0 until n).map(i => f"line-$i%05d-${"x" * 40}").mkString("\n")
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    // ~24 KB file, 1 KB blocks -> ~24 splits; tiny openCost so splits are
    // bin-packed many-per-partition in size order (the misnumbering trigger)
    withConf(
      "spark.sql.files.maxPartitionBytes" -> "1024",
      "spark.sql.files.openCostInBytes" -> "16") {
      // assert on the SCAN partitioning (the joined output is AQE-coalesced)
      assert(spark.read.text(f.getAbsolutePath).rdd.getNumPartitions > 4,
        "test must actually split the file")
      val got = Tables.lines(spark, f.getAbsolutePath)
      val rows = got.collect().map(r => r.getLong(2) -> r.getString(0)).sortBy(_._1)
      assert(rows.map(_._1).toSeq == (0L until n.toLong))
      assert(rows.map(_._2).toSeq == content.linesIterator.toSeq)
    }
  }

  test("events NTZ snapshot is epoch-preserving under a non-UTC session zone; registerAll exposes the typed ts") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    // A snapshot whose ts column is TIMESTAMP_NTZ holding UTC wall clock —
    // the shape a timestamp[us] parquet without isAdjustedToUTC reads as
    // when NTZ inference is on. 2024-01-01T12:00:00 UTC = 1704110400 s.
    spark.range(1).select(
      lit(7L).as("user_id"),
      expr("make_timestamp_ntz(2024, 1, 1, 12, 0, 0.5)").as("ts"),
      lit("view").as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    withConf(
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "true",
      "spark.sql.session.timeZone" -> "America/New_York") {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType,
        "fixture must actually exercise the NTZ branch")
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      // unix_micros reads the instant, session-zone-independent: a bare
      // cast would land 5h off here (12:00 EST = 17:00 UTC)
      assert(got.select(expr("unix_micros(ts)")).head.getLong(0) == 1704110400500000L)
    }
    // registerAll needs every table present — use the real testdata dir,
    // whose TIMESTAMP(NANOS) snapshot reads as a nanos long: the raw view
    // would expose LongType where the contract promises an instant
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("select ts from events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    Tables.tableNames.foreach(spark.catalog.dropTempView(_))
  }

  test("lines numbers each file of a multi-file glob independently from 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lines2").toFile
    for (k <- 1 to 3) {
      val f = new java.io.File(dir, s"part_$k.txt")
      val content = (0 until 10 * k).map(i => s"f$k-l$i").mkString("\n")
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    val got = Tables.lines(spark, s"${dir.getAbsolutePath}/part_*.txt")
      .collect().groupBy(_.getString(1))
    assert(got.size == 3)
    for ((file, rows) <- got) {
      val k = file.replaceAll(".*part_(\\d)\\.txt$", "$1").toInt
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (0L until 10L * k), s"file $file")
      assert(sorted.map(_.getString(0)).toSeq == (0 until 10 * k).map(i => s"f$k-l$i"), s"file $file")
    }
  }

  test("jsonl: schema-first read, corrupt lines quarantined byte-exact") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("part0.jsonl")
    val lines = Seq(
      """{"id": 1, "text": "alpha", "score": 0.5}""",
      """{"id": 2, "text": "beta"}""",              // missing field -> null
      """{"id": "NOT_A_NUMBER", "text": "gamma"}""", // type clash -> corrupt
      """this is not json at all""",
      """{"id": 4, "text": "delta", "score": 2.0, "extra": "ignored"}""")
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType), StructField("score", DoubleType)))
    val (good, bad) = graft.sources.Tables.jsonlSplit(spark, dir.toString, schema)
    val g = good.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("text")))
      .sortBy(_._1).toSeq
    assert(g == Seq((1L, "alpha"), (2L, "beta"), (4L, "delta")))
    // quarantined rows carry the raw offending line byte-exact
    val b = bad.collect().map(_.getAs[String]("_corrupt_record")).sorted.toSeq
    assert(b == Seq("""{"id": "NOT_A_NUMBER", "text": "gamma"}""",
      """this is not json at all""").sorted)
    // no silent drops: good + quarantined == input lines
    assert(good.count() + bad.count() == lines.length)
    // schema collision on the corrupt column fails fast
    intercept[IllegalArgumentException] {
      graft.sources.Tables.jsonl(spark, dir.toString,
        StructType(Seq(StructField("_corrupt_record", StringType))))
    }
  }

  test("XML round trip preserves markup chars, whitespace, newlines, nulls") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val nasty = Seq((1L, "a & b < c > d"), (2L, "line1\nline2\ttab"),
      (3L, ""), (4L, null.asInstanceOf[String]), (5L, "  padded  "),
      (6L, "unicode: 日本 ü é"), (7L, "]]> <![CDATA[x]]>"), (8L, "\"quotes' &amp;"))
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_spec").toString
    try {
      nasty.toDF("id", "txt").write.mode("overwrite")
        .option("rowTag", "r").format("xml").save(dir)
      val back = spark.read
        .schema(StructType(Seq(StructField("id", LongType),
          StructField("txt", StringType))))
        .option("ignoreSurroundingSpaces", "false") // default TRIMS "  padded  "
        .option("rowTag", "r").format("xml").load(dir)
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
        .sortBy(_._1).toSeq
      assert(back == nasty.sortBy(_._1))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
