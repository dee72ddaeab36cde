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
}
