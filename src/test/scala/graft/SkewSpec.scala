package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("saltedJoin returns exactly the rows of the plain inner join") {
    import spark.implicits._
    // 90% of the fact rows share one hot key
    val fact = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "v").repartition(8)
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 4).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("dropHotKeys removes exactly the keys over the cap, including a null-key flood") {
    import spark.implicits._
    val df = (
      (1 to 100).map(i => (Option(1L), i)) ++      // hot: 100 rows
      (1 to 5).map(i => (Option(2L), i)) ++        // cold: 5 rows
      (1 to 60).map(i => (Option.empty[Long], i))  // null-key flood: 60 rows
    ).toDF("k", "v").repartition(8)
    val got = Skew.dropHotKeys(df, Seq("k"), maxRows = 50L)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getInt(1)))
    // only the cold key survives: plain = (not <=>) would leak the null flood
    assert(got.map(_._1).toSet == Set(Option(2L)))
    assert(got.length == 5)
    // below the cap, null keys survive like any other
    val small = Seq((Option(1L), 1), (Option.empty[Long], 2)).toDF("k", "v")
    assert(Skew.dropHotKeys(small, Seq("k"), maxRows = 50L).count() == 2)
  }

  test("saltedCountDistinct is exact under a hot key") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => (1L, i % 137)) ++ (1 to 50).map(i => (2L, i)))
      .toDF("k", "v").repartition(8)
    val got = Skew.saltedCountDistinct(df, "k", "v", salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 137L, 2L -> 50L))
  }
}
