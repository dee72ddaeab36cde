package graft

import graft.ops.{OpCompiler, Pipeline, RunningCount}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The property tests promised in SURVEY.md §5: filter containment,
  * split-into-words token conservation, running-count monotonicity/density —
  * over ScalaCheck-generated inputs (seeded sampling: each case is a full
  * Spark job, so a handful of deterministic draws beats hundreds). */
class PropertiesSpec extends AnyFunSuite with SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val lineGen: Gen[String] = Gen.listOfN(8,
    Gen.oneOf("error", "ok", "warn", "the", "fast", "slow", "x1", "Y2"))
    .map(_.mkString(" "))

  test("FILTER output is a subset of its input and matches the predicate") {
    import spark.implicits._
    for (seed <- 1L to 4L; pat <- Seq("error", "the", "zzz")) {
      val lines = sample(Gen.listOfN(30, lineGen), seed)
      val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "line")
      val out = Pipeline.fromDescriptors(Seq(s"FILTER:$pat"),
        OpCompiler.Ctx(Some("line"), Seq("id")))(df)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val in = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toSet
      assert(out.toSet.subsetOf(in), s"seed=$seed pat=$pat")
      assert(out.forall(_._2.toLowerCase.contains(pat)), s"seed=$seed pat=$pat")
      assert(out.length == lines.count(_.toLowerCase.contains(pat)), s"seed=$seed pat=$pat")
    }
  }

  test("splitintowords conserves total token count") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val lines = sample(Gen.listOfN(20, lineGen), seed)
      val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "line")
      val out = Pipeline.fromDescriptors(Seq("TRANSFORM:splitintowords"),
        OpCompiler.Ctx(Some("line"), Seq("id")))(df)
      val want = lines.map(l => l.trim.split("\\s+").length).sum
      assert(out.count() == want, s"seed=$seed")
    }
  }

  test("running count is a bijection onto 1..n and monotone in the order key") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val keys = sample(Gen.listOfN(60, Gen.chooseNum(-1000000L, 1000000L)), seed).distinct
      val df = keys.toDF("k").repartition(5)
      val got = RunningCount.withRunningCount(df, Seq(col("k")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.map(_._2).toSeq == (1L to keys.size.toLong), s"seed=$seed")
      assert(got.map(_._1).toSeq == keys.sorted, s"seed=$seed")
    }
  }

  test("sampleNGlobal draws min(n, |corpus|) rows, equal to an in-memory md5 sort") {
    import spark.implicits._
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- 1L to 3L) {
      val ids = sample(Gen.listOfN(80, Gen.chooseNum(0L, 1000000L)), seed).distinct
      val n = 1 + (seed * 17 % 40)
      val got = graft.operators.Curation.sampleNGlobal(
          ids.toDF("id").repartition(5), "id", n)
        .collect().map(_.getLong(0)).toSet
      val want = ids.sortBy(i => (md5hex(s"$i:global-n"), i)).take(math.min(n.toInt, ids.size)).toSet
      assert(got == want, s"seed=$seed n=$n")
    }
  }

  test("lengthBucketBatches: every batch is bucket-pure and at most batchSize on random inputs") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(120, Gen.zip(
        Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0L, 300L))), seed)
        .distinctBy(_._1)
      val bs = 1 + (seed % 9).toInt
      val got = graft.operators.Curation.lengthBucketBatches(
          rows.toDF("id", "n").repartition(7), col("n"), "id",
          Seq(50.0, 150.0, 250.0), bs)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("len_bucket"),
          r.getAs[Long]("batch_id")))
      assert(got.length == rows.size, s"seed=$seed row-preserving")
      got.groupBy(_._3).foreach { case (bid, g) =>
        assert(g.length <= bs, s"seed=$seed batch $bid overfull: ${g.length} > $bs")
        assert(g.map(_._2).distinct.length == 1, s"seed=$seed batch $bid spans buckets")
        assert(bid >> 40 == g.head._2, s"seed=$seed batch id encodes the bucket")
      }
    }
  }

  test("clusters equals an in-memory union-find on random pair graphs") {
    import spark.implicits._
    val pairGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
        .map(_.filter { case (a, b) => a != b })
    for (seed <- 1L to 4L) {
      val pairs = sample(pairGen, seed)
      // reference: path-compressing union-find over the same edges
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup.clusters(pairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed pairs=$pairs")
    }
  }

  test("zorderKey is a bijection: both coordinates recover from the interleave") {
    import spark.implicits._
    val pairs = Gen.listOfN(300,
      Gen.zip(Gen.choose(0, 255), Gen.choose(0, 255)))
      .apply(Gen.Parameters.default, Seed(11)).get.distinct
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.sources.Layouts.zorderKey(col("x"), col("y"), 8).as("z"))
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val xBack = (0 until 8).map(i => (((z >> (2 * i)) & 1L) << i).toInt).sum
      val yBack = (0 until 8).map(i => (((z >> (2 * i + 1)) & 1L) << i).toInt).sum
      assert(xBack == x && yBack == y, s"($x,$y) -> $z -> ($xBack,$yBack)")
    }
    // N-dim round-robin interleave: bit i of column j sits at i*N + j
    val triples = Gen.listOfN(100,
      Gen.zip(Gen.choose(0, 63), Gen.choose(0, 63), Gen.choose(0, 63)))
      .apply(Gen.Parameters.default, Seed(13)).get.distinct
    val got3 = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.sources.Layouts.zorderKeyN(Seq(col("a"), col("b"), col("c")), 6).as("z"))
      .collect()
    for (r <- got3; j <- 0 until 3) {
      val want = r.getInt(j)
      val z = r.getLong(3)
      val back = (0 until 6).map(i => (((z >> (3 * i + j)) & 1L) << i).toInt).sum
      assert(back == want, s"dim $j: $want -> $z -> $back")
    }
  }

  test("shingle sets are invariant under extra whitespace") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val line = sample(lineGen, seed)
      val noisy = "  " + line.replace(" ", "   ") + " "
      val r = Seq((line, noisy)).toDF("a", "b").select(
        TextFunctions.shingleSet(col("a"), 2).as("sa"),
        TextFunctions.shingleSet(col("b"), 2).as("sb"))
        .selectExpr("array_sort(sa) = array_sort(sb) as eq").first()
      assert(r.getBoolean(0), s"seed=$seed")
    }
  }

  // Hostile-text generator for the fused quality expressions: words mixed
  // with every char class the signals branch on (whitespace runs incl.
  // tab/newline edges, bullets, dot runs, unicode ellipsis/quotes, braces,
  // stopwords, digits, terminal punctuation).
  private val hostileGen: Gen[String] = Gen.listOfN(40, Gen.frequency(
    6 -> Gen.oneOf("word", "the", "a", "it", "Alpha", "b2", "123", "#tag"),
    3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\n\n", " \n "),
    2 -> Gen.oneOf(".", "...", "....", "…", "!", "?", "\"", "”"),
    1 -> Gen.oneOf("- ", "* ", "• ", "{", "}", "javascript", "Lorem ipsum")))
    .map(_.mkString)

  test("fused Gopher/C4 expressions match their composed formulations on hostile text") {
    import graft.functions.QualityFilters
    import spark.implicits._
    val texts = (1L to 12L).map(sample(hostileGen, _))
    val df = texts.toDF("t")
    val gRows = df.select(
      QualityFilters.gopherCountsComposed(col("t")).map { case (n, c) => c.as("c_" + n) } ++
        QualityFilters.gopherCounts(col("t")).map { case (n, c) => c.as("f_" + n) }: _*)
      .collect()
    for (r <- gRows; f <- graft.functions.GopherSignals.fields)
      assert(r.getAs[Long]("c_" + f) == r.getAs[Long]("f_" + f), s"$f in $r")
    val cRows = df.select(
      QualityFilters.c4CleanComposed(col("t"), 2).map { case (n, c) => c.as("c_" + n) } ++
        QualityFilters.c4Clean(col("t"), 2).map { case (n, c) => c.as("f_" + n) }: _*)
      .collect()
    for (r <- cRows) {
      assert(r.getAs[String]("c_clean_text") == r.getAs[String]("f_clean_text"), r.toString)
      assert(r.getAs[Long]("c_n_kept_lines") == r.getAs[Long]("f_n_kept_lines"), r.toString)
    }
  }

  test("withRunningAggs equals the single-agg calls, any kinds, any data") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(60,
        Gen.zip(Gen.choose(0L, 20L), Gen.choose(-50L, 50L))), seed)
        .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      val df = rows.toDF("id", "k", "v").repartition(5)
      val ord = Seq(col("k"), col("id"))
      val multi = RunningCount.withRunningAggs(df,
        Seq((col("v"), RunningCount.Kind.Sum, "s"),
          (lit(1L), RunningCount.Kind.Count, "c"),
          (col("v"), RunningCount.Kind.Max, "mx")), ord)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("s"), r.getAs[Long]("c"), r.getAs[Long]("mx"))).toMap
      val s1 = RunningCount.withRunningAgg(df, col("v"),
        RunningCount.Kind.Sum, ord, "s").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("s")).toMap
      val c1 = RunningCount.withRunningCount(df, ord, "c").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("c")).toMap
      val m1 = RunningCount.withRunningAgg(df, col("v"),
        RunningCount.Kind.Max, ord, "mx").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("mx")).toMap
      assert(multi.map { case (id, t) => id -> t._1 } == s1)
      assert(multi.map { case (id, t) => id -> t._2 } == c1)
      assert(multi.map { case (id, t) => id -> t._3 } == m1)
    }
  }

  test("quantile normalization onto the batch's own values is the near-identity") {
    import spark.implicits._
    // NOT exact identity: pos = ((r-1)/(n-1))*(n-1) can land an ulp off
    // r-1, interpolating between neighbors — the same fp semantics as
    // percentile/quantile_cont. The mapping must stay within an ulp-scale
    // relative error of the original value.
    for (seed <- 1L to 3L) {
      val vals = sample(Gen.listOfN(40, Gen.choose(0L, 10000L)), seed).distinct
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = graft.operators.Curation.quantileNormalizeAgainst(
        df, df, "v", "id").collect()
      out.foreach { r =>
        val v = r.getAs[Double]("v"); val m = r.getAs[Double]("mapped")
        assert(math.abs(m - v) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"v=$v mapped=$m")
      }
    }
  }

  test("percentile rank against itself counts each value's own <= set") {
    import spark.implicits._
    for (seed <- 2L to 4L) {
      val vals = sample(Gen.listOfN(50, Gen.choose(0L, 30L)), seed)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = graft.operators.Curation.percentileRankAgainst(df, df, "v", "id")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
          r.getAs[Long]("n_le")))
      out.foreach { case (_, v, nLe) =>
        assert(nLe == vals.count(_ <= v.toLong))
      }
    }
  }

  test("hilbertKey is a bijection with unit steps at every bit width 1..5") {
    import spark.implicits._
    for (bits <- 1 to 5) {
      val side = 1 << bits
      val grid = for { x <- 0 until side; y <- 0 until side } yield (x.toLong, y.toLong)
      val keyed = grid.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.sources.Layouts.hilbertKey(col("x"), col("y"), bits).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(keyed.map(_._3).sorted.toSeq == (0L until side.toLong * side))
      keyed.sortBy(_._3).sliding(2).foreach {
        case Array((x1, y1, _), (x2, y2, _)) =>
          assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
        case _ => ()
      }
    }
  }

  test("pairRecall is bounded in [0,1] and symmetric under perfect agreement on random pair sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 3) {
      val mk = () => Seq.fill(40)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter { case (a, b) => a != b }
      val ap = mk().toDF("a_id", "b_id")
      val ex = mk().toDF("a_id", "b_id")
      val r = graft.operators.Dedup.pairRecall(ap, ex).collect().head
      val n_e = r.getLong(0); val n_a = r.getLong(1); val hits = r.getLong(2)
      assert(hits <= n_e && hits <= n_a)
      if (n_e > 0) assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      if (n_a > 0) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("temperatureSample kept count grows monotonically with budget") {
    import spark.implicits._
    val docs = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val counts = Seq(50L, 150L, 300L, 600L).map(b =>
      graft.operators.Curation.temperatureSample(docs, "source", budget = b).count())
    assert(counts == counts.sorted)
  }

  test("overlapJoin equals the brute non-equi join on random interval sets, any chunk size") {
    import spark.implicits._
    val ivGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 80L)))
      .map(_.zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) })
    for (seed <- 1L to 3L; chunk <- Seq("1 minute", "3 minutes")) {
      val as = sample(ivGen, seed)
      val bs = sample(ivGen, seed + 100)
      // reference: in-memory all-pairs overlap (micros scale: seconds*1e6
      // keeps the chunk arithmetic honest)
      def us(x: Long) = x * 1000000L
      val want = (for {
        (ai, as_, ae) <- as; (bi, bs_, be) <- bs
        if us(as_) <= us(be) && us(bs_) <= us(ae)
      } yield (ai, bi) ->
        (math.min(us(ae), us(be)) - math.max(us(as_), us(bs_)))).toMap
      val got = graft.operators.AsOfJoin.overlapJoin(
        as.map { case (i, s, e) => (i, us(s), us(e)) }
          .toDF("a_id", "start_us", "end_us"),
        bs.map { case (i, s, e) => (i, us(s), us(e)) }
          .toDF("b_id", "start_us", "end_us"),
        chunk = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"seed=$seed chunk=$chunk")
    }
  }

  test("sortedNeighborhoodPairs candidates equal the brute rank-window on random keys") {
    import spark.implicits._
    val docGen: Gen[List[String]] = Gen.listOfN(20,
      Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString))
    for (seed <- 1L to 3L) {
      val titles = sample(docGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = titles.toDF("doc_id", "title")
      val got = graft.operators.Dedup.sortedNeighborhoodPairs(
          df, window = 3, threshold = 0.01, textCol = "title")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: in-memory sort by (key, id), all pairs within rank
      // distance 3, verified with the SAME JW kernel evaluated on an
      // independent driver-built pair frame (the rank/bucket plumbing —
      // the thing SNM adds — is what this probes; the kernel has its
      // own spec)
      val ranked = titles.sortBy { case (id, t) => (t.toLowerCase.trim, id) }
      val cand = (for {
        i <- ranked.indices; g <- 1 to 3; if i + g < ranked.size
      } yield (ranked(i)._1, ranked(i + g)._1)).toSet
      val byId = titles.toMap
      val want = cand.toSeq
        .map { case (a, b) => (a, b, byId(a), byId(b)) }
        .toDF("a", "b", "ta", "tb")
        .withColumn("jw", TextFunctions.jaroWinkler(col("ta"), col("tb")))
        .filter(col("jw") >= 0.01)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=$seed")
    }
  }
}
