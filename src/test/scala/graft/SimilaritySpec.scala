package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private val dim = 16

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (0L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  /** Driver-side oracle: plain Scala cosine. */
  private def scalaTopK(k: Int): Map[Long, Seq[Long]] = {
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (0L until 5L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }.take(k).map(_._1)
    }.toMap
  }

  test("bruteForceTopK matches a driver-side cosine oracle") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.bruteForceTopK(corpus.filter(col("vec_id") < 5), corpus, k = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    assert(got == scalaTopK(4))
  }

  test("annLsh achieves usable recall@5 against brute force") {
    import org.apache.spark.sql.functions.col
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = scalaTopK(5)
    val ann = Similarity.annLsh(queries, corpus, k = 5, nPlanes = 5, dim = dim)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recall = exact.map { case (q, want) =>
      want.count(ann.getOrElse(q, Set.empty)).toDouble / want.size
    }.sum / exact.size
    assert(recall >= 0.4, s"recall $recall below floor") // multi-probe, 32 buckets over 200 vecs
  }

  test("annIvf trained on a sample still reaches the recall floor") {
    import org.apache.spark.sql.functions.col
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = scalaTopK(5)
    val ivf = Similarity.annIvf(queries, corpus, k = 5, nlist = 8, nprobe = 4,
        trainFraction = 0.5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recall = exact.map { case (q, want) =>
      want.count(ivf.getOrElse(q, Set.empty)).toDouble / want.size
    }.sum / exact.size
    assert(recall >= 0.4, s"sampled-train IVF recall $recall below floor")
  }

  test("annIvf achieves usable recall@5 against brute force") {
    import org.apache.spark.sql.functions.col
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = scalaTopK(5)
    val ivf = Similarity.annIvf(queries, corpus, k = 5, nlist = 8, nprobe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recall = exact.map { case (q, want) =>
      want.count(ivf.getOrElse(q, Set.empty)).toDouble / want.size
    }.sum / exact.size
    assert(recall >= 0.4, s"IVF recall $recall below floor")
  }

  test("annIvf stashes its trained centroids for the oracle generator") {
    import org.apache.spark.sql.functions.col
    Similarity.annIvf(corpus.filter(col("vec_id") < 5), corpus,
      k = 3, nlist = 8, nprobe = 2).count()
    val run = Similarity.lastIvfRun.getOrElse(fail("no IvfRun stashed"))
    assert(run.nlist == 8 && run.nprobe == 2 && run.k == 3)
    assert(run.centroids.length == 8 && run.centroids.forall(_.length == dim))
  }

  test("annIvf retrains when a file-backed corpus is overwritten IN PLACE at the same row count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    def mkData(shift: Float) =
      (0L until 64L).map(i => (i, Array.fill(8)(rnd.nextFloat() + shift)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_fp").resolve("c").toString
    mkData(0f).toDF("vec_id", "embedding").repartition(2).write.parquet(dir)
    def run(): Array[Array[Double]] = {
      val c = spark.read.parquet(dir)
      Similarity.annIvf(c.filter(col("vec_id") < 3), c, k = 2, nlist = 4, nprobe = 2).count()
      Similarity.lastIvfRun.get.centroids
    }
    val first = run()
    // same data again: cache hit, identical centroids (and no count job —
    // the fingerprint comes from the driver's file listing)
    assert(run().map(_.toSeq).toSeq == first.map(_.toSeq).toSeq)
    // overwrite in place: SAME row count, shifted contents. A row-count
    // fingerprint would serve the stale quantizer; the file-metadata
    // fingerprint (sizes/mtimes changed) must retrain.
    mkData(10f).toDF("vec_id", "embedding").repartition(2)
      .write.mode("overwrite").parquet(dir)
    val retrained = run()
    assert(retrained.map(_.toSeq).toSeq != first.map(_.toSeq).toSeq,
      "stale quantizer served after an in-place overwrite")
  }

  test("nearestCells orders cells by (distance, index) with lower-index ties") {
    import spark.implicits._
    import graft.functions.VectorFunctions.nearestCells
    import org.apache.spark.sql.functions.col
    // centroids 1 and 2 are equidistant from the probe; 0 is nearest
    val centroids = Array(Array(0.0, 0.0), Array(2.0, 0.0), Array(-2.0, 0.0))
    val got = Seq(Tuple1(Array(0.0f, 1.0f))).toDF("v")
      .select(nearestCells(col("v"), centroids, 3).as("c"))
      .first().getSeq[Int](0)
    assert(got == Seq(0, 1, 2))
  }

  test("cosine_similarity fails fast on ragged array lengths") {
    import spark.implicits._
    import graft.functions.VectorFunctions.cosineSimilarity
    import org.apache.spark.sql.functions.col
    val ragged = Seq((Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      ragged.select(cosineSimilarity(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(t => Option(t.getMessage).exists(_.contains("length mismatch"))))
  }

  test("annLsh fails fast on a dimension mismatch instead of degenerating") {
    val e = intercept[Exception] {
      Similarity.annLsh(corpus.limit(2), corpus, k = 2, nPlanes = 4, dim = 8).count()
    }
    assert(e.getMessage.contains("dim"))
  }

  test("assignToCentroids matches a driver-side argmax with lowest-cid ties") {
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (0L until 8L).map(c => c -> vecs(c))
    val expected = vecs.map { case (id, v) =>
      // strict > keeps the first (lowest-cid) maximum
      id -> cents.foldLeft((-1L, Double.NegativeInfinity)) { case ((bc, bs), (c, cv)) =>
        val s = cos(v, cv); if (s > bs) (c, s) else (bc, bs)
      }._1
    }
    val got = Similarity.assignToCentroids(corpus, k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // each centroid vector lands in its own cluster (cos(self) = 1)
    (0L until 8L).foreach(c => assert(got(c) == c))
  }

  test("semanticDedup drops exactly the vectors with a lower-id in-cluster near-twin") {
    import spark.implicits._
    import graft.operators.Dedup
    // two tight bundles + isolated vectors; centroids = ids 0,1
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e1b = Array(0.999f, 0.01f, 0.0f, 0.0f)   // near-twin of e1
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val e2b = Array(0.01f, 0.999f, 0.0f, 0.0f)   // near-twin of e2
    val iso = Array(0.0f, 0.0f, 1.0f, 0.0f)      // own direction, survives
    val df = Seq((0L, e1), (1L, e2), (2L, e1b), (3L, e2b), (4L, iso))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, k = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    // 2 duplicates 0 (cluster 0), 3 duplicates 1 (cluster 1); 4 is in some
    // cluster but nothing is near it
    assert(out == Seq(0L, 1L, 4L))
  }

  test("quantizeInt8: max-abs lands on ±127, zero vector quantizes to zeros at scale 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions.quantizeInt8
    val df = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-4.0f, 4.0f, 2.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), quantizeInt8(col("embedding")).as("sq"))
      .select(col("vec_id"), col("sq.scale"), col("sq.q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2.0, Seq(127, -63, 32, 0)),   // -1/2*127 = -63.5 -> floor(-63)= -63; 0.5/2*127=31.75 -> 32
      (2L, 0.0, Seq(0, 0, 0, 0)),
      (3L, 4.0, Seq(-127, 127, 64, -63))))
  }

  test("semanticDedupAgainstCorpus drops only new vectors with a corpus twin in-cluster") {
    import spark.implicits._
    import graft.operators.Dedup
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val corpus = Seq((0L, e1), (1L, e2)).toDF("vec_id", "embedding")
    val nw = Seq(
      (10L, Array(0.999f, 0.01f, 0.0f, 0.0f)),  // twin of corpus 0 -> dropped
      (11L, Array(0.01f, 0.999f, 0.0f, 0.0f)),  // twin of corpus 1 -> dropped
      (12L, Array(0.0f, 0.0f, 1.0f, 0.0f)),     // novel direction -> kept
      (13L, Array(0.7f, 0.7f, 0.0f, 0.0f)))     // cos ~= 0.707 < 0.99 -> kept
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupAgainstCorpus(nw, corpus, k = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    assert(out == Seq(12L, 13L))
    // new-batch-internal twins are NOT the incremental operator's job
    val twins = Seq((20L, e1), (21L, e1)).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedupAgainstCorpus(
      twins, Seq((0L, e2)).toDF("vec_id", "embedding"), k = 1, threshold = 0.99)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(20L, 21L))
  }

  test("centroidUpdate: fixed-point sums are exact and partition-invariant") {
    import spark.implicits._
    // two obvious clusters on the axes; seeds = first 2 ids = one per axis
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    def stats(df: org.apache.spark.sql.DataFrame) =
      Similarity.centroidUpdate(df, k = 2)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
    val got = stats(vecs)
    // cluster 1 = {1,3,5}: dim0 sum = round(1e7)+round(.9f*1e7)+round(.8f*1e7)
    def fp(f: Float) = math.round(f.toDouble * 1e7)
    assert(got((1L, 0L)) == (3L, fp(1.0f) + fp(0.9f) + fp(0.8f)))
    assert(got((1L, 1L)) == (3L, fp(0.0f) + fp(0.1f) + fp(0.0f)))
    assert(got((2L, 0L)) == (2L, fp(0.0f) + fp(0.1f)))
    assert(got((2L, 1L)) == (2L, fp(1.0f) + fp(0.9f)))
    assert(stats(vecs.repartition(7)) == got)
  }

  test("updatedCentroids: means in dimension order; kmeansIterate converges") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansIterate(vecs, k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(cents.keySet == Set(1L, 2L))
    // cluster 1 mean ~ (0.9, 0.033), cluster 2 ~ (0.05, 0.95)
    assert(math.abs(cents(1L)(0) - 0.9) < 1e-6)
    assert(math.abs(cents(2L)(1) - 0.95) < 1e-6)
    // rounds = 0 returns the seeds unchanged
    val seeds = Similarity.kmeansIterate(vecs, k = 2, rounds = 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(seeds(1L) == Seq(1.0, 0.0) && seeds(2L) == Seq(0.0, 1.0))
  }

  test("kmeansIterate: a starved seed's cluster drops out instead of reseeding") {
    import spark.implicits._
    // seeds 1 and 2 point the SAME way: every cosine ties and the
    // lowest-cid rule starves cluster 2 from round 1 on
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.9f, 0.1f)), (5L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansIterate(vecs, k = 3, rounds = 2)
      .collect().map(_.getLong(0)).toSet
    assert(cents == Set(1L, 3L))
  }

  test("ringNegatives: deterministic, uniform-ish, never self, k per row") {
    import spark.implicits._
    val docs = (1L to 50L).toDF("doc_id")
    val out = graft.operators.Contrastive.ringNegatives(docs, "doc_id", k = 4)
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("j"), r.getAs[Long]("neg_doc_id")))
    // every doc gets exactly k negatives (N=50 > k, step=10: no wraps to self)
    assert(rows.length == 200)
    assert(rows.forall { case (d, _, n) => d != n })
    assert(rows.groupBy(_._1).forall(_._2.length == 4))
    // each doc's negatives are distinct
    assert(rows.groupBy(_._1).forall { case (_, g) => g.map(_._3).distinct.length == 4 })
    // deterministic and partition-invariant
    val again = graft.operators.Contrastive
      .ringNegatives(docs.repartition(7), "doc_id", k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("j"),
        r.getAs[Long]("neg_doc_id"))).toSet
    assert(again == rows.toSet)
    // a different salt draws a different set
    val other = graft.operators.Contrastive
      .ringNegatives(docs, "doc_id", k = 4, salt = "epoch2")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("j"),
        r.getAs[Long]("neg_doc_id"))).toSet
    assert(other != rows.toSet)
  }

  test("ringNegatives: tiny corpus (N <= k) filters wrap-around self pairs") {
    import spark.implicits._
    val docs = (1L to 3L).toDF("doc_id")
    val rows = graft.operators.Contrastive.ringNegatives(docs, "doc_id", k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("neg_doc_id")))
    assert(rows.nonEmpty && rows.forall { case (d, n) => d != n })
  }

  test("hardNegatives: only different-label neighbors, null labels never pair") {
    import spark.implicits._
    def v(seed: Int) = Array.tabulate(8)(i => (seed * (i + 1) % 7 - 3).toFloat)
    val emb = Seq(
      (1L, v(1), Some(0)), (2L, v(2), Some(0)), (3L, v(3), Some(1)),
      (4L, v(4), Some(1)), (5L, v(5), Some(2)), (6L, v(6), None))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Contrastive
      .hardNegatives(emb.filter($"vec_id" <= 2), emb, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("n_label")))
    // queries have label 0: candidates are only 3,4 (label 1) and 5 (label 2);
    // vec 6 (null label) and same-label 1,2 never appear
    assert(out.nonEmpty)
    assert(out.forall { case (_, n, _) => n >= 3 && n <= 5 })
    assert(out.groupBy(_._1).forall(_._2.length == 3))
  }

  test("pqEncode: hand-checked codes, ties to smallest cid, short rows -1") {
    import spark.implicits._
    // dim 4, m 2 -> 2-dim subspaces. Codebook = first 2 vectors by id:
    //   cid 1: [0,0 | 4,4]   cid 2: [3,3 | 0,0]
    val emb = Seq(
      (1L, Seq(0f, 0f, 4f, 4f)),
      (2L, Seq(3f, 3f, 0f, 0f)),
      (10L, Seq(1f, 0f, 1f, 1f)),  // sub0 d2: 1 vs 13 -> 1; sub1: 18 vs 2 -> 2
      (11L, Seq(3f, 2f, 4f, 5f)),  // sub0: 13 vs 1 -> 2; sub1: 1 vs 41 -> 1
      (12L, Seq(1.5f, 1.5f, 2f, 2f)), // equidistant both subspaces -> cid 1
      (13L, Seq(9f, 9f))           // too short for subspace 1 -> -1 there
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.pqEncode(emb, m = 2, k = 2, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(out(10L) == ((1L, 2L)))
    assert(out(11L) == ((2L, 1L)))
    assert(out(12L) == ((1L, 1L))) // exact tie keeps the first (smallest cid)
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((2L, 2L)))
    // short row: sub0 [9,9] is closer to cid 2; sub1 slice is empty -> -1
    assert(out(13L) == ((2L, -1L)))
    // null element in a window nulls every distance there -> -1 sentinel,
    // while the clean window still encodes (the HOF null-propagation
    // contract the native PqCode expression replicates)
    val withNull = Seq(
      (1L, Seq[java.lang.Float](0f, 0f, 4f, 4f)),
      (2L, Seq[java.lang.Float](3f, 3f, 0f, 0f)),
      (20L, Seq[java.lang.Float](1f, null, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val outN = graft.operators.Similarity.pqEncode(withNull, m = 2, k = 2, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(outN(20L) == ((-1L, 2L))) // sub1 [1,1]: d2 2 (cid 2) beats 18 (cid 1)
    // positional mode: same argmin, 0-based codebook INDEX instead of cid
    // (the ADC array-lookup key); sentinel stays -1. Codebook = the same
    // cid-sorted 2-row book as above (cid 1 -> index 0, cid 2 -> index 1),
    // built as a literal in sort order.
    locally {
      import org.apache.spark.sql.functions.{broadcast, col, typedLit}
      val cbRow = emb.sparkSession.range(1).select(
        typedLit(Seq((1L, Seq(0.0, 0.0)), (2L, Seq(3.0, 3.0)))).as("__cb_0"),
        typedLit(Seq((1L, Seq(4.0, 4.0)), (2L, Seq(0.0, 0.0)))).as("__cb_1"))
      val posOut = emb.crossJoin(broadcast(cbRow))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.pqCode(
            col("embedding"), col("__cb_0"), 0, 2, positional = true).as("p0"),
          graft.functions.VectorFunctions.pqCode(
            col("embedding"), col("__cb_1"), 2, 2, positional = true).as("p1"))
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("p0"), r.getAs[Long]("p1")))).toMap
      // cid k -> index k-1 on this codebook; -1 stays -1
      out.foreach { case (id, (c0, c1)) =>
        assert(posOut(id) == ((if (c0 < 0) c0 else c0 - 1,
          if (c1 < 0) c1 else c1 - 1)), s"positional mismatch at id=$id")
      }
    }
    // encoding against a PROVIDED codebook source reproduces the same codes
    val cbSrc = emb.filter($"vec_id" <= 2)
    val out2 = graft.operators.Similarity
      .pqEncode(emb, m = 2, k = 2, dim = 4, codebookSource = Some(cbSrc))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(out2 == out)
  }

  test("pqSearch: ADC equals exact L2 ranking when every corpus vector is a codeword") {
    import spark.implicits._
    // 6 vectors, dim 4, m=2, k=6: the codebook contains EVERY corpus
    // sub-vector, so encoding is lossless and ADC(q, x) = ‖q − x‖² exactly
    val vecs = Seq(
      0L -> Array(0f, 0f, 0f, 0f), 1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 2f, 0f, 0f), 3L -> Array(1f, 1f, 1f, 1f),
      4L -> Array(3f, 0f, 1f, 0f), 5L -> Array(0f, 0f, 0f, 5f))
    val emb = vecs.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .pqSearch(emb.filter($"vec_id" < 2), emb, m = 2, k = 6, dim = 4, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val ref = for {
      q <- vecs.take(2)
      // self-matches excluded, like every other searcher here
      ranked = vecs.filter(_._1 != q._1)
        .sortBy { case (id, v) => (l2(q._2, v), id) }.take(3)
      ((id, v), i) <- ranked.zipWithIndex
    } yield (q._1, id, (i + 1).toLong, l2(q._2, v))
    assert(out.sortBy(r => (r._1, r._3)).toSeq == ref.toSeq)
    // every query emits exactly topK rows
    assert(out.groupBy(_._1).forall(_._2.length == 3))
  }

  test("ivfPqSearch: probing every cell equals pqSearch minus self-matches") {
    import spark.implicits._
    // no zero vector: cosine coarse assignment sends it to the -1
    // unassignable cell, which no query probes (the documented convention)
    val vecs = Seq(
      0L -> Array(0f, 0f, 1f, 0f), 1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 2f, 0f, 0f), 3L -> Array(1f, 1f, 1f, 1f),
      4L -> Array(3f, 0f, 1f, 0f), 5L -> Array(0f, 0f, 0f, 5f))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 1L || $"vec_id" === 3L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    // nprobe = nlist: the coarse layer prunes nothing, so the result is
    // exactly the ADC ranking of the full corpus with self excluded
    val got = rows(graft.operators.Similarity.ivfPqSearch(q, emb,
      topK = 3, nlist = 3, nprobe = 3, m = 2, k = 6, dim = 4))
    val want = rows(graft.operators.Similarity.pqSearch(q, emb,
      m = 2, k = 6, dim = 4, topK = 4))
      .filter { case (qid, nid, _, _) => qid != nid }
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(_._3).take(3).zipWithIndex
          .map { case ((qid, nid, _, d), i) => (qid, nid, (i + 1).toLong, d) }
      }.sortBy(t => (t._1, t._3))
    assert(got == want)
    // nprobe < nlist returns at most topK rows per query, ranks contiguous
    val pruned = graft.operators.Similarity.ivfPqSearch(q, emb,
      topK = 3, nlist = 3, nprobe = 1, m = 2, k = 6, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    pruned.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("mmrRerank: lambda=1 is pure relevance; diversity kicks a near-dup out of the top-k") {
    import spark.implicits._
    // q=0; candidates: 1 and 2 are near-identical high-relevance twins,
    // 3 is orthogonal-ish lower relevance
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.9f, 0.1f, 0f, 0f),
      2L -> Array(0.9f, 0.11f, 0f, 0f),
      3L -> Array(0.3f, 0f, 1f, 0f))
    val emb = vecs.toDF("vec_id", "embedding")
    val cand = graft.operators.Similarity
      .bruteForceTopK(emb.filter($"vec_id" === 0), emb, k = 3)
    def ranks(lambda: Double, k: Int) = graft.operators.Similarity
      .mmrRerank(cand, emb, k = k, lambda = lambda)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    // lambda=1: the relevance order 1, 2, 3 (cos desc) unchanged
    assert(ranks(1.0, 3) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // balanced lambda: after picking 1, its twin 2 is penalized by ~1.0
    // similarity while 3 is barely penalized -> 3 jumps to rank 2
    assert(ranks(0.5, 2) == Map(1L -> 1L, 2L -> 3L))
    // every query emits exactly k CONTIGUOUS ranks
    val out = graft.operators.Similarity.mmrRerank(cand, emb, k = 3, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)))
  }

  test("pqTrainCodebooks: rounds=0 = seeds; training lowers distortion; dead cells keep codewords") {
    import spark.implicits._
    // subspace 0: two tight clusters around (0,0) and (10,10);
    // subspace 1: ALL points near (5,5) -> seed cell 1 ([6,6]-ish) wins
    // nothing after round 1 if its codeword drifts... constructed so seeds
    // are (v0, v1) by id
    val vecs = Seq(
      0L -> Array(0f, 0f, 5f, 5f), 1L -> Array(10f, 10f, 20f, 20f),
      2L -> Array(0.5f, 0.5f, 5f, 5f), 3L -> Array(10.5f, 10.5f, 5.1f, 5.1f),
      4L -> Array(-0.5f, 0.5f, 4.9f, 5f), 5L -> Array(9.5f, 10f, 5f, 4.9f))
    val emb = vecs.toDF("vec_id", "embedding")
    val seeded = graft.operators.Similarity
      .pqTrainCodebooks(emb, m = 2, k = 2, dim = 4, rounds = 0)
    // rounds=0: exactly the first-k-by-id sub-vector concatenation
    assert(seeded.map(_.toSeq).toSeq == Seq(
      Seq(0.0, 0.0, 5.0, 5.0), Seq(10.0, 10.0, 20.0, 20.0)))
    val trained = graft.operators.Similarity
      .pqTrainCodebooks(emb, m = 2, k = 2, dim = 4, rounds = 3)
    // shape is stable: k rows x dim, regardless of dead cells
    assert(trained.length == 2 && trained.forall(_.length == 4))
    // subspace 0 codewords converge to the two cluster means
    assert(math.abs(trained(0)(0) - 0.0) < 0.5 && math.abs(trained(1)(0) - 10.0) < 0.5)
    // subspace 1: every point is nearer seed 0's codeword region than
    // (20,20) -> cell 1 dies; its codeword stays the ORIGINAL seed slice
    assert(trained(1).slice(2, 4).toSeq == Seq(20.0, 20.0))
    // training never raises total quantization distortion vs seeding
    def distortion(cb: Array[Array[Double]]): Double =
      vecs.map { case (_, v) =>
        (0 until 2).map { j =>
          val sub = v.slice(j * 2, j * 2 + 2).map(_.toDouble)
          cb.map(c => c.slice(j * 2, j * 2 + 2).zip(sub)
            .map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    assert(distortion(trained) <= distortion(seeded))
  }

  test("recallAtK: self-recall 1.0; disjoint result 0.0; partial overlap exact") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L))
      .toDF("q_id", "n_id", "rank")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val self = m(graft.operators.Similarity.recallAtK(exact, exact, k = 3))
    assert(self == Map(1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0))))
    // approx misses one of q1's and all of q2's
    val appx = Seq((1L, 10L, 1L), (1L, 12L, 2L), (1L, 99L, 3L),
      (2L, 90L, 1L), (2L, 91L, 2L), (2L, 92L, 3L))
      .toDF("q_id", "n_id", "rank")
    val got = m(graft.operators.Similarity.recallAtK(appx, exact, k = 3))
    assert(got == Map(1L -> ((2L, 3L, 2.0 / 3)), 2L -> ((0L, 3L, 0.0))))
    // ranks beyond k on either side are ignored
    val deep = m(graft.operators.Similarity.recallAtK(appx, exact, k = 2))
    assert(deep(1L) == ((1L, 2L, 0.5)))
  }

  test("sortedIntersectCount: merge semantics on sorted long arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, size}
    val df = Seq(
      (1L, Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)), // -> 2
      (2L, Seq.empty[Long], Seq(1L, 2L)), // empty side -> 0
      (3L, Seq(2L, 4L), Seq(5L, 6L)), // disjoint -> 0
      (4L, Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)) // dups: min multiplicity
    ).toDF("id", "a", "b")
    val out = df.select($"id", graft.functions.VectorFunctions
      .sortedIntersectCount($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 2L))
    // matches size(array_intersect) on set inputs (rows 1-3)
    val hof = df.filter($"id" <= 3).select($"id",
      size(array_intersect($"a", $"b")).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("randomProject: exact integer ±sums matching a driver-side replay") {
    import spark.implicits._
    import graft.functions.VectorFunctions.makeSigns
    // dyadic components: x*1000 quantizes exactly, so the expected values
    // are computable without any float tolerance
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-0.125f, 1.5f, -2.5f, 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val signs = makeSigns(outDims = 3, dim = 4)
    val got = graft.operators.Similarity
      .randomProject(df, outDims = 3, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = vecs.map { case (id, v) =>
      id -> signs.map(row =>
        v.zip(row).map { case (x, s) => math.round(x.toDouble * 1000) * s }.sum).toSeq
    }.toMap
    assert(got == want)
    // zero vector projects to the origin under any signs
    assert(got(2L) == Seq(0L, 0L, 0L))
    // determinism: same seed -> same matrix; the generator never emits 0
    assert(makeSigns(3, 4).map(_.toSeq) == signs.map(_.toSeq))
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
  }

  test("kCenterGreedy: farthest-first order on a hand line, radius " +
      "progression non-increasing, k past n stops early") {
    import spark.implicits._
    // points on a line: 0, 1, 10, 4 — seed is the smallest id (vec 0),
    // then farthest-first picks 10 (d²=100), 4 (min(16,36)=16), 1 (d²=1)
    val vecs = Seq(
      (1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(10.0f)), (4L, Array(4.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.kCenterGreedy(vecs, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1, -1.0), (3L, 2, 100.0), (4L, 3, 16.0),
      (2L, 4, 1.0)))
    // the d2 sequence is the covering-radius progression: non-increasing
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    // k beyond the corpus stops at n rows
    assert(graft.operators.Similarity.kCenterGreedy(vecs, k = 10).count() == 4)
    // null vectors are not candidates (and cannot seed)
    val withNull = vecs.unionByName(
      Seq((0L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val got2 = graft.operators.Similarity.kCenterGreedy(withNull, k = 2)
      .collect().map(_.getLong(0))
    assert(got2.toSeq == Seq(1L, 3L))
  }

  test("randomProject: dimension mismatch fails fast, not null-padded") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.operators.Similarity.randomProject(df, outDims = 2, dim = 3).collect()
    }
    assert(e.getMessage.contains("vector dim != sign dim"))
  }

  test("prototypeScores: hand centroid geometry in one cell — exact d2, " +
      "rank ties, integer keep cut, farthest-first mode") {
    import spark.implicits._
    // nPlanes = 0 -> every vector lands in cell 0; centroid of the
    // round(x*1000) quantized points (1000,0),(-1000,0),(0,1000),
    // (0,-1000),(2000,0) is (400,0)
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, -1.0f)),
      (5L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .prototypeScores(df, nPlanes = 0, dim = 2, keepPct = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> ((0L, 360000.0, 1L, true)),   // (1000-400)^2
      3L -> ((0L, 1160000.0, 2L, true)),  // 400^2 + 1000^2; tie -> id
      4L -> ((0L, 1160000.0, 3L, false)),
      2L -> ((0L, 1960000.0, 4L, false)),
      5L -> ((0L, 2560000.0, 5L, false))))
    // keep count = ceil(40% of 5) = 2
    assert(got.values.count(_._4) == 2)
    // farthest-first inverts the ranking: hard examples first
    val far = graft.operators.Similarity
      .prototypeScores(df, nPlanes = 0, dim = 2, keepPct = 20,
        keepClosest = false)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(far == Map(5L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 1L -> 5L))
  }

  test("bitextMarginMine: hand 2-D geometry — exact fixed-point margins, " +
      "mutual-best flag, tie and zero-denominator handling") {
    import spark.implicits._
    // xs: x0=(1,0), x2=(0,1); ys: y1=(1,0), y3=(-1,0); k=1
    // cos: (x0,y1)=1, (x0,y3)=-1, (x2,y1)=0, (x2,y3)=0
    val xs = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ys = Seq((1L, Array(1.0f, 0.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.bitextMarginMine(xs, ys, k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // x0 -> y1: sums sx=sy=1e12, denom=1e12, margin=1.0 -> 1000000; y1's
    // best x is x0 -> mutual. x2 -> y1 (cos 0 ties break to smaller
    // y_id): denom = 0/2 + 1e12/2, margin 0; y1's best is x0 -> not
    // mutual.
    assert(got == Map(
      0L -> ((1L, 1000000000000L, 1000000L, true)),
      2L -> ((1L, 0L, 0L, false))))
    // null vectors carry no geometry: excluded from both sides, results
    // over the real vectors unchanged
    val withNull = xs.unionByName(
      Seq((9L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val got2 = graft.operators.Similarity.bitextMarginMine(withNull, ys, k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got2 == got)
    // the LSH path at nPlanes = 0 is ONE bucket = all pairs = exact brute
    val lsh0 = graft.operators.Similarity
      .bitextMarginMineLsh(xs, ys, k = 1, nPlanes = 0, dim = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(lsh0 == got)
  }

  test("kCenterGreedy: k above maxK fails fast before any scan is scheduled") {
    import spark.implicits._
    val vecs = Seq((1L, Array(0.0f)), (2L, Array(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.kCenterGreedy(vecs, k = 3, maxK = 2)
    }
    assert(e.getMessage.contains("exceeds maxK"))
    // at the bound it still runs
    assert(graft.operators.Similarity.kCenterGreedy(vecs, k = 2, maxK = 2).count() == 2)
  }

  test("kCenterGreedy: every per-round localCheckpoint pin is RELEASED — " +
      "the persistent-RDD registry returns to its pre-call size (a plain " +
      "Dataset.unpersist is a no-op on checkpointed frames)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Similarity.kCenterGreedy(corpus, k = 6).count() == 6)
    // the release is an explicit rdd-level unpersist, synchronous in the
    // registry (block deletion is async but the leak ADVICE flagged was
    // the registry reference itself surviving until driver GC). Compare
    // KEY SETS, not sizes: the async context cleaner may reclaim OTHER
    // tests' stale pins mid-call, so only "no NEW key survives" is stable.
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"kCenterGreedy left checkpointed RDDs registered after returning: $leaked")
  }

  test("bitextMarginMineLsh: multi-seed candidate union lifts brute-winner " +
      "agreement and degenerates exactly (nPlanes=0, any seeds = brute)") {
    import org.apache.spark.sql.functions.col
    val xs = corpus.filter(col("vec_id") % 2 === 0)
    val ys = corpus.filter(col("vec_id") % 2 === 1)
    val brute = Similarity.bitextMarginMine(xs, ys, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def agree(seeds: Seq[Long]): Int =
      Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = 4, dim = dim,
          seeds = seeds)
        .collect().count(r => brute.get(r.getLong(0)).contains(r.getLong(1)))
    val pool = Seq(0x5DEECE66DL, 0x9E3779B9L, 0x2545F491L)
    val one = agree(pool.take(1))
    val three = agree(pool)
    // a union of candidate sets can only ADD the true winner back; on this
    // random corpus (LSH worst case) the lift is strict
    assert(three > one, s"expected 3-seed agreement > 1-seed: $three vs $one")
    // nPlanes=0: every seed yields the single all-pairs bucket; the
    // multi-seed distinct must not perturb the exact result
    val lsh0 = Similarity.bitextMarginMineLsh(xs, ys, k = 4, nPlanes = 0,
        dim = dim, seeds = pool)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh0 == brute)
  }

  test("bitextMarginMineIvf: nprobe = nlist probes every cell = exact " +
      "brute; pruned probes keep a sane fraction of winners") {
    import org.apache.spark.sql.functions.col
    val xs = corpus.filter(col("vec_id") % 2 === 0)
    val ys = corpus.filter(col("vec_id") % 2 === 1)
    val brute = Similarity.bitextMarginMine(xs, ys, k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    // every cell probed -> the candidate set is ALL pairs -> exact equality
    // of the full relation, not just winners
    val full = Similarity.bitextMarginMineIvf(xs, ys, k = 4,
        nlist = 8, nprobe = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(full == brute)
    // pruning to 2 of 8 cells: one winner row per x survives, and on this
    // random corpus a nontrivial share still agrees with brute
    val pruned = Similarity.bitextMarginMineIvf(xs, ys, k = 4,
        nlist = 8, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pruned.keySet == brute.keySet)
    val agree = pruned.count { case (x, y) => brute(x)._1 == y }
    assert(agree > pruned.size / 4, s"agreement too low: $agree/${pruned.size}")
  }

  test("bitextMarginMinePq: every cell probed + uncut shortlist = exact " +
      "brute; ADC-pruned shortlist keeps the one-winner-per-x contract") {
    import org.apache.spark.sql.functions.col
    val xs = corpus.filter(col("vec_id") % 2 === 0)
    val ys = corpus.filter(col("vec_id") % 2 === 1)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    val brute = keyed(Similarity.bitextMarginMine(xs, ys, k = 4))
    // nprobe = nlist -> candidates are ALL pairs; cand >= |Y| -> the ADC
    // cut keeps them all: the full relation must equal brute exactly
    val full = keyed(Similarity.bitextMarginMinePq(xs, ys, k = 4,
      cand = 200, nlist = 8, nprobe = 8, m = 4, kCodes = 8, dim = dim))
    assert(full == brute)
    // real pruning: one winner per x on the brute x spine, sane agreement
    val pruned = Similarity.bitextMarginMinePq(xs, ys, k = 4,
        cand = 8, nlist = 8, nprobe = 2, m = 4, kCodes = 8, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pruned.keySet == brute.keySet)
    val agree = pruned.count { case (x, y) => brute(x)._1 == y }
    assert(agree > pruned.size / 4, s"agreement too low: $agree/${pruned.size}")
  }

  test("bitextMarginMineIvf codebookSource: explicit lowest-id seeds reproduce " +
      "the default; trained cells keep the one-winner-per-x contract") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val xs = corpus.filter(col("vec_id") % 2 === 0)
    val ys = corpus.filter(col("vec_id") % 2 === 1)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    val default = keyed(Similarity.bitextMarginMineIvf(xs, ys, k = 4,
      nlist = 8, nprobe = 2))
    // rounds = 0 kmeans = the same lowest-id seeds, passed explicitly:
    // the codebook path must reproduce the default relation exactly
    val seeds = Similarity.kmeansIterate(ys, k = 8, rounds = 0)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    val cbSeed = seeds.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("cid", "cv")
    val explicit = keyed(Similarity.bitextMarginMineIvf(xs, ys, k = 4,
      nlist = 8, nprobe = 2, codebookSource = Some(cbSeed)))
    assert(explicit == default)
    // trained cells: still exactly one winner per x, same x spine
    val trained = Similarity.kmeansIterate(ys, k = 8, rounds = 2)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    val cbTr = trained.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("cid", "cv")
    val got = keyed(Similarity.bitextMarginMineIvf(xs, ys, k = 4,
      nlist = 8, nprobe = 2, codebookSource = Some(cbTr)))
    assert(got.keySet == default.keySet)
  }

  test("pcaCovariance: hand-checked integer census on a 2-vector, 2-dim input") {
    import spark.implicits._
    // q = [1e6, 2e6] and [3e6, 4e6]; n=2
    // cov_num(0,0) = 2*(1e12+9e12) - (4e6)^2 = 4e12
    // cov_num(0,1) = 2*(2e12+12e12) - 4e6*6e6 = 4e12
    // cov_num(1,1) = 2*(4e12+16e12) - (6e6)^2 = 4e12
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaCovariance(df, dim = 2).collect()
      .map(r => ((r.getAs[Long]("j"), r.getAs[Long]("k")),
        r.getAs[java.math.BigDecimal]("cov_num").longValueExact())).toMap
    assert(got == Map((0L, 0L) -> 4000000000000L, (0L, 1L) -> 4000000000000L,
      (1L, 1L) -> 4000000000000L))
  }

  test("pcaCovariance: merge path (8 partitions) equals single-partition census") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(i =>
      (i.toLong, Seq.fill(6)((rnd.nextGaussian() * 1.5).toFloat))).toDF("vec_id", "embedding")
    def census(d: org.apache.spark.sql.DataFrame) =
      Similarity.pcaCovariance(d, dim = 6).collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          r.getAs[java.math.BigDecimal]("cov_num"))).toMap
    assert(census(df.coalesce(1)) == census(df.repartition(8)))
  }

  test("pcaFit: rank-1 data recovers the generating direction; components orthonormal") {
    import spark.implicits._
    val dir4 = Array(0.5, -0.5, 0.5, 0.5) // unit vector
    val pts = (1 to 50).map { i =>
      val t = i * 0.1
      (i.toLong, dir4.map(d => (d * t).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val run = Similarity.pcaFit(pts, dim = 4, k = 2)
    val c1 = run.components(0)
    // sign-canonical: the largest-|coordinate| is positive -> c1 = +-dir4
    // with the first max-|c| coordinate positive (0.5 at index 0)
    assert(math.abs(math.abs(c1.zip(dir4).map(p => p._1 * p._2).sum) - 1.0) < 1e-9)
    assert(c1(0) > 0)
    val c2 = run.components(1)
    assert(math.abs(c1.zip(c2).map(p => p._1 * p._2).sum) < 1e-9, "orthogonal")
    assert(math.abs(c1.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    // projection onto pc1 is proportional to t (monotone in i)
    val proj = Similarity.pcaProject(pts, run).orderBy("vec_id")
      .collect().map(_.getDouble(1))
    assert(proj.zip(proj.tail).forall { case (a, b) => a < b })
  }

  test("sq8Search: hand reconstruction exact; flat dims reconstruct to lo; ranks by (d2, id)") {
    import spark.implicits._
    // dim 1, corpus values {0, 1, 2}: lo=0 hi=2; codes 0, 128, 255
    val corpus = Seq((0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(2.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(0.9f))).toDF("vec_id", "embedding")
    val got = Similarity.sq8Search(q, corpus, topK = 3).collect()
      .map(r => (r.getAs[Long]("n_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("sq_d2")))
    // recon: 0.0, 0 + 128*2/255, 2.0 — each distance the exact double chain
    val qd = 0.9f.toDouble
    def d(rec: Double) = (qd - rec) * (qd - rec)
    val r1 = 0.0 + 128.0 * (2.0 - 0.0) / 255.0
    assert(got.toSeq == Seq((1L, 1L, d(r1)), (0L, 2L, d(0.0)),
      (2L, 3L, d(2.0))))
    // a flat dimension (hi = lo) codes 0 and reconstructs to lo exactly:
    // only dim 1 separates the corpus
    val flat = Seq((0L, Seq(0.0f, 5.0f)), (1L, Seq(2.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val q2 = Seq((10L, Seq(1.9f, 5.0f))).toDF("vec_id", "embedding")
    val g2 = Similarity.sq8Search(q2, flat, topK = 2).collect()
      .map(r => r.getAs[Long]("n_id") -> r.getAs[Double]("sq_d2")).toMap
    val qd2 = 1.9f.toDouble
    assert(g2(1L) == (qd2 - (0.0 + 255.0 * 2.0 / 255.0)) *
      (qd2 - (0.0 + 255.0 * 2.0 / 255.0)))
    assert(g2(0L) == qd2 * qd2)
  }

  test("ivfSq8Search: full probe equals the unpruned sq8 ranking; pruning only drops rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val q = corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("sq_d2"))).toSet
    // nprobe = nlist: every cell probed -> identical to the flat SQ8 scan
    val full = Similarity.ivfSq8Search(q, corpus, topK = 5,
      nlist = 4, nprobe = 4)
    assert(key(full) == key(Similarity.sq8Search(q, corpus, topK = 5)))
    // nprobe = 1 prunes to one cell: a subset of the candidates, same
    // reconstruction distances for survivors
    val pruned = Similarity.ivfSq8Search(q, corpus, topK = 5,
      nlist = 4, nprobe = 1).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("sq_d2")).toMap
    val flat = Similarity.sq8Search(q, corpus, topK = 40).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("sq_d2")).toMap
    assert(pruned.nonEmpty)
    pruned.foreach { case (k, d) => assert(flat(k) == d) }
  }

  test("rankBiasedOverlap: identical = 1 - 2^-D, swapped pair = 0.25, one-sided query = 0") {
    import spark.implicits._
    def rk(rows: (Long, Long, Long)*) = rows.toDF("q_id", "n_id", "rank")
    // identical depth-10 rankings: term_d = 2^-d, sum = 1023/1024
    val ident = rk((1 to 10).map(d => (0L, 100L + d, d.toLong)): _*)
    val r0 = Similarity.rankBiasedOverlap(ident, ident).collect().head
    assert(r0.getAs[Long]("n_common") == 10L)
    assert(r0.getAs[Double]("rbo") == 1023.0 / 1024.0)
    // swapped top-2 at depth 2: o_1 = 0, o_2 = 2 -> 2/(2*4) = 0.25
    val a = rk((0L, 1L, 1L), (0L, 2L, 2L))
    val b = rk((0L, 2L, 1L), (0L, 1L, 2L))
    val r1 = Similarity.rankBiasedOverlap(a, b, depth = 2).collect().head
    assert(r1.getAs[Double]("rbo") == 0.25)
    // disjoint rankings = 0; a query present on one side only scores 0
    val c = rk((0L, 9L, 1L), (1L, 5L, 1L))
    val got = Similarity.rankBiasedOverlap(a, c, depth = 2).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("rbo")))).toMap
    assert(got(0L) == ((0L, 0.0)) && got(1L) == ((0L, 0.0)))
  }

  test("rankEval: binary-relevance nDCG and MRR by hand; no-hit query scores 0") {
    import spark.implicits._
    // gains at depth 3: round(1e6/log2(i+1)) = 1000000, 630930, 500000
    val truth = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L)).toDF("q_id", "n_id", "rank")
    val approx = Seq((1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L),
      (2L, 98L, 1L), (2L, 97L, 2L)).toDF("q_id", "n_id", "rank")
    val got = Similarity.rankEval(truth, approx, depth = 3).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("dcg_micro"), r.getAs[Long]("idcg_micro"),
          r.getAs[Double]("ndcg"), r.getAs[Long]("rr_micro")))).toMap
    // q1: hits at approx ranks 1 (gain 1e6) and 3 (gain 5e5); idcg for
    // 3 relevant = 1e6 + 630930 + 5e5
    assert(got(1L) == ((3L, 2L, 1500000L, 2130930L,
      1500000.0 / 2130930.0, 1000000L)))
    // q2: zero hits -> everything 0 except idcg for its 1 relevant
    assert(got(2L) == ((1L, 0L, 0L, 1000000L, 0.0, 0L)))
    // perfect agreement: ndcg = 1, rr = 1e6
    val perfect = Similarity.rankEval(truth, truth, depth = 3).collect()
      .map(r => (r.getAs[Double]("ndcg"), r.getAs[Long]("rr_micro")))
    assert(perfect.forall(_ == ((1.0, 1000000L))))
  }
}
