package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: for every training document, how much of it
  * appears verbatim in an evaluation/benchmark corpus — the n-gram-overlap
  * check run before any serious pre-training mix ships (a contaminated doc
  * leaks test answers into the train set). Overlap unit = distinct word
  * n-gram shingles (the dedup shingle machinery reused).
  *
  * Scale shape: training docs explode to (doc, shingle) postings; the
  * benchmark's DISTINCT shingle set is built once (benchmarks are tiny next
  * to a 100 TB corpus — the planner broadcasts the set when it fits, keyed
  * join otherwise); one shingle-keyed join + one doc-keyed partial-agg
  * count. Nothing quadratic, no driver collection. */
object Decontaminate {

  /** Per-document overlap counts against `bench`: `n_shingles` distinct
    * shingles in the doc, `n_hit` of them present anywhere in the
    * benchmark. Documents with fewer than `n` tokens have no shingles and
    * are absent from the output (nothing to contaminate). Downstream
    * policy is one filter away (e.g. drop when n_hit/n_shingles > 0.1). */
  def overlap(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
    val bsh = bench
      .select(explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
      .distinct()
    sh.join(bsh.withColumn("__hit", lit(1)), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hit"))
  }

  /** [[overlap]] with a Bloom-filter pre-filter — the shape for when the
    * reference corpus is itself huge (decontaminating against a prior
    * 100 TB crawl, not a megabyte benchmark). Result is IDENTICAL to
    * [[overlap]]: the Bloom filter only PRE-SCREENS postings (false
    * positives are removed by the exact confirm join; false negatives are
    * impossible), so correctness never depends on the filter's tuning.
    *
    * Scale shape: the reference's distinct shingle hashes aggregate into
    * ONE fixed-size Bloom bitmap (Spark's own `BloomFilterAggregate`, the
    * engine's runtime-filter machinery) carried as a scalar subquery — the
    * executors get the bitmap once with the task binaries, never a
    * shingle set. The training-side postings then drop to ~fpp × volume
    * BEFORE the shingle-keyed confirm shuffle, which is the expensive
    * exchange the exact path pays in full. `n_shingles` comes from a
    * doc-keyed partial-count that never shuffles by shingle at all.
    *
    * `expectedItems`/`fpp` size the bitmap (8 bits/item at fpp=1% → a
    * 100M-shingle reference ≈ 120 MB, task-broadcast territory); both are
    * capped by Spark's `spark.sql.optimizer.runtime.bloomFilter.*` maxima
    * inside the aggregate itself. */
  def overlapBloom(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 3,
      expectedItems: Long = 4000000L,
      fpp: Double = 0.03,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftExpr
    import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")

    val bsh = bench
      .select(explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
      .distinct()
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloomDf = bsh.agg(GraftExpr.column(
      new BloomFilterAggregate(
        GraftExpr.catalystExpression(xxhash64(col("sh"))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("bf"))
    // The bitmap rides as a scalar subquery (the only non-foldable form
    // BloomFilterMightContain accepts): planned once, evaluated once,
    // result shipped to tasks as a literal — exactly how Spark's own
    // InjectRuntimeFilter carries its bloom.
    val mightHit = GraftExpr.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      GraftExpr.catalystExpression(xxhash64(col("sh")))))

    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))
    val nsh = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = sh.filter(mightHit)
      .join(bsh, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    nsh.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }
}
