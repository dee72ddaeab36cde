package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators a large-scale training pipeline needs around
  * the dedup/quality core: reproducible splits and mixture accounting. The
  * reference has no analog (its jobs are single-pass filter/transform
  * chains); these are the standard curation steps over the same tables.
  */
object Curation {

  /** Number of hash buckets the split thresholds quantize to. 10k buckets
    * give 0.01% split granularity — plenty for train/val/test. */
  val SplitBuckets = 10000

  /** Engine-portable per-row hash bucket in [0, SplitBuckets): the md5 of
    * the id's decimal string, first 15 hex chars, mod buckets — the same
    * portable-hash trick as [[graft.functions.Sketches.md5Hash60]], built
    * from Spark SQL primitives so it stays inside whole-stage codegen.
    * DuckDB: `('0x' || substr(md5(CAST(id AS VARCHAR)),1,15))::UBIGINT % n`. */
  def hashBucket(id: Column, buckets: Int = SplitBuckets): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** Deterministic train/val/test assignment: split label by cumulative
    * fraction thresholds over [[hashBucket]]. Unlike `randomSplit`, the
    * assignment is a PURE FUNCTION of the row id — reproducible across
    * reruns, engines, partitionings and scale (a rerun on 100 TB assigns
    * every row identically; adding data never reassigns existing rows), and
    * costs zero shuffles: it's a per-row codegen'd expression on the scan.
    *
    * @param splits (label, fraction) in order; fractions must sum to <= 1.
    *   Rows past the cumulative sum get the last label (i.e. the final
    *   fraction is effectively "the rest" when the sum is 1).
    */
  def withSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      outputCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val b = hashBucket(col(idCol))
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * SplitBuckets))
    val expr = splits.init.zip(thresholds.init).foldRight(
      lit(splits.last._1): Column) { case (((label, _), hi), acc) =>
      when(b < hi, lit(label)).otherwise(acc)
    }
    df.withColumn(outputCol, expr)
  }

  /** Leakage-safe TEMPORAL split with an embargo gap — the time-series
    * counterpart of [[withSplit]] (whose hash assignment is exactly what a
    * forecasting/recency-sensitive eval must NOT use: it interleaves
    * train and test in time). Rows are labeled by timestamp against a
    * fixed boundary: `test` at or after `testStartUs`, `train` strictly
    * before `testStartUs - embargoUs`, and `purged` in between — the
    * embargo band (Lopez de Prado's purged-split discipline) that keeps
    * windowed/lagged features computed near the boundary from straddling
    * it. Purged rows are KEPT AND LABELED rather than dropped: the
    * operator is row-preserving (null timestamps label null), and the
    * caller's `filter(col(outputCol) =!= "purged")` is one predicate away.
    *
    * Both comparisons are on exact epoch-microsecond integers — a pure
    * per-row codegen'd expression on the scan: zero shuffles, reproducible
    * on any engine/partitioning/scale, and new data never reassigns an
    * existing row (the boundary is a constant, not a quantile). */
  def purgedTimeSplit(
      df: DataFrame,
      tsCol: String,
      testStartUs: Long,
      embargoUs: Long,
      outputCol: String = "split"): DataFrame = {
    require(embargoUs >= 0, s"embargo must be >= 0: $embargoUs")
    val us = unix_micros(col(tsCol))
    df.withColumn(outputCol,
      when(us >= testStartUs, lit("test"))
        .when(us < testStartUs - embargoUs, lit("train"))
        .when(us.isNotNull, lit("purged")))
  }

  /** Salted variant of [[hashBucket]]: bucket of md5("<id>:<salt>"). Each
    * distinct salt draws an independent bucket assignment, so stacked
    * per-row decisions (split assignment, sampling, mixture weighting)
    * don't correlate — sampling 10% with the UNsalted bucket would take
    * the sample entirely out of the train split's low-bucket range.
    * DuckDB: `('0x' || substr(md5(CAST(id AS VARCHAR) || ':<salt>'), 1,
    * 15))::UBIGINT % n`. */
  def hashBucketSalted(id: Column, salt: String, buckets: Int = SplitBuckets): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 15), 16, 10)
      .cast("long"), lit(buckets))

  /** Deterministic Bernoulli sample: keep a row iff its salted hash bucket
    * lands below `fraction`. Unlike `df.sample`, membership is a PURE
    * FUNCTION of (id, salt): reruns, repartitions and engines agree row by
    * row, a grown corpus never flips an existing row's membership, and the
    * filter is a codegen'd per-row expression on the scan — zero shuffles
    * at any scale. Rows with a null id are dropped (no identity to hash). */
  def sampleFraction(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucketSalted(col(idCol), salt) < math.round(fraction * SplitBuckets))
  }

  /** Pairwise CORRELATION SUFFICIENT STATISTICS over numeric columns in
    * ONE scan: for every unordered column pair (a ≤ b), the exact integer
    * moments (n, Σa, Σb, Σab, Σa², Σb²) with values fixed-point scaled by
    * `fpDigits` decimals — Pearson r, covariance, and slope are each one
    * driver-side formula away, and because every stat is an
    * order-independent integer sum the output hash-gates where `corr()`'s
    * streaming float accumulation never could (the [[standardize]] /
    * `activityTrend` discipline). Rows with a null in EITHER column of a
    * pair are excluded from that pair (pairwise deletion, matching SQL
    * corr semantics). Sums ride DECIMAL(38,0): Σa² of 10⁹ rows of 10⁷-
    * scaled values is 10²³ — past 2⁶³, never past 38 digits.
    *
    * Scale shape: ONE scan emits the k(k+1)/2 pair statistics as a single
    * partial-aggregable agg — no shuffle carries data rows, the exchange
    * is k² stat rows. The feature-selection readout (which quality
    * signals co-move / predict a label) at any corpus size. */
  def corrStats(
      df: DataFrame,
      cols: Seq[String],
      fpDigits: Int = 2,
      boundedProducts: Boolean = false): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns: ${cols.size}")
    require(fpDigits >= 0 && fpDigits <= 9, s"fpDigits out of [0,9]: $fpDigits")
    val scale = math.pow(10, fpDigits)
    val pairs = for {
      (a, i) <- cols.zipWithIndex
      b <- cols.drop(i)
    } yield (a, b)
    // scale each column ONCE in a pre-projection (null-propagating), so
    // the 6·k(k+1)/2 aggregates below do cheap null masks + integer
    // products instead of re-rounding per pair (10 pairs re-rounding cost
    // 3.5 s at sf0.1; this shape costs the 4 rounds per row once)
    val scaled = df.select(cols.map(c =>
      round(col(c).cast("double") * lit(scale)).cast("long").as(s"__v_$c")): _*)
    val stats = pairs.zipWithIndex.flatMap { case ((a, b), x) =>
      val va = col(s"__v_$a"); val vb = col(s"__v_$b")
      val dec = "decimal(38,0)"
      // DEFAULT: cast BEFORE multiplying — a long product of 10^10-scaled
      // values overflows 2^63 where the decimal product has 38-digit
      // headroom (ANSI mode would raise; non-ANSI would silently wrap).
      // `boundedProducts = true` is the caller-asserted FAST PATH for
      // columns whose scaled |values| stay <= ~3·10^9 (so every product
      // fits int64): the per-row multiplies then ride long codegen and
      // only the SUM accumulates in decimal — Spark's Decimal multiply
      // always routes through java BigDecimal, and 6 decimal products per
      // row per pair were the whole q_corr_stats cost (measured r18:
      // 2.8 s -> 0.4 s at sf0.1, identical sums — the per-row integers
      // are mathematically the same, decimal(38,0) accumulation exact
      // either way). The bound is a per-VALUE property (price ranges,
      // quantities), not a row-count property, so the contract holds
      // unchanged at 100 TB.
      val (av, bv, prod: ((Column, Column) => Column)) =
        if (boundedProducts)
          (when(vb.isNotNull, va), when(va.isNotNull, vb),
            (x: Column, y: Column) => (x * y).cast(dec))
        else
          (when(vb.isNotNull, va).cast(dec), when(va.isNotNull, vb).cast(dec),
            (x: Column, y: Column) => x * y)
      // aliases keyed by PAIR INDEX, not joined column names — names
      // containing underscores could alias-collide
      Seq(
        count(av).as(s"__n_$x"),
        sum(av.cast(dec)).as(s"__sa_$x"), sum(bv.cast(dec)).as(s"__sb_$x"),
        sum(prod(av, bv)).as(s"__sab_$x"),
        sum(prod(av, av)).as(s"__saa_$x"), sum(prod(bv, bv)).as(s"__sbb_$x"))
    }
    val one = scaled.agg(stats.head, stats.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), x) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$x").as("n"),
        col(s"__sa_$x").cast("decimal(38,0)").as("sum_a"),
        col(s"__sb_$x").cast("decimal(38,0)").as("sum_b"),
        col(s"__sab_$x").cast("decimal(38,0)").as("sum_ab"),
        col(s"__saa_$x").cast("decimal(38,0)").as("sum_a2"),
        col(s"__sbb_$x").cast("decimal(38,0)").as("sum_b2"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** ln quantized to the 2⁻²⁰ grid, as an exact integer: `floor(ln(x) ·
    * 2²⁰ + 1/2)`. The two engines' ln differ by 1–2 ulp on ~2% of inputs
    * (Spark evaluates StrictMath/fdlibm, the oracle its libm), so RAW ln
    * doubles cannot sit under the hash gate; quantizing to ~1e-6 relative
    * granularity makes a cross-engine flip need an input within 2 ulp of
    * a grid boundary (~4e-9 probability per value) while losing nothing a
    * scaling-law diagnostic can feel. The multiply by 2²⁰ is exact, the
    * +0.5 and floor deterministic — downstream arithmetic is all integer.
    */
  private def qln(x: Column): Column =
    floor(log(x.cast("double")) * lit(1048576.0) + lit(0.5)).cast("long")

  /** Shared OLS readout over quantized-ln points: ONE partial-aggregable
    * scan to exact DECIMAL(38,0) moment sums (engine-portable — the
    * oracle accumulates the same integers), slope/intercept derived in a
    * FIXED double op order from the exact components (each decimal→double
    * cast and each of the 7 float ops is correctly rounded, so the
    * doubles hash bit-exact). */
  private def qlnRegress(pts: DataFrame): DataFrame = {
    val d18 = "decimal(18,0)"
    val agg = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d18)).cast("decimal(38,0)").as("sx"),
      sum(col("y").cast(d18)).cast("decimal(38,0)").as("sy"),
      sum(col("x").cast(d18) * col("y").cast(d18)).cast("decimal(38,0)").as("sxy"),
      sum(col("x").cast(d18) * col("x").cast(d18)).cast("decimal(38,0)").as("sxx"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    agg
      .withColumn("slope",
        (nd * col("sxy").cast("double") - sxd * col("sy").cast("double")) /
          (nd * col("sxx").cast("double") - sxd * sxd))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * sxd) / nd)
  }

  /** Zipf rank-frequency fit over the shingle vocabulary: ln-ln OLS of
    * (rank, frequency) — slope ≈ −1 on natural text; a corpus whose
    * exponent drifts (synthetic padding flattens it, template spam
    * steepens it) fails the curation expectation. Frequencies are one
    * occurrence-counting agg; the GLOBAL rank over (freq desc, shingle
    * asc) comes from the two-phase prefix count ([[graft.ops
    * .RunningCount]]) — no single-partition window anywhere, so the
    * ranking holds on a 1000-executor vocabulary. Points are quantized
    * ([[qln]]) into the exact-integer OLS ([[qlnRegress]]); one row out:
    * n, the four decimal moment sums, slope, intercept. The slope is
    * unit-free (the 2²⁰ scale cancels); the intercept is in qln units —
    * divide by 2²⁰ for ln K. */
  def zipfFit(
      docs: DataFrame,
      ngram: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val freq = docs.repartition(parts)
      .select(explode(TextFunctions.shinglesNative(col(textCol), ngram)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("freq"))
    val ranked = graft.ops.RunningCount.withRunningCount(freq,
      Seq(col("freq").desc, col("sh")), "rank")
    qlnRegress(ranked.select(qln(col("rank")).as("x"), qln(col("freq")).as("y")))
  }

  /** Heaps vocabulary-growth fit: ln-ln OLS of (cumulative SHINGLE
    * OCCURRENCES seen, cumulative distinct shingle vocabulary) sampled at
    * every document in id order — N here counts `ngram`-shingle
    * occurrences (≈ len−ngram+1 per doc), NOT raw tokens; β is invariant
    * to that linear reparameterization but K is in shingle units.
    * V(N) ≈ K·N^β, β ≈ 0.7 on natural text; a plateauing β says
    * the corpus has stopped contributing new vocabulary (the dedup /
    * diversity signal at ingest time). The census is two aggs (per-doc
    * occurrence counts; min-doc-id per distinct shingle → new-vocab
    * counts) + ONE shared two-phase prefix pass computing both running
    * sums — nothing document-sized shuffles twice, no driver loop, no
    * single-partition window. Same quantized exact-integer OLS readout
    * as [[zipfFit]]. */
  def heapsFit(
      docs: DataFrame,
      ngram: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toks = docs.repartition(parts).select(col(idCol).as("id"),
      TextFunctions.shinglesNative(col(textCol), ngram).as("shs"))
    val perDoc = toks.select(col("id"),
      coalesce(size(col("shs")), lit(0)).cast("long").as("n_sh"))
    val newPerDoc = toks.select(col("id"), explode(col("shs")).as("sh"))
      .groupBy("sh").agg(min(col("id")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_new"))
    val joined = perDoc.join(newPerDoc, Seq("id"), "left")
      .select(col("id"), col("n_sh"), coalesce(col("n_new"), lit(0L)).as("n_new"))
    val cum = graft.ops.RunningCount.withRunningAggs(joined,
      Seq((col("n_sh"), graft.ops.RunningCount.Kind.Sum, "cum_tokens"),
        (col("n_new"), graft.ops.RunningCount.Kind.Sum, "cum_vocab")),
      Seq(col("id")))
    qlnRegress(cum.filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
      .select(qln(col("cum_tokens")).as("x"), qln(col("cum_vocab")).as("y")))
  }

  /** Gini concentration of the shingle-frequency mass — "how much of the
    * corpus is a few templates": 0 = every shingle equally frequent, →1 =
    * all mass in a handful (boilerplate/spam domination). The companion
    * readout to [[zipfFit]] that needs NO logs at all: with frequencies
    * ranked ascending, Gini = (2·Σ(i·xᵢ) − (n+1)·Σxᵢ) / (n·Σxᵢ) — Σ(i·xᵢ)
    * is invariant under tie order (equal values contribute equally at
    * swapped ranks), so the two-phase prefix rank's arbitrary-but-
    * consistent tie handling cannot move the result. All moments exact
    * DECIMAL(38,0); the Gini itself is a fixed-order double readout, so
    * the whole row hash-matches the oracle. One row: n, sum_x, sum_ix,
    * gini. */
  def giniIndex(
      docs: DataFrame,
      ngram: Int = 3,
      textCol: String = "text"): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val freq = docs.repartition(parts)
      .select(explode(TextFunctions.shinglesNative(col(textCol), ngram)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("x"))
    val ranked = graft.ops.RunningCount.withRunningCount(freq,
      Seq(col("x"), col("sh")), "i")
    val d18 = "decimal(18,0)"
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d18)).cast("decimal(38,0)").as("sum_x"),
      sum(col("i").cast(d18) * col("x").cast(d18)).cast("decimal(38,0)").as("sum_ix"))
    val nd = col("n").cast("double")
    agg.withColumn("gini",
      (lit(2.0) * col("sum_ix").cast("double") -
        (nd + lit(1.0)) * col("sum_x").cast("double")) /
        (nd * col("sum_x").cast("double")))
  }

  /** Temperature-based mixture REBALANCING (the multilingual/multi-domain
    * p_d ∝ n_d^(1/T) resampling of Conneau–Lample / mT5): target domain
    * shares follow n^(1/T) — T=1 keeps natural proportions, T→∞
    * equalizes domains — and each domain gets keep rate
    * min(1, budget·share_d / n_d), applied as the usual salted-bucket
    * per-row decision. Unlike [[mixtureSample]] the rates are DERIVED
    * IN-PLAN from the measured domain counts, so the operator self-tunes
    * as the corpus grows.
    *
    * Determinism: the T-mass Σ n^(1/T) folds over the GROUP-SORTED count
    * list (fixed order, each term one correctly-rounded step; T=2 uses
    * sqrt, which is exactly rounded everywhere); the rate quantizes to
    * round(rate·10⁴) and the keep compare is integer — the
    * [[sampleFraction]] purity contract with a data-dependent threshold.
    * Rows with null domains drop (no share to draw from).
    *
    * Scale shape: ONE domains-sized count agg; the (domain, threshold)
    * table re-enters via broadcast; the keep decision is a codegen'd scan
    * predicate — no data-sized shuffle anywhere. */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      budget: Long,
      temperature: Double = 2.0,
      idCol: String = "doc_id",
      salt: String = "temp"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(temperature >= 1.0, s"temperature must be >= 1: $temperature")
    def tmass(c: Column): Column =
      if (temperature == 2.0) sqrt(c.cast("double"))
      else pow(c.cast("double"), lit(1.0 / temperature))
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val mass = counts
      .agg(sort_array(collect_list(struct(col(groupCol).as("g"),
        col("__n").as("n")))).as("__arr"))
      .select(aggregate(col("__arr"), lit(0.0),
        (acc, s) => acc + tmass(s.getField("n"))).as("__mass"))
    // A positive budget floors every domain's threshold at 1 bucket: a
    // tiny domain whose derived rate rounds below 0.5/SplitBuckets would
    // otherwise drop ENTIRELY — the exact small-domain starvation the
    // n^(1/T) rebalancing exists to prevent. budget = 0 keeps nothing.
    val rawThr = round(least(lit(1.0),
      (lit(budget.toDouble) * (tmass(col("__n")) / col("__mass"))) /
        col("__n").cast("double")) * lit(SplitBuckets))
      .cast("long")
    val thresholds = counts.crossJoin(broadcast(mass))
      .select(col(groupCol),
        (if (budget == 0L) rawThr else greatest(lit(1L), rawThr)).as("__thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .where(hashBucketSalted(col(idCol), salt) < col("__thr"))
      .drop("__thr")
  }

  /** Mixture weighting: per-group keep rates — THE down/up-weighting step a
    * training-data mixture applies per source ("keep 10% of crawl, all of
    * reference text"). `rates` maps group values to keep fractions; groups
    * not listed (and null groups) keep `defaultRate`. Same purity and
    * zero-shuffle shape as [[sampleFraction]]: the rate lookup is a
    * codegen'd CASE chain, the keep decision a salted-bucket compare, so
    * the mixture is reproducible at 100 TB and composes with [[withSplit]]
    * (different salts decorrelate). Upsampling (>1) is out of scope here —
    * that's a generator (explode by replication count), not a filter. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double = 1.0,
      salt: String = "mixture"): DataFrame = {
    require(rates.nonEmpty, "need at least one (group, rate)")
    (rates.map(_._2) :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"keep rate out of [0,1]: $r"))
    val threshold = rates.foldRight(lit(math.round(defaultRate * SplitBuckets)): Column) {
      case ((group, rate), acc) =>
        when(col(groupCol) === group, lit(math.round(rate * SplitBuckets))).otherwise(acc)
    }
    df.filter(hashBucketSalted(col(idCol), salt) < threshold)
  }

  /** Corpus-relative token rarity signals, all exact integers (so the
    * cross-engine oracle hash-matches — a float logprob sum would be
    * addition-order-dependent): per document, the count of its token
    * occurrences plus the sum and min of their CORPUS-WIDE occurrence
    * frequencies. Low `sum_tf/n_tok` = rare vocabulary (OCR noise,
    * gibberish, code); high = boilerplate. Shape at scale: one exploded
    * token agg (partial-combined, vocab-sized result), then a token-keyed
    * join back — stopword tokens are hot probe-side keys, which is a JOIN
    * (AQE skew-split applies), not a per-key window — and one doc-keyed
    * agg. Text itself never shuffles, only (id, token) pairs. */
  def tokenRarity(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
    val freq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
    toks.join(freq, Seq("__tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("__tf")).cast("long").as("sum_tf"),
        min(col("__tf")).as("min_tf"))
  }

  /** Corpus-relative BIGRAM rarity — the transition-level companion of
    * [[tokenRarity]], and the division-free form of an MLE bigram language
    * model score: per document, `n_bg` bigram occurrences, the sum and min
    * of their corpus-wide bigram frequencies (`sum_bg`, `min_bg` — the
    * numerators of Π c(w₁w₂)/c(w₁)), and the sum of the corpus unigram
    * frequency of each bigram's FIRST token (`sum_prefix` — the
    * denominators). A float logprob would be addition-order-dependent
    * across engines; these exact integers hash-match, and the caller can
    * form `ln(sum_bg) - ln(sum_prefix)`-style scores or flag documents
    * whose `min_bg` is 1 (a transition seen nowhere else in the corpus —
    * the bigram-level gibberish signal). Documents with fewer than two
    * tokens have no transitions and are absent from the output.
    *
    * Shape at scale: bigrams come from a scan-local array zip (no shuffle
    * — [[graft.functions.TextFunctions.shingles]] with n=2); occurrences
    * collapse to per-(doc, bigram) COUNTS before anything joins (map-side
    * partial combine, so the shuffles carry distinct pairs, never the
    * occurrence stream — a boilerplate bigram repeated 10⁶× in one page
    * moves as one row). Both corpus frequencies land on the vocab-sized
    * distinct-bigram table first (the unigram join probes distinct
    * bigrams, not occurrences), leaving ONE postings-keyed join back and
    * one doc-keyed agg, counts weighted by multiplicity. Text never
    * shuffles; only (id, bigram, k) rows do. */
  def bigramRarity(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__tok"))
    val uniFreq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c1"))
    val docBg = df.select(col(idCol),
      explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
      .groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__k"))
    val bgFreq = docBg.groupBy(col("__bg")).agg(sum(col("__k")).cast("long").as("__c2"))
    // first token of the bigram = the conditional's context w₁; tokens are
    // \s+-split so the single joining space is unambiguous
    val enriched = bgFreq.withColumn("__w1", substring_index(col("__bg"), " ", 1))
      .join(uniFreq, col("__w1") === col("__tok"))
      .select(col("__bg"), col("__c2"), col("__c1"))
    docBg.join(enriched, Seq("__bg"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).cast("long").as("n_bg"),
        sum(col("__k") * col("__c2")).cast("long").as("sum_bg"),
        min(col("__c2")).as("min_bg"),
        sum(col("__k") * col("__c1")).cast("long").as("sum_prefix"))
  }

  /** Ingest-time twin of [[bigramRarity]] (precedent:
    * [[graft.operators.Dedup.dropExistingIn]] /
    * `semanticDedupAgainstCorpus`): score NEW documents' transitions
    * against a STATIC reference corpus's frequencies — the corpus is
    * aggregated to its vocab-sized (bigram, c2, c1) table once and its
    * text never moves again. Transitions the corpus has never seen score
    * frequency 0, so `n_bg - n_hit` is the per-document count of novel
    * transitions (the OOD/gibberish signal at ingest) and the sums stay
    * exact integers like the batch form. Shape at scale: the new batch
    * collapses to per-(doc, bigram) counts scan-side, then ONE left join
    * against the corpus stats (broadcast when they fit) + one doc-keyed
    * agg. For a STREAMING `newDocs`, pass `collapseOccurrences = false`:
    * the pre-collapse is a second stateful aggregation (chained streaming
    * aggs are mode-restricted), and with it off the plan is a stateless
    * generator + stream-static left join + exactly ONE stateful doc-keyed
    * agg (update mode; state = docs-in-flight) — the per-micro-batch
    * occurrence volume the collapse would save is small by construction
    * (StreamingSpec pins batch parity). */
  def bigramRarityAgainstCorpus(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      collapseOccurrences: Boolean = true): DataFrame = {
    import graft.functions.TextFunctions
    val uniFreq = corpus
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c1"))
    val bgFreq = corpus
      .select(explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
      .groupBy(col("__bg")).agg(count(lit(1)).as("__c2"))
    // a bigram in the corpus implies its first token is in the corpus
    // vocabulary, so this join is inner without loss
    val enriched = bgFreq.withColumn("__w1", substring_index(col("__bg"), " ", 1))
      .join(uniFreq, col("__w1") === col("__tok"))
      .select(col("__bg"), col("__c2"), col("__c1"))
    val occurrences = newDocs.select(col(idCol),
      explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
    val docBg =
      if (collapseOccurrences)
        occurrences.groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__k"))
      else occurrences.withColumn("__k", lit(1L))
    docBg.join(enriched, Seq("__bg"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__k")).cast("long").as("n_bg"),
        sum(when(col("__c2").isNotNull, col("__k")).otherwise(lit(0L)))
          .cast("long").as("n_hit"),
        sum(col("__k") * coalesce(col("__c2"), lit(0L))).cast("long").as("sum_bg"),
        sum(col("__k") * coalesce(col("__c1"), lit(0L))).cast("long").as("sum_prefix"))
  }

  /** Count-Min sketch over a key column — the mergeable FREQUENCY sketch
    * next to the family's theta (set intersection) and HLL (distinct
    * count) members: `depth` independent md5-derived hash rows × `width`
    * integer counters, built in ONE keyed partial agg (the sketch is
    * additive, so map-side combine IS the merge — partition count can
    * never change a counter). Returns the (row, bucket, n) counter table,
    * d·w rows, broadcast-sized by construction.
    *
    * Unlike probabilistic-estimate sketches, every counter is an exact
    * integer and the hash is the engine-portable md5 bucket
    * ([[graft.operators.Classifier]]'s discipline, salted per row), so
    * the WHOLE sketch hash-gates against a SQL replay — and the classic
    * CM guarantee (estimate = min over rows ≥ true count) is assertable
    * exactly. */
  def countMinSketch(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    require(width >= 1, s"width must be >= 1: $width")
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    // additivity again: collapse to the (key, count) table FIRST (one
    // keyed partial agg pays the stream volume — the distinct-word
    // discipline), then hash only DISTINCT keys ×depth. The naive
    // hash-every-occurrence form measured 21 s at sf1 (160M md5 calls);
    // this is the same counters from a vocab-sized explode.
    df.select(col(keyCol).cast("string").as("__k")).where(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).cast("long").as("__c"))
      .select(col("__k"), col("__c"), rows)
      .select(col("__c"), pmod(conv(substring(
          md5(concat(col("row").cast("string"), lit(":"), col("__k"))),
          1, 15), 16, 10).cast("long"), lit(width.toLong)).as("bucket"),
        col("row"))
      .groupBy("row", "bucket").agg(sum(col("__c")).cast("long").as("n"))
  }

  /** Point estimates from a [[countMinSketch]] for the keys of `probes`:
    * est = min over the sketch's depth rows of the counter each hash row
    * sends the key to — the broadcast-sized sketch joins the probe set,
    * never the corpus. An ABSENT sketch row is a zero counter (LEFT join
    * + coalesce — an inner join would silently drop the empty bucket and
    * overestimate a never-seen key, or lose it entirely). CM guarantees
    * est ≥ the true count (equality when no collision), which the gate
    * asserts alongside the exact values. */
  def countMinEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("row")
    probes.select(col(keyCol), col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .select(col(keyCol), col("__k"), rows)
      .select(col(keyCol), col("row"), pmod(conv(substring(
          md5(concat(col("row").cast("string"), lit(":"), col("__k"))),
          1, 15), 16, 10).cast("long"), lit(width.toLong)).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).cast("long").as("cm_est"))
  }

  /** Exact WEIGHTED quantiles — the "value cutoff covering p of the total
    * MASS" primitive ([[exactQuantilesDistributed]]'s sibling where each
    * row counts `weightCol` times): e.g. the document-length cutoff below
    * which 90% of the corpus's TOKENS live, the per-domain size cap
    * covering 99% of bytes. Left-continuous inverted CDF: the smallest
    * value whose cumulative weight reaches max(1, ceil(p·totalWeight)) —
    * integer thresholds against integer cumulative sums, so the answer is
    * engine-exact (the only float op is the one IEEE multiply p·total,
    * identical everywhere).
    *
    * Scale shape: the row volume collapses to the (value, Σweight)
    * histogram in one keyed partial agg; the prefix sum runs over
    * HISTOGRAM rows (two-phase distributed when ungrouped, per-group
    * window otherwise) — the exactQuantilesDistributed discipline. */
  def weightedQuantiles(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      probs: Seq[Double],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(probs.nonEmpty, "need at least one prob")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs out of [0,1]: $probs")
    // a negative weight would make the prefix CDF non-monotonic and the
    // thresholds meaningless — fail the ROW loudly, in-plan (the check
    // rides the weight expression itself, so pruning can't drop it)
    val w0 = col(weightCol).cast("long")
    val wSafe = when(w0 < 0, raise_error(concat(
        lit("weightedQuantiles: negative weight "), w0.cast("string")))
      .cast("long")).otherwise(w0)
    val hist = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(sum(wSafe).as("__w"))
    val cum =
      if (groupCols.isEmpty)
        graft.ops.RunningCount.withRunningAgg(
          hist, col("__w"), graft.ops.RunningCount.Kind.Sum,
          Seq(col("__v")), "__cum")
          .crossJoin(broadcast(
            hist.agg(sum(col("__w")).cast("long").as("__n"))))
      else {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
        val wAll = Window.partitionBy(groupCols.map(col): _*)
        hist
          .withColumn("__cum", sum(col("__w")).over(wOrd))
          .withColumn("__n", sum(col("__w")).over(wAll))
      }
    val thr = greatest(lit(1L),
      ceil(col("__p") * col("__n").cast("double")).cast("long"))
    cum.withColumn("__p", explode(array(probs.map(lit): _*)))
      .filter(col("__cum") - col("__w") < thr && thr <= col("__cum"))
      .groupBy(groupCols.map(col) :+ col("__p").as("prob"): _*)
      .agg(min(col("__v")).as("value"))
  }

  /** Kneser–Ney bigram-LM sufficient statistics — the smoothed sibling of
    * [[bigramRarity]]'s MLE counts, in the [[corrStats]] discipline: emit
    * the EXACT INTEGER moments and leave the one division to the
    * consumer, so the model table hash-gates where any in-engine float
    * smoothing could not. Per bigram (w1, w2), interpolated KN needs
    * exactly: c2 = c(w1 w2), cpre = Σ_w c(w1 w) (the conditional's
    * denominator), n1fwd = N₁₊(w1 •) (distinct continuations — the
    * back-off weight's numerator), n1back = N₁₊(• w2) (distinct
    * predecessors — the continuation probability's numerator), and
    * n_types = N₁₊(• •); then for any discount D,
    * P_KN(w2|w1) = max(c2−D,0)/cpre + D·n1fwd/cpre · n1back/n_types.
    *
    * Scale shape: ONE bigram-keyed partial agg over the corpus (the
    * occurrence volume is paid exactly once); everything after runs on
    * the MODEL table — two keyed aggs over bigram types, a one-row type
    * count broadcast back, deterministic (c2 desc, w1, w2) top-K for the
    * bounded readout.
    *
    * Cache lifetime: the bigram census behind the model is lazily
    * persisted MEMORY_AND_DISK (one corpus scan shared by its four
    * consumers — [[knModel]]) under a SCOPED lifetime
    * ([[graft.ops.Pins.scopedPersist]]): the next call releases the
    * previous census, so a long-lived session holds at most one. */
  def kneserNeyStats(
      df: DataFrame,
      topK: Int = 200,
      textCol: String = "text"): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    knModel(df, textCol)
      .orderBy(col("c2").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select("w1", "w2", "c2", "cpre", "n1fwd", "n1back", "n_types")
  }

  /** The FULL KN bigram model table [[kneserNeyStats]] reads its top-K
    * from: one bigram-keyed partial agg over the corpus, then
    * model-table-sized joins — every column an exact integer.
    *
    * The census is persisted LAZILY (MEMORY_AND_DISK) so its four
    * consumers (cpre/n1fwd, n1back, the type count, the probability
    * readout) share ONE corpus scan + shuffle — unpinned, the plan
    * re-derived it per consumer (16 parquet scans measured on
    * q_perplexity_filter at sf0.1; ReuseExchange recovered only 4).
    * Cache lifetime is SCOPED via [[graft.ops.Pins.scopedPersist]]: the
    * next knModel call releases this census's blocks, so a long-lived
    * session holds at most one cached bigram census (a superseded census
    * still referenced by an old result recomputes from lineage). */
  private def knModel(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val c = graft.ops.Pins.scopedPersist("curation.knModel", df
      .select(explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
      .select(substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("c2")))
    val pre = c.groupBy("w1").agg(sum(col("c2")).cast("long").as("cpre"),
      count(lit(1)).cast("long").as("n1fwd"))
    val back = c.groupBy("w2").agg(count(lit(1)).cast("long").as("n1back"))
    val types = c.agg(count(lit(1)).cast("long").as("n_types"))
    c.join(pre, Seq("w1")).join(back, Seq("w2"))
      .crossJoin(broadcast(types))
  }

  /** Per-document Kneser–Ney bigram LOG-PROBABILITY under a model trained
    * on `reference` — the CCNet-style perplexity quality signal
    * ([[kneserNeyStats]]'s apply step): a page whose token transitions
    * look nothing like the reference corpus (boilerplate, gibberish,
    * wrong language) scores far below the corpus norm. Returns
    * `(id, n_bigrams, sum_lp_q)` for EVERY input document, where
    * `sum_lp_q` is the exact integer sum over the document's bigram
    * occurrences of `round(ln(P_KN(w2|w1)) · 10⁶)` — per-bigram-TYPE
    * fixed-point quantization (the unigram-LM gate's `ln`-rounding
    * discipline), so the per-document readout is pure integer arithmetic
    * and hash-gates across engines. Documents with < 2 tokens score
    * (0, 0) — no evidence either way; thresholding is the caller's
    * policy ([[perplexityFilter]]).
    *
    * `P_KN(w2|w1) = max(c2−D,0)/cpre + (D·n1fwd/cpre)·(n1back/n_types)`,
    * interpolated KN with a single discount `D` (pass an exactly-
    * representable double — 0.75, 0.5 — so a SQL replica can state it
    * literally). Bigrams ABSENT from the reference fall back to the
    * uniform continuation `ln(1/n_types)` (KN's zero-count numerator
    * would otherwise send the log to −∞ on any out-of-reference pair);
    * same-corpus scoring (reference = docs) never takes the fallback. A
    * reference with NO bigrams has no model — every document scores
    * (n_bigrams, 0) with nothing to compare against, so this fails fast
    * instead.
    *
    * Scale shape: the reference collapses to the bigram-TYPE model in
    * one keyed partial agg; scoring is one (id, w1, w2)-keyed partial
    * agg over the corpus (occurrence volume paid once, map-side
    * combined) + one join against the model on (w1, w2) — broadcast
    * when the model fits, shuffle-on-key otherwise, either way bigram
    * TYPES not occurrences cross the wire — + one id-keyed integer
    * rollup. Zero driver traffic beyond the 1-row fallback scalar.
    *
    * Cache lifetime: the reference's bigram census is lazily persisted
    * MEMORY_AND_DISK inside the model ([[knModel]]) under a SCOPED
    * lifetime ([[graft.ops.Pins.scopedPersist]] — the next call releases
    * it); score many corpora against ONE reference by reusing one
    * returned model-scored frame per call, not by re-invoking in a tight
    * driver loop (each re-invocation un-caches the prior model's census,
    * so interleaved use of old frames recomputes). */
  def perplexityScore(
      docs: DataFrame,
      reference: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1): $discount")
    val model = knModel(reference, textCol)
    // ONE ln per bigram TYPE, every double op in a fixed order both
    // engines replay: greatest/÷/·/+ on exact-integer-valued doubles
    val prob =
      greatest(col("c2").cast("double") - lit(discount), lit(0.0)) /
        col("cpre").cast("double") +
      ((lit(discount) * col("n1fwd").cast("double")) / col("cpre").cast("double")) *
        (col("n1back").cast("double") / col("n_types").cast("double"))
    val lp = model.select(col("w1"), col("w2"),
      round(log(prob) * lit(1000000.0)).cast("long").as("__lp_q"))
    // always exactly ONE row (ungrouped agg): __nt is null on a
    // bigram-less reference, and the fallback expression below raises
    // IN-PLAN if such a "model" is ever consulted — lazy fail-fast, no
    // construction-time job
    val fallback = model.agg(max(col("n_types")).as("__nt"))
    val lpUnseen = when(col("__nt").isNull,
        raise_error(lit("perplexityScore: reference corpus has no bigrams — " +
          "no model to score under")).cast("long"))
      .otherwise(round(log(lit(1.0) / col("__nt").cast("double")) *
        lit(1000000.0)).cast("long"))
    val occ = docs
      .select(col(idCol), explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
      .select(col(idCol), substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("__cnt"))
    val scored = occ.join(lp, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(fallback))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_bigrams"),
        sum(col("__cnt") * coalesce(col("__lp_q"), lpUnseen))
          .cast("long").as("sum_lp_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_lp_q"), lit(0L)).as("sum_lp_q"))
  }

  /** Benford first-significant-digit audit of a numeric column — the
    * classic fabricated/corrupted-numbers screen for ingested tabular
    * data (naturally-occurring multiplicative quantities follow
    * P(d) = log₁₀(1+1/d); uniform or hand-typed values don't). Returns
    * one row per observed leading digit: `(digit, n, share_micro,
    * exp_micro)` — the exact count, the observed share in micros
    * (round(n·10⁶/total), one deterministic division), and Benford's
    * expected share in micros (a plan literal: both engines state
    * round(log₁₀(1+1/d)·10⁶) identically). Zero/null values carry no
    * leading digit and are excluded. The first digit is extracted from
    * the value's DECIMAL STRING rendering — exact, where
    * `floor(v/10^floor(log10 v))` misrounds at powers of ten.
    *
    * Scale shape: ONE scan to a ≤9-row hash agg (map-side combined); the
    * total is a window over those ≤9 rows — no second pass, no driver
    * traffic. Thresholding (χ², max deviation) is the caller's 9-row
    * concern. */
  def benfordProfile(
      df: DataFrame,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fd = regexp_extract(col(valueCol).cast("string"), "[1-9]", 0)
    val expMicro = (1 to 9).map(d =>
      d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000.0)).toMap
    val expCol = (1 to 9).foldLeft(lit(null).cast("long")) { (acc, d) =>
      when(col("digit") === d, lit(expMicro(d))).otherwise(acc)
    }
    df.select(fd.as("__fd")).filter(col("__fd") =!= "")
      .groupBy(col("__fd").cast("int").as("digit"))
      .agg(count(lit(1)).cast("long").as("n"))
      // unpartitioned window: runs on the ≤90-row POST-AGG digit frame,
      // so the single-partition WindowExec warning is expected and benign
      .withColumn("__nt", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") * lit(1000000.0) /
          col("__nt").cast("double")).cast("long").as("share_micro"),
        expCol.as("exp_micro"))
  }

  /** The per-digit Benford expectations as micros — shared with the SQL
    * oracle so both engines state identical literals. */
  private[graft] def benfordExpMicros: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000.0))

  /** FIRST-TWO-digit Benford audit — the standard forensic follow-up to
    * [[benfordProfile]] (Nigrini's two-digit test: fabricators who get
    * the first digit right rarely match the joint law
    * P(d₁d₂) = log₁₀(1 + 1/(10·d₁+d₂))). One row per observed two-digit
    * prefix 10–99 with the same `(digit, n, share_micro, exp_micro)`
    * readout. Digits come from the decimal-string rendering with every
    * non-digit stripped (sign/point), then the first `[1-9][0-9]` match —
    * sub-1 values route right, and values with a SINGLE significant
    * digit (no second digit exists) are excluded like zeros are in the
    * first-digit test. Same one-scan shape: ≤90-row agg + window. */
  def benfordProfile2(
      df: DataFrame,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = regexp_replace(col(valueCol).cast("string"), "[^0-9]", "")
    val d2s = regexp_extract(digits, "[1-9][0-9]", 0)
    val expCol = benfordExp2Micros.foldLeft(lit(null).cast("long")) {
      case (acc, (d, m)) => when(col("digit") === d, lit(m)).otherwise(acc)
    }
    df.select(d2s.as("__d2")).filter(col("__d2") =!= "")
      .groupBy(col("__d2").cast("int").as("digit"))
      .agg(count(lit(1)).cast("long").as("n"))
      // unpartitioned window: runs on the ≤90-row POST-AGG digit frame,
      // so the single-partition WindowExec warning is expected and benign
      .withColumn("__nt", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") * lit(1000000.0) /
          col("__nt").cast("double")).cast("long").as("share_micro"),
        expCol.as("exp_micro"))
  }

  /** SECOND-digit Benford audit — the marginal of [[benfordProfile2]]:
    * P(d₂) = Σ_{d₁=1..9} log₁₀(1 + 1/(10·d₁+d₂)), a near-flat 12%→8.5%
    * slope that survives unit changes better than the first-digit law.
    * Same extraction and exclusions as the two-digit test; ≤10 rows. */
  def benfordProfileSecond(
      df: DataFrame,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = regexp_replace(col(valueCol).cast("string"), "[^0-9]", "")
    val d2s = regexp_extract(digits, "[1-9][0-9]", 0)
    val expCol = benfordExpSecondMicros.foldLeft(lit(null).cast("long")) {
      case (acc, (d, m)) => when(col("digit") === d, lit(m)).otherwise(acc)
    }
    df.select(d2s.as("__d2")).filter(col("__d2") =!= "")
      .groupBy(substring(col("__d2"), 2, 1).cast("int").as("digit"))
      .agg(count(lit(1)).cast("long").as("n"))
      // unpartitioned window: runs on the ≤90-row POST-AGG digit frame,
      // so the single-partition WindowExec warning is expected and benign
      .withColumn("__nt", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") * lit(1000000.0) /
          col("__nt").cast("double")).cast("long").as("share_micro"),
        expCol.as("exp_micro"))
  }

  /** First-two-digit Benford expectations as micros (10–99) — ONE Scala
    * source for the engine literals and the SQL oracle. */
  private[graft] def benfordExp2Micros: Seq[(Int, Long)] =
    (10 to 99).map(n => n -> math.round(math.log10(1.0 + 1.0 / n) * 1000000.0))

  /** Second-digit marginal expectations as micros (0–9), summed over the
    * first digit before the single rounding — one Scala source. */
  private[graft] def benfordExpSecondMicros: Seq[(Int, Long)] =
    (0 to 9).map { d =>
      val p = (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum
      d -> math.round(p * 1000000.0)
    }

  /** TRIGRAM interpolated Kneser–Ney log-probability per document — the
    * higher-order sibling of [[perplexityScore]], one order below the
    * 5-gram KenLM models CCNet ships but with the full KN structure:
    * every level's distribution is built from CONTINUATION counts of the
    * level above, and scoring backs off through the whole cascade.
    * With D the single discount and, per trigram type (w1,w2,w3) of the
    * REFERENCE (all exact integers from ONE trigram census):
    *   t       = c(w1w2w3)                       (occurrences)
    *   c12,n12 = Σ_w c(w1w2w), N₁₊(w1w2•)        (context totals)
    *   b23     = N₁₊(•w2w3)                      (continuation "counts")
    *   b2,m2   = Σ_w3 b23, N₁₊ of those          (middle-context totals)
    *   u3,U    = N₁₊(• • w3) types, total (w2,w3) types
    * then P1 = u3/U (unseen w3 → 1/U, the uniform-continuation fallback
    * discipline of [[perplexityScore]]),
    * P2 = max(b23−D,0)/b2 + (D·m2/b2)·P1,
    * P3 = max(t−D,0)/c12 + (D·n12/c12)·P2,
    * and an occurrence scores ln of: P3 when the trigram type is in the
    * model; (D·n12/c12)·P2' when only its context is (P2' = P2 when the
    * (w2,w3) continuation exists, else (D·m2/b2)·P1 — interpolated KN's
    * own zero-numerator limit); P2' when only w2 is known as a middle
    * word; P1 otherwise. Returns `(id, n_trigrams, sum_lp_q)` with
    * `sum_lp_q = Σ cnt·round(ln P · 10⁶)` — the exact-integer readout
    * that hash-gates; documents with < 3 tokens score (0, 0). A
    * reference with no trigrams fails in-plan (same contract as the
    * bigram scorer).
    *
    * Scale shape: ONE trigram-keyed census over the reference (persisted
    * lazily — five consumers; [[knModel]]'s lifetime note applies) feeds
    * every model table; scoring is one (id, w1, w2, w3) partial agg over
    * the corpus + four model-table left joins on progressively shorter
    * suffix keys (broadcast when the model fits, keyed shuffle otherwise
    * — TYPE tables, never occurrence volume) + one id-keyed integer
    * rollup. */
  def perplexityScore3(
      docs: DataFrame,
      reference: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1): $discount")
    def split3(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+
        explode(TextFunctions.shinglesNative(col(textCol), 3)).as("__tg"): _*)
      .select(keep :+
        substring_index(col("__tg"), " ", 1).as("w1") :+
        substring_index(substring_index(col("__tg"), " ", 2), " ", -1).as("w2") :+
        substring_index(col("__tg"), " ", -1).as("w3"): _*)
    val census = graft.ops.Pins.scopedPersist("curation.trigramCensus",
      split3(reference, Nil)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).cast("long").as("t3")))
    val c12 = census.groupBy("w1", "w2")
      .agg(sum(col("t3")).cast("long").as("c12"),
        count(lit(1)).cast("long").as("n12"))
    val t2 = census.groupBy("w2", "w3")
      .agg(count(lit(1)).cast("long").as("b23"))
    val c2 = t2.groupBy("w2")
      .agg(sum(col("b23")).cast("long").as("b2"),
        count(lit(1)).cast("long").as("m2"))
    val u1 = t2.groupBy("w3").agg(count(lit(1)).cast("long").as("u3"))
    // exactly one row; null on a trigram-less reference -> in-plan raise
    val uTot = t2.agg(count(lit(1)).cast("long").as("__u"))
    val d = lit(discount)
    val uu = when(col("__u") > 0, col("__u").cast("double"))
      .otherwise(raise_error(lit("perplexityScore3: reference corpus has " +
        "no trigrams — no model to score under")).cast("double"))
    val p1 = coalesce(col("u3"), lit(1L)).cast("double") / uu
    val lam2 = (d * col("m2").cast("double")) / col("b2").cast("double")
    val p2full = greatest(col("b23").cast("double") - d, lit(0.0)) /
      col("b2").cast("double") + lam2 * p1
    val p2 = when(col("b23").isNotNull, p2full).otherwise(lam2 * p1)
    val lam3 = (d * col("n12").cast("double")) / col("c12").cast("double")
    val prob =
      when(col("t3").isNotNull,
        greatest(col("t3").cast("double") - d, lit(0.0)) /
          col("c12").cast("double") + lam3 * p2)
      .when(col("c12").isNotNull, lam3 * p2)
      .when(col("b2").isNotNull, p2)
      .otherwise(p1)
    val occ = split3(docs, Seq(col(idCol)))
      .groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).cast("long").as("__cnt"))
    val scored = occ
      .join(census, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(t2, Seq("w2", "w3"), "left")
      .join(c2, Seq("w2"), "left")
      .join(u1, Seq("w3"), "left")
      .crossJoin(broadcast(uTot))
      .withColumn("__lp_q", round(log(prob) * lit(1000000.0)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_trigrams"),
        sum(col("__cnt") * col("__lp_q")).cast("long").as("sum_lp_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("sum_lp_q"), lit(0L)).as("sum_lp_q"))
  }

  /** T5-style SPAN CORRUPTION training-example construction (Raffel et
    * al. 2020 §3.1.4): deterministic masked spans become numbered
    * sentinels in the input, and the target is each sentinel followed by
    * the tokens it hides, closed by one final sentinel — the
    * masked-LM / denoising objective's data layout, built in-engine. A
    * span STARTS at token position p iff the salted md5 of (id, p) lands
    * in bucket 0 of `startEvery` (membership a pure function of (id, p,
    * salt) — the split/sample discipline: reruns, engines, and corpus
    * growth never move a mask), runs `spanLen` tokens (truncated at the
    * document end), and overlapping/adjacent spans merge into maximal
    * islands before numbering, so sentinel ids are dense in position
    * order. Expected noise density ≈ spanLen/startEvery (T5's 15% at
    * 3/20). Returns `(id, input, target, n_masked)`; the input is
    * whitespace-normalized (tokens rejoined with single spaces);
    * documents with no masked span emit the normalized text, an empty
    * target, and n_masked = 0. T5's own contract applies: sentinel
    * strings (`<extra_id_k>`) must not occur as corpus tokens, or the
    * input/target splice is ambiguous — run the vocabulary check (or a
    * blocklist pass) upstream when corpora are adversarial.
    *
    * Scale shape: one tokenize scan feeds both the mask census (the
    * start predicate is a scan-local hash) and reassembly; islands are
    * one (doc, pos) window over MASKED positions only; both string
    * rebuilds are the [[graft.operators.Dedup.rebuildFromSpans]]
    * sorted-collect per doc. Zero driver traffic, no corpus-sized
    * shuffle beyond the id-keyed rollup any per-doc rebuild pays. */
  def spanCorrupt(
      docs: DataFrame,
      startEvery: Int = 20,
      spanLen: Int = 3,
      salt: String = "corrupt",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    require(startEvery >= 1, s"startEvery must be >= 1: $startEvery")
    require(spanLen >= 1, s"spanLen must be >= 1: $spanLen")
    val pos = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), size(col("__t")).as("__n"),
        posexplode(col("__t")).as(Seq("__p", "__tok")))
    // .cast("long") before pmod (the hashBucket pattern): without it the
    // predicate is exact only under ANSI mode — with ansi.enabled=false
    // pmod promotes the 60-bit hash STRING to double and the residue
    // silently changes, so mask membership would depend on a session conf
    val isStart = pmod(conv(substring(md5(concat_ws(":",
        col(idCol), col("__p"), lit(salt))), 1, 15), 16, 10).cast("long"),
      lit(startEvery.toLong)) === 0
    val covered = pos.filter(isStart)
      .select(col(idCol), explode(sequence(col("__p"),
        least(col("__p") + lit(spanLen - 1), col("__n") - 1))).as("__c"))
      .distinct()
    val w = Window.partitionBy(col(idCol)).orderBy(col("__c"))
    val gid = covered
      .withColumn("__new",
        when(col("__c") - lag(col("__c"), 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("__gid",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
    val marked = pos.join(
      gid.select(col(idCol), col("__c").as("__p"), col("__new"), col("__gid")),
      Seq(idCol, "__p"), "left")
    val sentinel = concat(lit("<extra_id_"), col("__gid"), lit(">"))
    val inPiece = when(col("__gid").isNull, col("__tok"))
      .when(col("__new") === 1L, sentinel) // null (dropped) mid-island
    val tgtPiece = when(col("__gid").isNotNull, concat(
      when(col("__new") === 1L, concat(sentinel, lit(" "))).otherwise(lit("")),
      col("__tok")))
    def joined(piece: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_join(transform(filter(
        sort_array(collect_list(struct(col("__p"), piece.as("__s")))),
        e => e.getField("__s").isNotNull), e => e.getField("__s")), " ")
    marked.groupBy(col(idCol))
      .agg(joined(inPiece).as("input"),
        joined(tgtPiece).as("__tgt"),
        count(col("__gid")).cast("long").as("n_masked"),
        (max(col("__gid")) + 1L).as("__ns"))
      .select(col(idCol), col("input"),
        when(col("n_masked") > 0,
            concat(col("__tgt"), lit(" <extra_id_"), col("__ns"), lit(">")))
          .otherwise(lit("")).as("target"),
        col("n_masked"))
  }

  /** Mass-balanced shard assignment by SNAKE (boustrophedon) allocation:
    * rank documents by `massCol` descending (ties to the smaller id) and
    * deal rank r to shard `snake(r, n)` — 0,1,…,n−1,n−1,…,1,0,0,1,… —
    * the deterministic one-pass cousin of LPT greedy bin packing. Two
    * adjacent snake passes hand each shard one heavy + one light item, so
    * shard masses stay within one item's mass of each other on sorted
    * input — the equal-token training-shard layout hash sharding
    * ([[graft.sources.Sinks.exportShardedJsonl]]) cannot promise, at the
    * cost of a global sort. Returns `(id, massCol, rank, shard)`.
    *
    * Scale shape: the global rank is the TWO-PHASE distributed prefix
    * count ([[graft.ops.RunningCount.withRunningCount]] — range-bucket on
    * the sort key, per-bucket row_number, bucket offsets composed), NOT a
    * partition-less window (which Spark executes on ONE task — the
    * WindowExec single-partition warning this operator must never emit
    * at 100 TB); the shard is then a pure integer expression, no second
    * shuffle. Descending mass rides the negated key; null masses rank
    * last (Long.MaxValue key), still assigned. */
  def balancedShards(
      df: DataFrame,
      massCol: String,
      nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    // a negative "mass" is a caller bug (masses are token/byte counts) —
    // fail the ROW loudly in-plan, the weightedQuantiles discipline
    val m0 = col(massCol).cast("long")
    val mSafe = when(m0 < 0, raise_error(concat(
        lit("balancedShards: negative mass "), m0.cast("string")))
      .cast("long")).otherwise(m0)
    // (mass desc nulls last, id asc) as an ascending key: masses are
    // non-negative counts, so -mass ascends exactly as mass descends
    val sortKey = coalesce(lit(0L) - mSafe, lit(Long.MaxValue))
    val ranked = graft.ops.RunningCount.withRunningCount(
      df.select(col(idCol), col(massCol)),
      Seq(sortKey, col(idCol)), "rank")
    val r0 = pmod(col("rank") - lit(1L), lit(2L * nShards))
    ranked.withColumn("shard",
      when(r0 < nShards, r0).otherwise(lit(2L * nShards - 1) - r0))
  }

  /** DSIR importance log-ratios (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-bigram features are under the TARGET
    * feature distribution than under the SOURCE one —
    * `score = Σ_f count_f · (ln p̂_T(f) − ln p̂_S(f))` with Laplace
    * smoothing `p̂(b) = (c_b + 1)/(N + B)` over `buckets` portable md5
    * feature buckets ([[graft.operators.Classifier]]'s derivation, on
    * bigrams). `targetPred` partitions the corpus into target/source —
    * typically a high-quality slice (wiki, curated) vs the raw crawl.
    * Returns `(id, n_feats, score_q)` for every document; `score_q` is
    * the exact integer sum of per-bucket-TYPE fixed-point log-ratios
    * (round(lr·10⁶) — [[perplexityScore]]'s ln discipline), so the
    * readout hash-gates across engines. Documents with no bigrams score
    * (0, 0).
    *
    * Scale shape: ONE tokenize scan to (id, tgt, bucket, cnt) partial
    * aggs (map-side combined; tgt is id-functional so the key adds
    * nothing); the census re-agg collapses that to `buckets` rows whose
    * log-ratio table broadcasts back onto the per-doc counts; one
    * id-keyed integer rollup. The feature space is FIXED (B buckets) —
    * at 100 TB the model is still a few KiB and the only corpus-sized
    * costs are the scan and the (id, bucket) combine.
    *
    * Cache lifetime: the (id, bucket) census is lazily persisted
    * MEMORY_AND_DISK so both consumers share one tokenize scan, under a
    * SCOPED lifetime ([[graft.ops.Pins.scopedPersist]]) — the next dsir
    * call releases the previous census, so a long-lived session issuing
    * MANY independent calls holds at most one cached census. */
  def dsirLogRatios(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val b = pmod(conv(substring(md5(col("__bg")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
    // persisted LAZILY under a SCOPED lifetime (Pins.scopedPersist — the
    // next dsir call releases this one): the census re-agg and the scoring
    // join are two consumers of this one tokenize scan
    val perDoc = graft.ops.Pins.scopedPersist("curation.dsir", docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(TextFunctions.shinglesNative(col(textCol), 2)).as("__bg"))
      .select(col(idCol), col("__tgt"), b.as("__b"))
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).cast("long").as("__cnt")))
    val census = perDoc.groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), col("__cnt")).otherwise(0L)).cast("long").as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(col("__cnt"))).cast("long").as("__cs"))
    val totals = census.agg(sum(col("__ct")).cast("long").as("__nt"),
      sum(col("__cs")).cast("long").as("__ns"))
    val lr = census.crossJoin(broadcast(totals)).select(col("__b"),
      round((log((col("__ct") + lit(1L)).cast("double") /
          (col("__nt").cast("double") + lit(buckets.toDouble))) -
        log((col("__cs") + lit(1L)).cast("double") /
          (col("__ns").cast("double") + lit(buckets.toDouble)))) *
        lit(1000000.0)).cast("long").as("__lr_q"))
    val scored = perDoc.join(broadcast(lr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_feats"),
        sum(col("__cnt") * col("__lr_q")).cast("long").as("score_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_q"), lit(0L)).as("score_q"))
  }

  /** [[dsirLogRatios]] thresholded into the selection — keep a document
    * iff its MEAN per-feature log-ratio clears `minMeanLrMicros`
    * (micro-log units; 0 = "more target-like than source-like", the
    * natural DSIR cut). Integer compare, no division; featureless
    * documents keep vacuously (0 ≥ 0) — compose with a length floor when
    * shortness should drop. */
  def dsirFilter(
      docs: DataFrame,
      targetPred: Column,
      minMeanLrMicros: Long = 0L,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirLogRatios(docs, targetPred, buckets, idCol, textCol)
      .withColumn("keep",
        col("score_q") >= lit(minMeanLrMicros) * col("n_feats"))

  /** [[perplexityScore]] thresholded into the keep/drop decision — the
    * model-based perplexity FILTER: keep a document iff its MEAN
    * per-bigram log-probability clears `minMeanLpMicros` (micro-log
    * units, e.g. -7_500_000 ≈ mean ln P ≥ −7.5 ≈ perplexity ≤ e^7.5).
    * The compare is `sum_lp_q ≥ minMeanLpMicros · n_bigrams` — pure
    * integer arithmetic, no division, exact on any engine. Documents
    * with no bigrams keep vacuously (0 ≥ 0): too short to convict;
    * compose with a length floor when shortness itself should drop. */
  def perplexityFilter(
      docs: DataFrame,
      reference: DataFrame,
      minMeanLpMicros: Long,
      discount: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    perplexityScore(docs, reference, discount, idCol, textCol)
      .withColumn("keep",
        col("sum_lp_q") >= lit(minMeanLpMicros) * col("n_bigrams"))

  /** Weight-proportional deterministic sample: keep a row with probability
    * `min(1, weight × perUnitRate)` — e.g. `weightCol = n_chars,
    * perUnitRate = 1/4000` keeps a 2000-char document with p=0.5 and every
    * ≥4000-char document surely, the standard size-biased draw when longer
    * documents should survive curation more often (they carry more
    * tokens per row of overhead). Like [[sampleFraction]], membership is a
    * PURE FUNCTION of (id, salt): the row's 60-bit salted-md5 uniform is
    * compared against its own weight-scaled threshold, so reruns, engines,
    * and corpus growth never flip a decision, and the whole thing is one
    * codegen'd scan predicate — zero shuffles at any scale. The only
    * floating-point ops are one exactly-rounded long→double conversion, one
    * IEEE multiply and one compare, each bit-identical in any IEEE-754
    * engine (no transcendental calls, whose last-ulp differences would make
    * boundary rows engine-dependent). Null ids or weights drop (no identity
    * to hash / no weight to scale). */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      perUnitRate: Double,
      salt: String = "wsample"): DataFrame = {
    require(perUnitRate > 0.0, s"perUnitRate must be > 0: $perUnitRate")
    // 15 md5 hex chars = 60 bits: fits a positive long exactly, and
    // 2^60 is exactly representable as a double
    val u = conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))),
      1, 15), 16, 10).cast("long").cast("double") / lit(1152921504606846976.0)
    df.filter(u < col(weightCol).cast("double") * lit(perUnitRate))
  }

  /** Rebalance a corpus to declared per-group TOKEN shares by
    * down-sampling: each group's keep rate is derived IN-PLAN from the
    * corpus's own token masses — `rate_g = S·w_g / c_g` with
    * `S = min_g(c_g / w_g)`, the largest achievable total at the target
    * mix, so the binding (scarcest-relative-to-target) group keeps rate 1
    * and every other group trims to match it. Groups not in `targets`
    * drop entirely (a declared mixture is a total spec). Shape at scale:
    * one partial-combined agg for the masses (rows = groups), a one-row
    * min, and the tiny rate table broadcast back onto the scan — the keep
    * decision stays the salted-bucket compare of [[mixtureSample]]
    * (expected token mass hits the targets; exactness is Bernoulli).
    * Double math is kept in the same operation order as the SQL oracle so
    * both engines derive bit-identical rates. */
  def mixtureToTargets(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenCol: String,
      targets: Seq[(String, Double)],
      salt: String = "mixture"): DataFrame = {
    require(targets.nonEmpty, "need at least one (group, weight)")
    targets.foreach { case (g, w) => require(w > 0.0, s"weight must be > 0: $g -> $w") }
    val w = targets.foldRight(lit(null).cast("double")) { case ((g, wt), acc) =>
      when(col(groupCol) === g, lit(wt)).otherwise(acc)
    }
    val masses = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("double").as("__c"))
      .withColumn("__w", w)
      .filter(col("__w").isNotNull && col("__c") > 0)
    val s = masses.agg(min(col("__c") / col("__w")).as("__S"))
    val rates = masses.crossJoin(broadcast(s))
      .select(col(groupCol), (col("__S") * col("__w") / col("__c")).as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashBucketSalted(col(idCol), salt).cast("double") <
        col("__rate") * lit(SplitBuckets.toDouble))
      .drop("__rate")
  }

  /** Mixture weighting with weights ABOVE 1: each row is replicated
    * `floor(w)` times plus one more copy iff its salted bucket lands under
    * the fractional part — so a 2.5-weighted source yields exactly 2 or 3
    * copies per row (deterministically, by id), averaging 2.5×. For w <= 1
    * this degenerates to [[mixtureSample]]'s membership rule with a `copy`
    * column of 1, so one weight table drives both directions. The copy
    * index (1..k) rides along so downstream shuffles and split assignment
    * can tell copies apart. A generator (explode of a per-row sequence),
    * still zero shuffles and scan-bound: output volume is the weighted
    * volume, the only cost that matters at 100 TB. */
  def mixtureUpsample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weights: Seq[(String, Double)],
      defaultWeight: Double = 1.0,
      salt: String = "mixture",
      copyCol: String = "copy"): DataFrame = {
    require(weights.nonEmpty, "need at least one (group, weight)")
    (weights.map(_._2) :+ defaultWeight).foreach(w =>
      require(w >= 0.0, s"weight must be >= 0: $w"))
    val w = weights.foldRight(lit(defaultWeight): Column) {
      case ((group, wt), acc) => when(col(groupCol) === group, lit(wt)).otherwise(acc)
    }
    val whole = floor(w).cast("long")
    val fracThreshold = round((w - floor(w)) * SplitBuckets).cast("long")
    val copies = whole +
      when(hashBucketSalted(col(idCol), salt) < fracThreshold, 1L).otherwise(0L)
    // CaseWhen branches evaluate lazily, so sequence(1, 0) is never built
    df.withColumn(copyCol,
      explode(when(copies >= 1L, sequence(lit(1L), copies))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** One-pass column profile: row count plus per-column null and distinct
    * counts, one output row per profiled column.
    *
    * Exact mode (default): Catalyst plans the multi-distinct as a single
    * Expand + aggregate — the scan runs once and the shuffle carries
    * (column-tag, value) pairs. That shuffle is proportional to the summed
    * distinct cardinalities, which on a 100 TB free-text column is the
    * corpus itself — so `approx = true` switches every distinct to
    * `approx_count_distinct` (HyperLogLog++, relative error `rsd`): partial
    * HLL sketches merge map-side and the shuffle carries one fixed-size
    * sketch per (column, partition) regardless of cardinality. That is the
    * shape a real 100 TB profiling pass runs; the oracle gate covers the
    * exact path hash-exact and pins the approx path within rsd of it. */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def distinctAgg(c: String): Column =
      if (approx) approx_count_distinct(col(c), rsd) else count_distinct(col(c))
    // coalesce: SUM over zero rows is NULL, and the profile row must stay
    // non-null on an empty (e.g. fully partition-pruned) input
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
      distinctAgg(c).as(s"__nd_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"), col("__n").as("n_rows"),
      col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** [[profile]] computing the exact AND the HLL distinct in ONE pass
    * (same Expand + aggregate; the HLL sketch rides the same shuffle), one
    * extra `n_distinct_approx` column per row. This is the calibration
    * shape — measure the sketch against truth on a sample, then run
    * `profile(approx = true)` alone at full scale — and it is what the
    * q_profile_approx gate drives (half the scans of running the two
    * profiles separately and joining). */
  def profileWithApprox(
      df: DataFrame,
      cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      approx_count_distinct(col(c), rsd).as(s"__na_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"), col("__n").as("n_rows"),
      col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
      col(s"__na_$c").as("n_distinct_approx")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** One-pass numeric quantile profile: each (column, prob) pair gets its
    * linear-interpolated quantile, one output row per pair — the length /
    * score / price distribution summary a curation pass reads before
    * choosing filter thresholds. Exact mode uses `percentile`, which
    * BUFFERS each column's values in the aggregation state: it is the
    * correctness oracle, not the 100 TB path — there `approx = true`
    * switches to `approx_percentile` (Greenwald-Khanna sketch, bounded
    * state, mergeable map-side), the same exact-oracle/sketch-scale-path
    * split as [[profile]]'s distincts. */
  /** @param groupCols non-empty → one quantile set PER GROUP ("token p99
    *   per source"): the agg partial-combines map-side, so the shuffle
    *   carries one sketch/buffer per (group, column), and output rows =
    *   groups × columns × probs. Empty (default) = one global profile. */
  def quantileProfile(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double],
      approx: Boolean = false,
      accuracy: Int = 10000,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "quantileProfile needs at least one column")
    require(probs.nonEmpty, "quantileProfile needs at least one probability")
    probs.foreach(p => require(p >= 0.0 && p <= 1.0, s"prob out of [0,1]: $p"))
    val probsArr = array(probs.map(lit): _*)
    val aggs = cols.map { c =>
      (if (approx) percentile_approx(col(c).cast("double"), probsArr, lit(accuracy))
       else percentile(col(c), probsArr)).as(s"__q_$c")
    }
    val one =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c =>
      struct(lit(c).as("col_name"), col(s"__q_$c").as("qs")))
    one.select(groupCols.map(col) :+ explode(array(entries: _*)).as("p"): _*)
      .select(groupCols.map(col) ++ Seq(col("p.col_name").as("col_name"),
        posexplode(col("p.qs")).as(Seq("__i", "value"))): _*)
      .withColumn("prob", element_at(probsArr, col("__i") + 1))
      .select(groupCols.map(col) ++ Seq(col("col_name"), col("prob"), col("value")): _*)
  }

  /** Adaptive quality threshold: keep rows whose score clears the
    * prob-quantile of that score — globally, or within each group (the
    * per-language / per-source cut real corpus curation runs, so a
    * low-resource group is trimmed against its own distribution, not the
    * majority's). The threshold frame is one row per group (an aggregate,
    * partial-combined map-side) joined back broadcast: two passes over the
    * data, no driver round-trip. `exact = true` uses the interpolated
    * exact percentile (the oracle path — buffers a group's scores in agg
    * state); the default GK sketch has bounded mergeable state, the only
    * viable shape at 100 TB. Null scores never clear the threshold. Rows
    * whose GROUP key is null are a group of their own (SQL GROUP BY
    * convention) and are cut against that group's threshold — the join
    * back is null-safe, so they are not silently dropped. */
  def keepAboveQuantile(
      df: DataFrame,
      scoreCol: String,
      prob: Double,
      groupCols: Seq[String] = Nil,
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(prob >= 0.0 && prob <= 1.0, s"prob out of [0,1]: $prob")
    val th =
      (if (exact) percentile(col(scoreCol), lit(prob))
       else percentile_approx(col(scoreCol).cast("double"), lit(prob), lit(accuracy)))
        .as("__graft_th")
    val joined = joinGroupStats(df,
      if (groupCols.isEmpty) df.agg(th)
      else df.groupBy(groupCols.map(col): _*).agg(th), groupCols)
    joined.filter(col(scoreCol) >= col("__graft_th")).drop("__graft_th")
  }

  /** Broadcast a one-row-per-group stats frame back onto `df` NULL-SAFELY.
    * `groupBy` forms a group for null keys, but a plain equi-join never
    * matches them — rows with a null group key would silently vanish from
    * operators documented as row-preserving. `<=>` (EqualNullSafe) is a
    * valid hash-join key, so the join stays a broadcast hash join while
    * the null group meets its own stats row. `joinType = "left"` keeps
    * rows whose group has no stats row (stats columns null) — the shape
    * the against-a-reference-corpus operators need. */
  private def joinGroupStats(
      df: DataFrame, stats: DataFrame, groupCols: Seq[String],
      joinType: String = "inner"): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
    else {
      val renamed = groupCols.foldLeft(stats)(
        (d, c) => d.withColumnRenamed(c, "__graft_g_" + c))
      val cond = groupCols.map(c => col(c) <=> col("__graft_g_" + c)).reduce(_ && _)
      df.join(broadcast(renamed), cond, joinType)
        .drop(groupCols.map("__graft_g_" + _): _*)
    }

  /** Winsorize: clamp `valueCol` into its own [pLo, pHi] quantile band —
    * globally or per group — the standard outlier treatment before a
    * numeric feature feeds normalization or training (a single corrupt
    * 10⁹-token row otherwise owns the scale). Same derivation discipline
    * as [[keepAboveQuantile]]: the thresholds come from one tiny
    * (per-group) aggregate broadcast back onto the scan, so the data pays
    * one read + zero data-sized shuffles; `exact = true` is the
    * oracle-checkable `percentile` path, the default GK sketch
    * (`approx_percentile`) is the bounded-state 100 TB path. Output
    * replaces `valueCol` with the clamped value AS DOUBLE (both paths cast
    * the value to double before the percentile and the clamp, so the
    * output type never depends on which path ran; null values pass through
    * null; the original, in its original type, is `<valueCol>_raw`). Rows
    * with a null group key clamp against their own group's band — the
    * join back is null-safe, so none are dropped. */
  def clipToQuantiles(
      df: DataFrame,
      valueCol: String,
      pLo: Double,
      pHi: Double,
      groupCols: Seq[String] = Nil,
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo <= pHi, s"bad band: [$pLo, $pHi]")
    def q(p: Double, as: String) =
      (if (exact) percentile(col(valueCol).cast("double"), lit(p))
       else percentile_approx(col(valueCol).cast("double"), lit(p), lit(accuracy)))
        .as(as)
    val ths = Seq(q(pLo, "__graft_lo"), q(pHi, "__graft_hi"))
    val joined = joinGroupStats(df,
      if (groupCols.isEmpty) df.agg(ths.head, ths.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(ths.head, ths.tail: _*),
      groupCols)
    joined
      .withColumn(s"${valueCol}_raw", col(valueCol))
      // greatest/least SKIP nulls (a null value would clamp to the lo
      // bound) — guard so null stays null, matching SQL CASE semantics.
      // The double cast matches the threshold derivation, so the clamped
      // column is DoubleType on every input type and both quantile paths.
      .withColumn(valueCol, when(col(valueCol).isNull, lit(null).cast("double"))
        .otherwise(least(greatest(col(valueCol).cast("double"), col("__graft_lo")),
          col("__graft_hi"))))
      .drop("__graft_lo", "__graft_hi")
  }

  /** Pack documents into fixed token-budget training sequences: doc d (in
    * `orderCols` order) lands in sequence `floor(exclusive_prefix_tokens /
    * seqTokens)` — the standard contiguous-packing-by-offset rule (each
    * sequence is then the concatenation of its docs, split at the budget
    * boundary; a doc straddling a boundary starts in its assigned sequence).
    * Built on the scalable prefix-sum machinery
    * ([[graft.ops.RunningCount.withRunningAgg]]): two-phase bucketed window,
    * no global single-partition sort, no driver round-trip — the assignment
    * holds on a 1000-executor cluster. Deterministic given a unique order
    * key. */
  def packSequences(
      docs: DataFrame,
      tokenCol: Column,
      orderCols: Seq[Column],
      seqTokens: Long,
      outputCol: String = "seq_id"): DataFrame = {
    require(seqTokens > 0, s"sequence budget must be positive: $seqTokens")
    val tok = "__graft_tok"
    val cum = "__graft_cum"
    val withTok = docs.withColumn(tok, tokenCol.cast("long"))
    graft.ops.RunningCount.withRunningAgg(
      withTok, col(tok), graft.ops.RunningCount.Kind.Sum, orderCols, cum)
      // integer div, not double floor: cumulative token counts on a 100 TB
      // corpus pass 2^53, where double division starts mis-assigning
      .withColumn(outputCol, expr(s"($cum - $tok) div ${seqTokens}L"))
      .drop(tok, cum)
  }

  /** Materialize [[packSequences]]' assignment into the actual training
    * sequences: one row per seq_id with the member doc ids' span, the docs'
    * text concatenated in order, and exact token/doc counts — the step that
    * turns the assignment into the packed file a trainer reads. The
    * groupBy's collect_list bag — normally the unbounded-row-width red
    * flag — is BOUNDED BY CONSTRUCTION here: a sequence holds at most
    * `seqTokens` tokens' worth of docs plus the one straddling doc, so row
    * width is capped by the caller's own budget no matter how the corpus
    * is distributed. One keyed shuffle beyond packSequences' prefix sum;
    * ordering inside the bag is by the pack order key, so the output is
    * deterministic and engine-portable. */
  def packedSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tokenCol: Column,
      seqTokens: Long,
      sep: String = " "): DataFrame = {
    val assigned = packSequences(docs, tokenCol, Seq(col(idCol)), seqTokens)
    assigned.groupBy("seq_id")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col(textCol).as("t")))).as("__graft_ds"))
      .select(col("seq_id"),
        element_at(col("__graft_ds"), 1).getField("id").as("first_doc_id"),
        element_at(col("__graft_ds"), -1).getField("id").as("last_doc_id"),
        size(col("__graft_ds")).cast("long").as("n_docs"),
        concat_ws(sep, transform(col("__graft_ds"), d => d.getField("t"))).as("text"))
  }

  /** Packing-efficiency report over [[packSequences]]' assignment: one row
    * per training sequence with its document count and exact token total —
    * the fill-rate audit (waste = seqTokens − n_tokens for every sequence
    * but the straddled ones) read before committing a packing layout. One
    * keyed partial-agg shuffle beyond the assignment's prefix sum. */
  def packingStats(
      docs: DataFrame,
      tokenCol: Column,
      orderCols: Seq[Column],
      seqTokens: Long): DataFrame =
    packSequences(docs.withColumn("__graft_pt", tokenCol.cast("long")),
      col("__graft_pt"), orderCols, seqTokens)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__graft_pt")).cast("long").as("n_tokens"))

  /** Per-group z-score standardization — the feature-normalization step
    * before numeric signals feed mixing or training — with EXACT integer
    * statistics: z = (n·x − S) / sqrt(n·Q − S²) where S = Σx and Q = Σx²
    * are integer aggregates. Every input to the two float ops (one
    * correctly-rounded sqrt, one division) is an exactly-represented
    * integer, so unlike avg()/stddev() — whose partial-sum ORDER perturbs
    * low bits across engines and partitionings — the result is
    * bit-identical everywhere: hashable under the cross-engine gate, like
    * the exact-ratio trick rank normalization uses. Stats are one tiny
    * (per-group) aggregate broadcast back null-safely ([[joinGroupStats]]);
    * the data pays one scan + zero data-sized shuffles. Null values pass
    * through null (and are excluded from the stats); a zero-variance group
    * standardizes to 0. Exact while n·max(x)² < 2⁶³ (e.g. a trillion docs
    * at ≤ 3000 tokens) — shard the group key or move S/Q to decimal past
    * that. Integral value columns only for the portability guarantee. */
  def standardize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      outputCol: String = "z"): DataFrame = {
    val v = col(valueCol)
    val aggs = Seq(count(v).as("__graft_n"), sum(v).as("__graft_s"),
      sum(v * v).as("__graft_q"))
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val num = col("__graft_n") * v - col("__graft_s")
    val den2 = col("__graft_n") * col("__graft_q") - col("__graft_s") * col("__graft_s")
    joinGroupStats(df, stats, groupCols)
      .withColumn(outputCol,
        when(v.isNull, lit(null).cast("double"))
          .when(den2 === 0, lit(0.0))
          .otherwise(num.cast("double") / sqrt(den2.cast("double"))))
      .drop("__graft_n", "__graft_s", "__graft_q")
  }

  /** Per-group min-max scaling to [0, 1] — [[standardize]]'s bounded
    * sibling, same exact-integer portability argument: scaled =
    * (x − min) / (max − min) where min/max are exact integer aggregates,
    * so the single division's inputs are exactly represented and the
    * output doubles hash identically across engines and partitionings.
    * Constant groups scale to 0; nulls pass through; the per-group stats
    * frame broadcasts back null-safely. Integral value columns only for
    * the portability guarantee. */
  def minMaxScale(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      outputCol: String = "scaled"): DataFrame = {
    val v = col(valueCol)
    val aggs = Seq(min(v).as("__graft_mn"), max(v).as("__graft_mx"))
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    joinGroupStats(df, stats, groupCols)
      .withColumn(outputCol,
        when(v.isNull, lit(null).cast("double"))
          .when(col("__graft_mx") === col("__graft_mn"), lit(0.0))
          .otherwise((v - col("__graft_mn")).cast("double") /
            (col("__graft_mx") - col("__graft_mn")).cast("double")))
      .drop("__graft_mn", "__graft_mx")
  }

  /** Per-group ROBUST scaling: scaled = (x − median) / IQR — the
    * outlier-insensitive sibling of [[standardize]] (a single corrupt
    * 10⁹-token row shifts a mean and explodes a stddev but barely moves
    * the quartiles). Same derivation discipline as [[clipToQuantiles]]:
    * one tiny per-group percentile aggregate broadcast back onto the scan
    * null-safely — zero data-sized shuffles; `exact = true` is the
    * oracle-checkable `percentile` path, the default GK sketch the
    * bounded-state 100 TB path. Portability: on integral inputs the
    * linear-interpolated quartiles land on .0/.25/.5/.75 — exact in
    * binary — so the single subtraction + division hashes cross-engine
    * (same argument as minMaxScale). Zero-IQR groups scale to 0; nulls
    * pass through null. */
  def robustScale(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      outputCol: String = "scaled",
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol).cast("double")
    def q(p: Double, as: String) =
      (if (exact) percentile(v, lit(p))
       else percentile_approx(v, lit(p), lit(accuracy))).as(as)
    val aggs = Seq(q(0.5, "__graft_med"), q(0.25, "__graft_q1"),
      q(0.75, "__graft_q3"))
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    joinGroupStats(df, stats, groupCols)
      .withColumn(outputCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .when(col("__graft_q3") === col("__graft_q1"), lit(0.0))
          .otherwise((v - col("__graft_med")) /
            (col("__graft_q3") - col("__graft_q1"))))
      .drop("__graft_med", "__graft_q1", "__graft_q3")
  }

  /** Curriculum ordering: a GLOBAL training order that presents documents
    * easiest-band-first while shuffling deterministically WITHIN each
    * difficulty band — the standard curriculum-learning data order
    * (banded, not strictly sorted: a strict difficulty sort correlates
    * adjacent batches; the within-band salted-md5 shuffle decorrelates
    * them while keeping the curriculum envelope).
    *
    * Bands are equal-depth quantile cuts of `difficultyCol` (band b =
    * 1 + #{thresholds < x} with thresholds at i/bands quantiles,
    * `exact = true` for the oracle path, GK sketch at scale); the global
    * position rides the two-phase distributed prefix count
    * ([[graft.ops.RunningCount.withRunningCount]]) on the
    * (band, salted-md5, id) key — no single-task global sort, the same
    * machinery as [[withShuffleOrder]], so the order holds on a
    * 1000-executor cluster. Deterministic and partition-invariant;
    * distinct salts draw independent within-band orders. */
  def curriculumOrder(
      df: DataFrame,
      difficultyCol: String,
      idCol: String,
      bands: Int = 4,
      salt: String = "curriculum",
      outputCol: String = "pos",
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bands >= 2, s"bands must be >= 2: $bands")
    val v = col(difficultyCol).cast("double")
    def q(p: Double, as: String) =
      (if (exact) percentile(v, lit(p))
       else percentile_approx(v, lit(p), lit(accuracy))).as(as)
    val cuts = (1 until bands).map(i => q(i.toDouble / bands, s"__graft_c$i"))
    val stats = df.agg(cuts.head, cuts.tail: _*)
    val band = (1 until bands).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(v > col(s"__graft_c$i"), 1L).otherwise(0L)
    }
    val banded = df.crossJoin(broadcast(stats))
      .withColumn("band", band)
      .drop((1 until bands).map(i => s"__graft_c$i"): _*)
    graft.ops.RunningCount.withRunningCount(banded,
      Seq(col("band"),
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), col(idCol)),
      outputCol)
  }

  /** EXACT quantiles computed DISTRIBUTED — the 100 TB exact path that the
    * single-buffer `percentile` aggregate (which materializes every value
    * in one task's OpenHashMap) cannot take, for value domains that
    * collapse well (integral lengths, counts, scores at fixed precision).
    *
    * Shape: the data-sized step is ONE (group, value) partial-aggregated
    * count — the value histogram; the cumulative rank then runs over
    * DISTINCT-VALUE rows only (two-phase distributed prefix sum
    * [[graft.ops.RunningCount]] for the global case; a per-group window
    * whose input is the per-group histogram, not raw data, for grouped
    * quantiles), and each requested prob selects its 1-2 covering rows.
    * Interpolation reproduces Spark's `percentile` bit-for-bit
    * (`(ceil(pos)−pos)·lower + (pos−floor(pos))·higher`, pos = (n−1)·p,
    * lower-at-floor / higher-at-ceil, degenerate cases → lower) — which
    * DuckDB's `quantile_cont` matches on integral inputs (gate-proven) —
    * so this IS `quantileProfile(exact = true)` without its driver-sized
    * state. Nulls are ignored like `percentile`; a huge continuous value
    * domain that does NOT collapse belongs to the GK-sketch path
    * instead. */
  def exactQuantilesDistributed(
      df: DataFrame,
      valueCol: String,
      probs: Seq[Double],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(probs.nonEmpty, "need at least one prob")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs out of [0,1]: $probs")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val cum =
      if (groupCols.isEmpty)
        graft.ops.RunningCount.withRunningAgg(
          counts, col("__c"), graft.ops.RunningCount.Kind.Sum,
          Seq(col("__v")), "__cum")
          .crossJoin(broadcast(
            counts.agg(sum(col("__c")).cast("long").as("__n"))))
      else {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
        val wAll = Window.partitionBy(groupCols.map(col): _*)
        counts
          .withColumn("__cum", sum(col("__c")).over(wOrd))
          .withColumn("__n", sum(col("__c")).over(wAll))
      }
    val pos = (col("__n") - 1).cast("double") * col("__p")
    val lo = floor(pos).cast("long")
    val hi = ceil(pos).cast("long")
    val c0 = col("__cum") - col("__c")
    val coversLo = c0 <= lo && lo < col("__cum")
    val coversHi = c0 <= hi && hi < col("__cum")
    val agg = cum
      .withColumn("__p", explode(array(probs.map(lit): _*)))
      .filter(coversLo || coversHi)
      .groupBy(groupCols.map(col) :+ col("__p").as("prob"): _*)
      .agg(max(when(coversLo, col("__v"))).as("__vl"),
        max(when(coversHi, col("__v"))).as("__vh"),
        max(col("__n")).as("__n2"))
    val pos2 = (col("__n2") - 1).cast("double") * col("prob")
    val lo2 = floor(pos2)
    val hi2 = ceil(pos2)
    agg.withColumn("value",
        when(hi2 === lo2 || col("__vh") <=> col("__vl"), col("__vl"))
          .otherwise((hi2 - pos2) * col("__vl") + (pos2 - lo2) * col("__vh")))
      .drop("__vl", "__vh", "__n2")
  }

  /** PMI collocations: term pairs that co-occur in documents far more than
    * chance — the corpus-level phrase/topic discovery pass (and the
    * association signal behind word-graph features). PMI =
    * ln(c_xy·N / (c_x·c_y)); the output carries the exact integer counts
    * AND the `ratio` double — a single division of exactly-represented
    * integers, so it is bit-portable (deterministic ordering and hashing)
    * while the ln stays one caller-side call away. Pairs below
    * `minPairCount` are noise and dropped before the ratio join.
    *
    * Scale shape: per-doc DISTINCT-term arrays form scan-locally
    * (tokenize → distinct → sort, no shuffle), pairs generate scan-locally
    * from the sorted array (x < y halves the space) and collapse
    * map-side into (x, y) counts — the ONE data-sized shuffle is Σd²
    * pair-count rows, the shingle-postings discipline. `maxDocTerms` is
    * the Σd² guard: a pathological doc with 10⁶ distinct terms would
    * contribute 10¹² pairs, so docs above the cap are EXCLUDED (the same
    * honest-cap convention as the n-gram df caps; corpus-wide stop-term
    * pruning composes upstream). Doc frequencies and N are vocab-sized /
    * one-row broadcasts. Exact while c_xy·N < 2⁵³ (the double-exactness
    * bound — a trillion-doc corpus needs the integers re-scaled). */
  def collocations(
      docs: DataFrame,
      minPairCount: Long = 5,
      maxDocTerms: Int = 1000,
      topK: Int = 100,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    require(topK >= 1 && maxDocTerms >= 2, s"bad topK/maxDocTerms")
    val terms = docs
      .select(col(idCol),
        array_sort(array_distinct(graft.functions.TextFunctions.tokens(col(textCol))))
          .as("__ts"))
      .filter(size(col("__ts")).between(2, maxDocTerms))
    // native pair generation ([[graft.functions.ArrayPairs]]): the HOF
    // formulation (indexed transform + nested transform + flatten) runs
    // interpreted per element pair
    val pairs = terms
      .select(explode(org.apache.spark.sql.GraftExpr.column(
        graft.functions.ArrayPairs(
          org.apache.spark.sql.GraftExpr.expression(col("__ts"))))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairCount)
    // every statistic (pair counts, doc frequencies, N) is over the SAME
    // pair-eligible doc set, so the PMI ratio is self-consistent
    val dfs = terms.select(explode(col("__ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val n = terms.agg(count(lit(1)).as("n"))
    pairs
      .join(dfs.select(col("t").as("x"), col("c").as("c_x")), Seq("x"))
      .join(dfs.select(col("t").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(n))
      .withColumn("ratio",
        (col("c_xy") * col("n")).cast("double") / (col("c_x") * col("c_y")))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"), col("ratio"))
      .orderBy(col("ratio").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Median absolute deviation — the robust dispersion estimate paired
    * with [[robustScale]]'s robust location: MAD = median(|x − median(x)|),
    * per group or global. Composes [[exactQuantilesDistributed]] twice
    * (location pass, then deviation pass over |x − med|), so the whole
    * computation stays exact AND distributed: two (group, value) histogram
    * shuffles, distinct-value prefix ranks, no single-buffer percentile
    * anywhere. On integral inputs both medians land on .0/.5 — exact in
    * binary — and |x − med| is exact, so the output doubles hash
    * cross-engine. Nulls are ignored like every quantile here. */
  def medianAbsDeviation(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val med = exactQuantilesDistributed(df, valueCol, Seq(0.5), groupCols)
      .withColumnRenamed("value", "__graft_med").drop("prob")
    val dev = joinGroupStats(df.filter(col(valueCol).isNotNull), med, groupCols)
      .withColumn("__graft_dev",
        abs(col(valueCol).cast("double") - col("__graft_med")))
    exactQuantilesDistributed(dev, "__graft_dev", Seq(0.5), groupCols)
      .drop("prob").withColumnRenamed("value", "mad")
  }

  /** Percentile rank of each row's value AGAINST A REFERENCE corpus —
    * ingest-time scoring ("this crawl doc's length sits at the ref
    * corpus's p87") without materializing the reference's quantiles at
    * any fixed resolution. Output: each input row plus `n_le` = #reference
    * values <= value and `n_ref` — exact integers; the percentile is the
    * one division n_le / n_ref away (bit-portable if taken).
    *
    * The searchsorted is the UNION-PREFIX trick, fully distributed: tag
    * reference rows 0 and query rows 1, run the two-phase distributed
    * prefix SUM of the reference indicator over the (value, tag, id)
    * total order — a query row's running sum IS the count of reference
    * values at or below it (the tag tiebreak puts reference rows first at
    * equal values, giving <= semantics). No broadcast quantile table, no
    * per-row binary search against driver-collected boundaries, no
    * Σ|query|·|ref| join — ONE prefix-sum pass over the union. Null
    * values rank null. */
  def percentileRankAgainst(
      df: DataFrame,
      ref: DataFrame,
      valueCol: String,
      idCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val tagged = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), v.as("__v"), lit(1).as("__tag"))
      .unionByName(ref.filter(col(valueCol).isNotNull)
        .select(lit(null).cast(df.schema(idCol).dataType).as("__id"),
          v.as("__v"), lit(0).as("__tag")))
    val counted = graft.ops.RunningCount.withRunningAgg(
      tagged, when(col("__tag") === 0, 1L).otherwise(0L),
      graft.ops.RunningCount.Kind.Sum,
      Seq(col("__v"), col("__tag"), col("__id")), "__n_le")
    val nRef = ref.filter(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("n_ref"))
    val ranked = counted.filter(col("__tag") === 1)
      .select(col("__id").as(idCol), col("__v").as(valueCol),
        coalesce(col("__n_le"), lit(0L)).cast("long").as("n_le"))
      .crossJoin(broadcast(nRef))
    val nullRows = df.filter(col(valueCol).isNull)
      .select(col(idCol), v.as(valueCol),
        lit(null).cast("long").as("n_le"))
      .crossJoin(broadcast(nRef))
    ranked.unionByName(nullRows)
  }

  /** Per-group MODE with a DETERMINISTIC tiebreak (smallest value wins) —
    * engines disagree on tied modes (Spark's `mode` picks arbitrarily
    * unless asked, SQL MODE() is implementation-defined), so the portable
    * form is counts + rank: one (group, value) partial-agg shuffle, then
    * a per-group top-1 window over DISTINCT-VALUE rows (map-side
    * WindowGroupLimit; the window never sees raw data — the
    * exactQuantilesDistributed histogram discipline). Nulls excluded. */
  def modePerGroup(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumnRenamed(valueCol, "mode")
  }

  /** Distributed SKYLINE (Pareto frontier) over maximized criteria — the
    * multi-objective data-selection shape ("docs not dominated on
    * quality × rarity × length"): a row survives iff no other row is >=
    * on every criterion and > on at least one. Ties/duplicate points all
    * survive (neither dominates).
    *
    * Scale shape: the classic two-phase skyline — a per-partition local
    * dominance filter first (mapPartitions; the skyline of a union equals
    * the skyline of the union of local skylines, so partitioning cannot
    * change the result), then the final filter over the UNION OF LOCAL
    * SKYLINES in one task. Correct at any input size; the single final
    * task bounds throughput by Σ|local skylines| — skylines over
    * anti-correlated criteria can be large, so `maxCandidates` fails fast
    * (loudly, not OOM) when the candidate set exceeds it; raising
    * dimensions raises skyline size, the known skyline trade. Null
    * criteria rows are excluded (dominance is undefined on null). */
  def skyline(
      df: DataFrame,
      criteria: Seq[String],
      maxCandidates: Int = 1000000): DataFrame = {
    require(criteria.nonEmpty, "need at least one criterion")
    require(maxCandidates >= 1, s"maxCandidates must be >= 1: $maxCandidates")
    val idxs = criteria.map(df.schema.fieldIndex)
    val clean = df.filter(criteria.map(col(_).isNotNull).reduce(_ && _))
    def dominates(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Boolean = {
      // a dominates b: >= everywhere, > somewhere (numeric widening-safe)
      var ge = true; var gt = false
      idxs.foreach { i =>
        val x = a.get(i) match { case n: Number => n.doubleValue }
        val y = b.get(i) match { case n: Number => n.doubleValue }
        if (x < y) ge = false
        if (x > y) gt = true
      }
      ge && gt
    }
    def localSkyline(it: Iterator[org.apache.spark.sql.Row]) = {
      val keep = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      it.foreach { r =>
        if (!keep.exists(k => dominates(k, r))) {
          keep.filterInPlace(k => !dominates(r, k))
          keep += r
        }
      }
      keep.iterator
    }
    val enc = org.apache.spark.sql.Encoders.row(clean.schema)
    val local = clean.mapPartitions(localSkyline)(enc)
    val candidates = local.repartition(1)
    candidates.mapPartitions { it =>
      val rows = it.toVector
      require(rows.size <= maxCandidates,
        s"skyline candidate set ${rows.size} exceeds maxCandidates " +
          s"$maxCandidates — anti-correlated criteria; raise the cap or cut dims")
      localSkyline(rows.iterator)
    }(enc)
  }

  /** QUANTILE NORMALIZATION against a reference corpus — distribution
    * matching: each row's value is replaced by the reference value at the
    * SAME percentile, so the batch's distribution becomes the
    * reference's (the cross-source score calibration trick: source B's
    * "0.8 quality" maps to whatever value sits at B's-0.8's percentile in
    * the reference). Percentile p = (rank−1)/(n−1) within the BATCH
    * (average-free dense ranking by (value, id) — deterministic under
    * ties), and the target is the reference's percentile-interpolated
    * value at p: lower/upper reference order statistics joined by
    * POSITION and combined with `percentile`'s exact formula.
    *
    * Scale shape: three prefix-machinery passes and two pos-keyed joins —
    * batch ranks (two-phase prefix count), reference order statistics
    * (ditto), then each row's floor/ceil reference positions resolve via
    * joins against the (pos, value) reference table; n's broadcast as
    * one-row frames. No driver-side sorted arrays, no quantile-table
    * resolution loss — FULL-resolution mapping at any reference size.
    * Nulls pass through null; a 1-row batch maps to the reference
    * minimum (p = 0 by convention); an EMPTY reference yields no mapped
    * rows (normalizing onto nothing is undefined). With `groupCols`,
    * ranks and n are WITHIN-GROUP (each source calibrated independently
    * onto the shared reference) — computed from the global prefix count
    * over (group, value, id) order minus broadcast per-group offsets, so
    * no per-group data-sized window ever forms. */
  def quantileNormalizeAgainst(
      df: DataFrame,
      ref: DataFrame,
      valueCol: String,
      idCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol).cast("double")
    val gcols = groupCols.map(col)
    // WITHIN-GROUP ranks without per-group windows: the GLOBAL prefix
    // count over (group..., value, id) order, minus each group's broadcast
    // offset (its min global rank) — per-source calibration stays on the
    // distributed machinery even when one source is 90% of the corpus.
    val ranked0 = graft.ops.RunningCount.withRunningCount(
      df.filter(col(valueCol).isNotNull)
        .select(gcols :+ col(idCol).as("__id") :+ v.as("__v"): _*),
      gcols ++ Seq(col("__v"), col("__id")), "__grank")
    val (ranked, nDfJoin) =
      if (groupCols.isEmpty)
        (ranked0.withColumnRenamed("__grank", "__rank")
           .crossJoin(broadcast(
             df.filter(col(valueCol).isNotNull).agg(count(lit(1)).as("__n")))),
         ())
      else {
        val stats = ranked0.groupBy(gcols: _*)
          .agg(min(col("__grank")).as("__off"), count(lit(1)).as("__n"))
        (joinGroupStats(ranked0, stats, groupCols)
           .withColumn("__rank", col("__grank") - col("__off") + 1)
           .drop("__grank", "__off"),
         ())
      }
    val refPos = graft.ops.RunningCount.withRunningCount(
      ref.filter(col(valueCol).isNotNull).select(v.as("__rv")),
      Seq(col("__rv"), monotonically_increasing_id()), "__pos")
    val nRef = ref.filter(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("__m"))
    val withP = ranked.crossJoin(broadcast(nRef))
      .withColumn("__p", when(col("__n") === 1, lit(0.0))
        .otherwise((col("__rank") - 1).cast("double") / (col("__n") - 1)))
      .withColumn("__pos", (col("__m") - 1).cast("double") * col("__p"))
      .withColumn("__lo", floor(col("__pos")).cast("long") + 1)
      .withColumn("__hi", ceil(col("__pos")).cast("long") + 1)
    val lo = refPos.select(col("__pos").as("__lo"), col("__rv").as("__vlo"))
    val hi = refPos.select(col("__pos").as("__hi"), col("__rv").as("__vhi"))
    val mapped = withP.join(lo, Seq("__lo")).join(hi, Seq("__hi"))
      // percentile's exact interpolation; degenerate cases -> lower
      .withColumn("__mapped",
        when(col("__hi") === col("__lo") || col("__vhi") <=> col("__vlo"),
          col("__vlo"))
          .otherwise((col("__hi") - 1 - col("__pos")) * col("__vlo") +
            (col("__pos") - (col("__lo") - 1)) * col("__vhi")))
      .select(gcols :+ col("__id").as(idCol) :+ col("__v").as(valueCol) :+
        col("__mapped").as("mapped"): _*)
    val nulls = df.filter(col(valueCol).isNull)
      .select(gcols :+ col(idCol) :+ v.as(valueCol) :+
        lit(null).cast("double").as("mapped"): _*)
    mapped.unionByName(nulls)
  }

  /** Vocabulary coverage curve: the corpus's tokens ranked by frequency
    * with an exact running occurrence total — the table a tokenizer/vocab
    * design reads ("how many token occurrences do the top-k terms
    * cover"; coverage fraction = cum_freq / total, one division away from
    * the exact integers under the gate). `topK` bounds the output, NOT
    * the computation: the full vocab table ranks distributed.
    *
    * Scale shape: explode → vocab-sized partial-combined frequency agg
    * (the ONE data-sized shuffle — occurrences collapse map-side), then
    * the two-phase distributed prefix sum over the (freq desc, term)
    * total order on the VOCAB table ([[graft.ops.RunningCount]]
    * machinery — no single-task global sort even for billion-term
    * vocabularies), and a rank filter. Total occurrences ride a one-row
    * broadcast. */
  def vocabCoverage(
      docs: DataFrame,
      topK: Int = 1000,
      textCol: String = "text"): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val freq = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).cast("long").as("total"))
    // rank AND cumulative total in ONE two-phase pass (shared bucketing,
    // one window, one offsets rollup) — two sequential calls would each
    // pay the full shuffle + sort over the vocab table
    val pos = graft.ops.RunningCount.withRunningAggs(
      freq,
      Seq((col("freq"), graft.ops.RunningCount.Kind.Sum, "cum_freq"),
        (lit(1L), graft.ops.RunningCount.Kind.Count, "rnk")),
      Seq(col("freq").desc, col("term")))
    pos.filter(col("rnk") <= topK)
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("term"), col("freq"),
        col("cum_freq").cast("long").as("cum_freq"), col("total"))
  }

  /** Ingest-time twin of [[standardize]]: z-score a NEW batch against a
    * STATIC reference corpus's statistics — the drift check a pipeline
    * runs on every arriving crawl ("how far is this batch's length/quality
    * distribution from the corpus we trained on"). Same exact-integer
    * formula, but S/Q/n aggregate over `corpus` once and never move again,
    * so the identical plan runs STREAM-STATIC for ingest scoring (the
    * [[bigramRarityAgainstCorpus]] pattern; StreamingSpec pins parity).
    * Groups absent from the corpus score null rather than dropping (left
    * join) — an unseen group is a signal the caller must see, not a row to
    * lose. A zero-variance corpus group scores 0 like [[standardize]]. */
  def standardizeAgainstCorpus(
      df: DataFrame,
      corpus: DataFrame,
      valueCol: String,
      groupCols: Seq[String] = Nil,
      outputCol: String = "z"): DataFrame = {
    val v = col(valueCol)
    val cv = col(valueCol)
    val aggs = Seq(count(cv).as("__graft_n"), sum(cv).as("__graft_s"),
      sum(cv * cv).as("__graft_q"))
    val stats =
      if (groupCols.isEmpty) corpus.agg(aggs.head, aggs.tail: _*)
      else corpus.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val num = col("__graft_n") * v - col("__graft_s")
    val den2 = col("__graft_n") * col("__graft_q") - col("__graft_s") * col("__graft_s")
    joinGroupStats(df, stats, groupCols, joinType = "left")
      .withColumn(outputCol,
        when(v.isNull || col("__graft_n").isNull, lit(null).cast("double"))
          .when(den2 === 0, lit(0.0))
          .otherwise(num.cast("double") / sqrt(den2.cast("double"))))
      .drop("__graft_n", "__graft_s", "__graft_q")
  }

  /** Exactly `n` rows per group, drawn uniformly but DETERMINISTICALLY:
    * rank rows inside each group by the salted md5 of their id (id
    * tiebreak for absolute determinism) and keep the first `n` — the
    * stratified-sample step ("exactly 10k eval docs per language") that
    * [[sampleFraction]]'s Bernoulli form can't promise. Reruns, engines
    * and partitionings agree row by row; distinct salts draw independent
    * samples. One keyed shuffle (the per-group window); groups smaller
    * than `n` keep everything. Same hot-key caveat as every per-key
    * total-order op — a group's rows rank in one task
    * ([[graft.ops.Skew.dropHotKeys]] is the guard). */
  def sampleNPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      n: Int,
      salt: String = "stratified"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(n >= 1, s"n must be >= 1: $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":" + salt))).asc,
        col(idCol).asc)
    df.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= n)
      .drop("__graft_rk")
  }

  /** Keep the top `k` rows per group by `rankBy` (descending; ties broken by
    * `tieBy` ascending for determinism) — the quality-selection step ("best
    * k documents per source"). One keyed shuffle; each group ranks
    * independently, so it scales with group count, not corpus size. For
    * heavy single groups at extreme scale, pre-filter with an approximate
    * per-group threshold before the exact window. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      rankBy: Column,
      tieBy: Column,
      k: Int,
      rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(rankBy.desc, tieBy.asc)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Mixture accounting: document and (estimated) token counts per group —
    * the numbers a data-mixture weighting step consumes. Partial aggregation
    * means only one tiny (groups-sized) shuffle at any scale. */
  def tokenBudget(
      docs: DataFrame,
      groupCols: Seq[Column],
      textCol: String = "text"): DataFrame =
    docs.groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.bpeTokenEstimate(col(textCol)).cast("long")).as("n_tokens"))

  /** Split long documents into fixed-size token windows with `overlap`
    * tokens of context carried between consecutive chunks — the
    * context-window chunking step every pretraining/RAG pipeline runs.
    * Pure per-row generator (posexplode over the chunk starts + an array
    * slice): scan-bound, zero shuffles, output rows ∝ total tokens /
    * stride. A document shorter than `maxTokens` yields itself as chunk 0.
    * Chunk starts step by `maxTokens - overlap` and stop once a start
    * would add no NEW tokens (a tail of `overlap` or fewer leftover tokens
    * is already covered by the previous chunk — emitting it would ship
    * duplicate training tokens); the final chunk may be shorter (no
    * padding — the packer downstream owns that). */
  def chunkDocuments(
      docs: DataFrame,
      maxTokens: Int,
      overlap: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap")
    val step = maxTokens - overlap
    // null text behaves like empty text (one chunk, n_tokens 0) — the
    // null-in → empty-out convention the sibling text ops follow; without
    // the coalesce, size(null) = NULL would feed a NULL n_tokens into
    // downstream packSequences prefix sums
    val toks = coalesce(TextFunctions.tokens(col(textCol)),
      array().cast("array<string>"))
    // carryCols ride along unchanged (replicated onto every chunk of their
    // document) — e.g. the event-time column a streaming caller needs for
    // its watermark, or a source/split label the packer groups by
    docs
      .withColumn("__toks", toks)
      .select(col(idCol) +: carryCols.map(col) :+ posexplode(
        sequence(lit(0), greatest(size(col("__toks")) - overlap - 1, lit(0)), lit(step)))
        .as(Seq("chunk_idx", "__start")) :+ col("__toks"): _*)
      .select(col(idCol) +: carryCols.map(col) :+
        col("chunk_idx").cast("long").as("chunk_idx") :+
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(maxTokens)))
          .as("chunk") :+
        size(slice(col("__toks"), col("__start") + 1, lit(maxTokens)))
          .cast("long").as("n_tokens"): _*)
  }

  /** Deterministic global shuffle order: every row gets its position in the
    * md5(id) order — the corpus-wide randomization pass before training,
    * reproducible across reruns/engines (no RNG state). Built on the same
    * two-phase distributed prefix machinery as [[packSequences]]: a global
    * `row_number()` window would funnel 100 TB through one reducer; this
    * range-partitions on the hash and composes bucket offsets instead. */
  def withShuffleOrder(
      df: DataFrame,
      idCol: String,
      outputCol: String = "pos"): DataFrame =
    graft.ops.RunningCount.withRunningCount(
      df, Seq(md5(col(idCol).cast("string"))), outputCol)

  /** Exactly `n` rows GLOBALLY, drawn uniformly and DETERMINISTICALLY — the
    * corpus-level twin of [[sampleNPerGroup]] ("exactly 100k eval docs from
    * the whole corpus"). Rank is the salted md5 of the id (id tiebreak),
    * realized through the two-phase distributed prefix count
    * ([[graft.ops.RunningCount.withRunningCount]]) rather than a window:
    * `sampleNPerGroup` with a constant group key would funnel the WHOLE
    * corpus through one task's sort, while this global total order
    * range-buckets on the hash and composes bucket offsets — the same
    * machinery as [[withShuffleOrder]], so it holds on a 1000-executor
    * cluster. Deterministic, partition-invariant, engine-portable (the
    * oracle ranks by the same md5 hex); distinct salts draw independent
    * samples; corpora smaller than `n` keep everything. */
  def sampleNGlobal(
      df: DataFrame,
      idCol: String,
      n: Long,
      salt: String = "global-n"): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val pos = "__graft_gpos"
    graft.ops.RunningCount.withRunningCount(df,
      Seq(md5(concat(col(idCol).cast("string"), lit(":" + salt))), col(idCol)), pos)
      .filter(col(pos) <= n).drop(pos)
  }

  /** Exactly-`n` WEIGHTED sample without replacement, deterministic — the
    * Efraimidis–Spiliotis A-Res scheme with the randomness replaced by the
    * salted-md5 uniform: key_i = u_i^(1/w_i), the global top-n keys win.
    * Inclusion probability is proportional to weight (successively,
    * without replacement), yet membership is a pure function of (id, salt,
    * weights) — rerun/partitioning-stable like every sampler here.
    * Rows with null or non-positive weight never qualify.
    *
    * Scale shape: the key is a per-row scan expression; orderBy+limit
    * plans TakeOrderedAndProject (per-partition heaps of n, one n-row
    * merge — no global sort, no window). n is driver-merge-sized by
    * construction; for corpus-sized n use [[sampleNGlobal]]'s prefix-count
    * machinery with a weight-bucketed order key instead. */
  def sampleNWeightedGlobal(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      salt: String = "wres"): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val key = "__graft_wkey"
    val u = conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))),
      1, 15), 16, 10).cast("long").cast("double") / lit(1152921504606846976.0)
    df.filter(col(weightCol).isNotNull && col(weightCol).cast("double") > 0.0)
      .withColumn(key, pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col(key).desc, col(idCol).asc)
      .limit(n)
      .drop(key)
  }

  /** Length-bucketed batch assignment — the padding-efficiency step before
    * batched inference / packed training: docs are bucketed by token count
    * (ascending `boundaries`; bucket = #(bounds <= len) via the codegen'd
    * [[graft.functions.BucketIndex]] binary search), then batched
    * `batchSize` docs at a time WITHIN each bucket in deterministic
    * salted-md5 order, so every batch pads to its bucket's ceiling instead
    * of the corpus maximum. Emits `len_bucket` and a globally unique
    * `batch_id` = bucket · 2⁴⁰ + in-bucket batch index.
    *
    * Scale shape: bucketing is a per-row scan expression; the in-bucket
    * index comes from ONE global two-phase prefix count ordered by
    * (bucket, salted-md5) — the order key is the fixed-width concat of the
    * zero-padded bucket and the md5 hex, so the range bucketing splits
    * INSIDE large buckets rather than funneling each bucket through one
    * task (the naive per-bucket window's hot-key failure: a corpus with 8
    * length buckets would run on 8 tasks). Per-bucket positions are then
    * the global position minus the bucket's broadcast min — a B-row
    * aggregate join, zero data-sized shuffles beyond the prefix count's. */
  def lengthBucketBatches(
      df: DataFrame,
      tokenCol: Column,
      idCol: String,
      boundaries: Seq[Double],
      batchSize: Int,
      salt: String = "batch",
      bucketCol: String = "len_bucket",
      batchCol: String = "batch_id"): DataFrame = {
    require(boundaries.nonEmpty, "need at least one bucket boundary")
    require(boundaries == boundaries.sorted, s"boundaries must ascend: $boundaries")
    require(boundaries.size < 10000, "bucket space is padded to 4 digits")
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    import org.apache.spark.sql.GraftExpr
    import graft.functions.BucketIndex
    val pos = "__graft_gpos"
    val off = "__graft_boff"
    val bucketed = df.withColumn(bucketCol, GraftExpr.column(BucketIndex(
      GraftExpr.expression(tokenCol.cast("double")),
      GraftExpr.expression(array(boundaries.map(lit): _*)),
      descending = false, nullsFirst = true)))
    val counted = graft.ops.RunningCount.withRunningCount(bucketed,
      Seq(concat(lpad(col(bucketCol).cast("string"), 4, "0"),
          md5(concat(col(idCol).cast("string"), lit(":" + salt)))),
        col(idCol)), pos)
    val offsets = counted.groupBy(bucketCol).agg(min(col(pos)).as(off))
    counted.join(broadcast(offsets), Seq(bucketCol))
      .withColumn(batchCol,
        col(bucketCol).cast("long") * (1L << 40) +
          expr(s"($pos - $off) div ${batchSize}L"))
      .drop(pos, off)
  }

  /** Per-group distinctive vocabulary: for each group (source, language,
    * shard…), the top-k terms ranked "rare across groups, frequent within"
    * — order (group-df asc, tf desc, term asc), ALL integer keys, so the
    * ranking is deterministic and engine-portable with no tf-idf float in
    * sight (callers wanting a score form ln(S/df)·tf from the emitted
    * integers). df = number of GROUPS containing the term; df = 1 marks
    * vocabulary unique to the group — the c-TF-IDF-style signal that
    * characterizes what a source is about.
    *
    * Scale shape: one (group, term) partial-combined agg (vocab-sized
    * output), a term-keyed df agg + join back (both vocab-sized — document
    * text is long gone), then a per-group window over that group's vocab
    * rows only. */
  def distinctiveTerms(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val tf = docs
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy("grp", "term").agg(count(lit(1)).as("tf"))
    val dfAcross = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("df").asc, col("tf").desc, col("term").asc)
    tf.join(dfAcross, Seq("term"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("grp").as(groupCol), col("term"), col("tf"), col("df"),
        col("rank"))
  }

  /** Sketch-based corpus set algebra: |A|, |B|, |A∩B|, |A∖B|, |B∖A|, |A∪B|
    * of a key column across two corpora — WITHOUT any join. Theta sketches
    * (Apache DataSketches, Spark built-ins) are mergeable AND closed under
    * intersection/difference, which HLL is not; each side collapses to one
    * ≤ 8·2^lgk-byte sketch (partial-merged map-side), and the whole set
    * algebra then runs on two binaries. EXACT while each side's distinct
    * count stays under ~2^lgk (the sketch retains raw hashes until then —
    * the oracle gate runs in that regime); past it, estimates with
    * ~1/√2^lgk relative error. This is the 100 TB planning query — "how
    * much does crawl B add over what we have?" — at metadata cost: no
    * shuffle ever carries more than sketch bytes. */
  def corpusOverlap(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      lgk: Int = 20): DataFrame = {
    require(lgk >= 4 && lgk <= 26, s"lgk out of [4,26]: $lgk")
    val sa = a.agg(theta_sketch_agg(col(keyCol), lgk).as("__ska"))
    val sb = b.agg(theta_sketch_agg(col(keyCol), lgk).as("__skb"))
    sa.crossJoin(sb).select(
      theta_sketch_estimate(col("__ska")).cast("long").as("n_a"),
      theta_sketch_estimate(col("__skb")).cast("long").as("n_b"),
      theta_sketch_estimate(theta_intersection(col("__ska"), col("__skb")))
        .cast("long").as("n_common"),
      theta_sketch_estimate(theta_difference(col("__ska"), col("__skb")))
        .cast("long").as("n_only_a"),
      theta_sketch_estimate(theta_difference(col("__skb"), col("__ska")))
        .cast("long").as("n_only_b"),
      theta_sketch_estimate(theta_union(col("__ska"), col("__skb"), lgk))
        .cast("long").as("n_union"))
  }

  /** Per-group MERGEABLE distinct-count profiles: one row per group with
    * the row count and an HLL sketch binary per column. The incremental
    * twin of [[profileWithApprox]]: sketches union losslessly
    * ([[mergeSketchProfiles]]), so per-shard / per-day profiles maintain
    * corpus-wide stats WITHOUT rescanning history — the only viable stats
    * discipline at 100 TB ingest. lgConfigK 12 ≈ 1.6% relative error at
    * 4 KB per (group, column). */
  def sketchProfiles(
      df: DataFrame,
      groupCols: Seq[String],
      cols: Seq[String],
      lgConfigK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "need at least one column to sketch")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => hll_sketch_agg(col(c), lgConfigK).as(s"${c}_sketch"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Union per-group sketch profiles to corpus-wide estimates: total rows
    * plus an HLL distinct estimate per sketched column. Union is exact
    * over the sketch state — merging shard profiles gives byte-identical
    * estimates to sketching the union directly (spec-pinned), which is
    * the property that makes incremental maintenance sound. */
  def mergeSketchProfiles(profiles: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one sketched column")
    val aggs = sum(col("n_rows")).as("n_rows") +:
      cols.map(c => hll_sketch_estimate(hll_union_agg(col(s"${c}_sketch")))
        .as(s"${c}_distinct_est"))
    profiles.agg(aggs.head, aggs.tail: _*)
  }

  /** Population Stability Index between a reference distribution and the
    * current batch — the standard ingest-drift gate (PSI < 0.1 stable,
    * 0.1-0.25 drifting, > 0.25 investigate): bin edges from the
    * REFERENCE's own quantiles, both sides histogrammed into those bins,
    * psi_term = (p_cur − p_ref)·ln(p_cur / p_ref) per bin. Output is one
    * row per bin (all `bins` bins present, empty ones at count 0) with
    * counts, smoothed proportions, and the PSI term; total PSI is
    * `sum(psi_term)`, one trivial agg away. Laplace smoothing (+0.5 per
    * bin) keeps ln finite when a bin empties on one side — an empty bin IS
    * the drift signal, not an error.
    *
    * Scale shape: two full scans (edges from ref, then each side's
    * histogram), each collapsing map-side to ≤ `bins` partials before a
    * bins-sized shuffle; the one-row edges frame rides broadcast. Nothing
    * data-sized moves. `approx = true` swaps exact percentile edges for
    * the bounded-state sketch (the 100 TB default; exact is the oracle
    * path). Null values count on neither side. Bin rule: bin(v) = #edges
    * strictly below v, so a value equal to an edge falls in the LOWER
    * bin. */
  def populationStability(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      bins: Int = 10,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val probsArr = array((1 until bins).map(k => lit(k.toDouble / bins)): _*)
    val v = col(valueCol).cast("double")
    val edgesDf = ref.agg(
      (if (approx) percentile_approx(v, probsArr, lit(accuracy))
       else percentile(v, probsArr)).as("__edges"))
    def histogram(df: DataFrame, out: String) =
      df.select(v.as("__v")).where(col("__v").isNotNull)
        .crossJoin(broadcast(edgesDf))
        .select(size(filter(col("__edges"), e => col("__v") > e))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(out))
    val joined = edgesDf
      .select(explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
      .join(histogram(ref, "__nr"), Seq("bin"), "left")
      .join(histogram(cur, "__nc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    // Totals via an unpartitioned window: the frame is exactly `bins` rows
    // at any data scale, so the single-partition window is constant work.
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pRef = (col("n_ref") + lit(0.5)) / (sum(col("n_ref")).over(w) + lit(0.5 * bins))
    val pCur = (col("n_cur") + lit(0.5)) / (sum(col("n_cur")).over(w) + lit(0.5 * bins))
    joined
      .withColumn("p_ref", pRef)
      .withColumn("p_cur", pCur)
      // round(12): ln is the one non-arithmetic primitive here, and libm vs
      // JVM log differ by 1 ulp on some inputs — the counts and smoothed
      // proportions stay bit-exact; only the final term is clipped to 12
      // decimals (PSI thresholds live at the second decimal).
      .withColumn("psi_term",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 12))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the distribution-drift
    * test [[populationStability]]'s binned PSI coarsens away: D is the
    * maximum ECDF gap sup|F_A − F_B|, here as the exact INTEGER numerator
    * `d_num = max |cumA·n_B − cumB·n_A|` over distinct values (cross-
    * multiplication, no division until the final readout — the A/B chi-
    * square discipline), so the decision hash-gates on any engine; the
    * `d` double is a single IEEE division of exact integers. `isB`
    * partitions the frame into sample A (false) and B (true); nulls count
    * on neither side. Either side empty fails fast — there is no
    * two-sample test to run.
    *
    * Scale shape: ONE (value)-keyed partial agg collapses the data to the
    * distinct-value histogram carrying both sides' counts; the cumulative
    * sums run over HISTOGRAM rows via the two-phase distributed prefix
    * machinery ([[graft.ops.RunningCount.withRunningAggs]] — both sums in
    * one pass, never a single-partition window over raw data); the max is
    * a 1-row agg. Ties are exact: aggregating per distinct value evaluates
    * the ECDF gap exactly at each step of both step functions. */
  def ksStatistic(
      df: DataFrame,
      valueCol: String,
      isB: Column): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"), isB.as("__b"))
      .groupBy("__v")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).cast("long").as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).cast("long").as("__cb"))
    val cum = graft.ops.RunningCount.withRunningAggs(counts,
      Seq((col("__ca"), graft.ops.RunningCount.Kind.Sum, "__cuma"),
        (col("__cb"), graft.ops.RunningCount.Kind.Sum, "__cumb")),
      Seq(col("__v")))
    val tot = counts.agg(
      sum(col("__ca")).cast("long").as("n_a"),
      sum(col("__cb")).cast("long").as("n_b"))
    // empty-side fail-fast rides IN-PLAN on the 1-row totals (the
    // perplexity scorers' raise_error convention — no construction-time job)
    val nA = when(col("n_a") > 0, col("n_a")).otherwise(raise_error(
      lit("ksStatistic: sample A is empty — no two-sample test to run"))
      .cast("long"))
    val nB = when(col("n_b") > 0, col("n_b")).otherwise(raise_error(
      lit("ksStatistic: sample B is empty — no two-sample test to run"))
      .cast("long"))
    cum.crossJoin(broadcast(tot))
      .select(abs(col("__cuma") * nB - col("__cumb") * nA).as("__dn"),
        col("n_a"), col("n_b"))
      .groupBy("n_a", "n_b")
      .agg(max(col("__dn")).cast("long").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("d"))
  }

  /** Wasserstein-1 (earth-mover's) distance between two numeric samples —
    * the MAGNITUDE member of the drift family: [[ksStatistic]] reads the
    * worst ECDF gap (shape, unitless), W₁ = ∫|F_A − F_B| dv reads the
    * AREA between the ECDFs — "how far, in the column's own units, would
    * mass have to move", which is what a threshold on numeric drift
    * should be denominated in.
    *
    * Engine-portable arithmetic: over the sorted distinct-value histogram
    * the integral is Σᵢ |F_A(vᵢ) − F_B(vᵢ)|·(vᵢ₊₁ − vᵢ); the ECDF gap
    * numerator |cumaᵢ·n_b − cumbᵢ·n_a| is an exact integer (the KS
    * machinery), and each GAP is quantized to the 2⁻²⁰ grid —
    * `floor((vᵢ₊₁ − vᵢ)·2²⁰ + ½)`, exact because the ×2²⁰ is a
    * power-of-two scale and the subtraction is correctly rounded
    * identically in both engines (the [[qln]] rationale applied to
    * lengths instead of logs). Terms are then order-free DECIMAL(38,0)
    * integer products; ONE fixed-order double division reads out
    * w1 = s_w1/(n_a·n_b·2²⁰). DECIMAL(38) bound: |D|·gapQ ≤
    * n_a·n_b·range·2²⁰ — comfortably inside 38 digits to ~10⁹ rows per
    * side (the [[chi2Drift]] d_num convention; divide-first beyond).
    *
    * Scale shape: the value-keyed partial agg + the [[ksStatistic]]
    * two-phase prefix machinery, then ONE rank-keyed self-join (rank →
    * rank+1) to pair each distinct value with its successor — no global
    * window, no driver-side anything; the last value has no successor and
    * correctly contributes no gap. */
  def wasserstein1(
      df: DataFrame,
      valueCol: String,
      isB: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"), isB.as("__b"))
      .groupBy("__v")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).cast("long").as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).cast("long").as("__cb"))
    val cum = graft.ops.RunningCount.withRunningAggs(counts,
      Seq((col("__ca"), graft.ops.RunningCount.Kind.Sum, "__cuma"),
        (col("__cb"), graft.ops.RunningCount.Kind.Sum, "__cumb"),
        (lit(1L), graft.ops.RunningCount.Kind.Sum, "__r")),
      Seq(col("__v")))
    val nxt = cum.select((col("__r") - 1L).as("__r"), col("__v").as("__vn"))
    val tot = counts.agg(
      sum(col("__ca")).cast("long").as("n_a"),
      sum(col("__cb")).cast("long").as("n_b"))
    val nA = when(col("n_a") > 0, col("n_a")).otherwise(raise_error(
      lit("wasserstein1: sample A is empty — no two-sample distance"))
      .cast("long"))
    val nB = when(col("n_b") > 0, col("n_b")).otherwise(raise_error(
      lit("wasserstein1: sample B is empty — no two-sample distance"))
      .cast("long"))
    val gapQ = floor((col("__vn") - col("__v")) * lit(1048576.0) + lit(0.5))
      .cast("long")
    cum.join(nxt, "__r")
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (dec(abs(col("__cuma") * nB - col("__cumb") * nA)) * dec(gapQ))
          .as("__t"))
      .groupBy("n_a", "n_b")
      .agg(sum(col("__t")).cast("decimal(38,0)").as("s_w1"))
      .select(col("n_a"), col("n_b"), col("s_w1"),
        (col("s_w1").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            lit(1048576.0))).as("w1"))
  }

  /** EXACT Mann–Whitney U (Wilcoxon rank-sum) — the rank-based two-sample
    * location test on the same histogram + prefix machinery as
    * [[ksStatistic]] (KS asks "same distribution?", U asks "is one
    * stochastically larger?"). Ties take AVERAGE ranks; to stay in exact
    * integers everything is DOUBLED: for a distinct value with counts
    * (ca, cb) and `c0` items strictly below, the doubled rank-sum
    * contribution of side A is `ca·(2·c0 + ca + cb + 1)` (each of the ca
    * items takes the doubled average rank), so
    * `u2_a = 2·R_A − n_a·(n_a+1)` is an exact integer =
    * 2·U_A, and u2_b = 2·n_a·n_b − u2_a by the U-sum identity. The
    * normal-approximation z (or the exact table) is the caller's one
    * division away; both doubled statistics hash-gate. Nulls count on
    * neither side; an empty side fails fast in-plan. */
  def mannWhitneyU(
      df: DataFrame,
      valueCol: String,
      isB: Column): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"), isB.as("__b"))
      .groupBy("__v")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).cast("long").as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).cast("long").as("__cb"))
    val cum = graft.ops.RunningCount.withRunningAggs(counts,
      Seq((col("__ca") + col("__cb"),
        graft.ops.RunningCount.Kind.Sum, "__cumab")),
      Seq(col("__v")))
    val tot = counts.agg(
      sum(col("__ca")).cast("long").as("n_a"),
      sum(col("__cb")).cast("long").as("n_b"))
    val nA = when(col("n_a") > 0, col("n_a")).otherwise(raise_error(
      lit("mannWhitneyU: sample A is empty — no two-sample test to run"))
      .cast("long"))
    val nB = when(col("n_b") > 0, col("n_b")).otherwise(raise_error(
      lit("mannWhitneyU: sample B is empty — no two-sample test to run"))
      .cast("long"))
    val c0 = col("__cumab") - col("__ca") - col("__cb")
    cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (col("__ca") * (lit(2L) * c0 + col("__ca") + col("__cb") + lit(1L)))
          .as("__r2a"))
      .groupBy("n_a", "n_b")
      .agg(sum(col("__r2a")).cast("long").as("__r2"))
      .select(col("n_a"), col("n_b"),
        (col("__r2") - nA * (nA + lit(1L))).as("u2_a"),
        (lit(2L) * nA * nB - (col("__r2") - nA * (nA + lit(1L))))
          .as("u2_b"))
  }

  /** EXACT χ² two-sample homogeneity test over a CATEGORICAL column — the
    * member that completes the drift family (PSI = binned numeric,
    * KS/MWU = unbinned numeric; a categorical column has no ordering for
    * either). For category c with observed counts (o_a, o_b), totals
    * (N_a, N_b), N = N_a+N_b, m = o_a+o_b, the two expected-deviation
    * terms collapse algebraically to ONE fraction:
    * (o_a−e_a)²/e_a + (o_b−e_b)²/e_b = (D/N)²·(N/(N_a·m) + N/(N_b·m))
    * = `term_c = D² / (N_a·N_b·m)` with the exact integer
    * D = o_a·N − N_a·m (both sides' deviations share |D|: o_b·N − N_b·m
    * = −D identically). So each per-category term is a SINGLE division of
    * exact integers — d_num = D fits a long to N ≈ 3·10⁹ rows, D² and the
    * denominator ride DECIMAL(38,0) — and the total χ² sums those doubles
    * in ONE FIXED ORDER (sort_array + left-fold `aggregate`, the
    * list_sum-ordered-by oracle idiom), so the whole readout hash-gates
    * cross-engine. Dof = (#categories − 1)·(2 − 1). Nulls count on
    * neither side; an empty side fails fast in-plan (the [[ksStatistic]]
    * convention).
    *
    * Scale shape: ONE category-keyed partial agg collapses the data to
    * the category histogram carrying both sides' counts; the fold runs
    * over |categories| rows collected into a single array (drift columns
    * are low-cardinality by construction — language, source, label; for
    * an unbounded column, bucket first). Output: one row per category
    * (category, o_a, o_b, d_num, term) with the shared (chi2, dof,
    * cramers_v) broadcast onto every row — the abLift readout shape.
    * Cramér's V = √(χ²/(N·min(r−1, k−1))) = √(χ²/N) for the two-sample
    * table (r = 2): the sample-size-free effect size that makes drift
    * magnitudes comparable across corpora — one correctly-rounded sqrt,
    * still hash-exact. */
  def chi2Drift(
      df: DataFrame,
      catCol: String,
      isB: Column): DataFrame = {
    val counts = df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("category"), isB.as("__b"))
      .groupBy("category")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).cast("long").as("o_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).cast("long").as("o_b"))
    val tot = counts.agg(
      sum(col("o_a")).cast("long").as("__na"),
      sum(col("o_b")).cast("long").as("__nb"),
      count(lit(1)).cast("long").as("__k"))
    val nA = when(col("__na") > 0, col("__na")).otherwise(raise_error(
      lit("chi2Drift: sample A is empty — no two-sample test to run"))
      .cast("long"))
    val nB = when(col("__nb") > 0, col("__nb")).otherwise(raise_error(
      lit("chi2Drift: sample B is empty — no two-sample test to run"))
      .cast("long"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = col("o_a") + col("o_b")
    val dNum = col("o_a") * (nA + nB) - nA * m
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("d_num", dNum)
      .withColumn("term",
        (dec(col("d_num")) * dec(col("d_num"))).cast("double") /
          (dec(nA) * dec(nB) * dec(m)).cast("double"))
    val total = terms
      .agg(sort_array(collect_list(struct(col("category").as("c"),
        col("term").as("t")))).as("__arr"),
        max(col("__k")).as("__k"),
        max(col("__na") + col("__nb")).as("__n"))
      .select(aggregate(col("__arr"), lit(0.0),
        (acc, s) => acc + s.getField("t")).as("chi2"),
        (col("__k") - lit(1L)).as("dof"),
        col("__n"))
      .select(col("chi2"), col("dof"),
        sqrt(col("chi2") / col("__n").cast("double")).as("cramers_v"))
    terms.select(col("category"), col("o_a"), col("o_b"), col("d_num"),
        col("term"))
      .crossJoin(broadcast(total))
  }

  /** G-TEST (likelihood-ratio) two-sample homogeneity — [[chi2Drift]]'s
    * information-theoretic sibling: G = 2·Σ o·ln(o/e) over both sides'
    * categories, the additive-in-data statistic preferred when any
    * expected count is small (Pearson's χ² over-rejects there) and the
    * one that decomposes exactly across nested partitions. With
    * e_s,c = N_s·m_c/N the log collapses to a RATIO OF INTEGER PRODUCTS:
    * ln(o/e) = ln(o·N) − ln(N_s·m) — each factor 2⁻²⁰-grid-quantized
    * ([[zipfFit]] discipline), each term o·(qln(o·N) − qln(N_s·m)) an
    * exact integer, the total an ORDER-FREE DECIMAL(38,0) sum; a
    * category with identical proportions contributes EXACTLY zero
    * (o·N = N_s·m ⇒ the quantized lns are equal, not approximately so).
    * Readout G = 2·S/2²⁰ is one fixed-order double expression; 0·ln 0
    * terms are skipped exactly. Same scale shape as [[chi2Drift]]: one
    * category-keyed partial agg, a 1-row broadcast total, no windows. */
  def gTest(
      df: DataFrame,
      catCol: String,
      isB: Column): DataFrame = {
    val counts = df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("category"), isB.as("__b"))
      .groupBy("category")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).cast("long").as("o_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).cast("long").as("o_b"))
    val tot = counts.agg(
      sum(col("o_a")).cast("long").as("__na"),
      sum(col("o_b")).cast("long").as("__nb"),
      count(lit(1)).cast("long").as("__k"))
    val nA = when(col("__na") > 0, col("__na")).otherwise(raise_error(
      lit("gTest: sample A is empty — no two-sample test to run"))
      .cast("long"))
    val nB = when(col("__nb") > 0, col("__nb")).otherwise(raise_error(
      lit("gTest: sample B is empty — no two-sample test to run"))
      .cast("long"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val n = nA + nB
    val m = col("o_a") + col("o_b")
    def sideTerm(o: Column, ns: Column): Column =
      when(o > 0, dec(o) * dec(qln(dec(o) * dec(n)) - qln(dec(ns) * dec(m))))
        .otherwise(dec(lit(0L)))
    counts.crossJoin(broadcast(tot))
      .agg(sum(sideTerm(col("o_a"), nA) + sideTerm(col("o_b"), nB))
        .cast("decimal(38,0)").as("s_g"),
        max(col("__k")).as("__k"))
      .select(col("s_g"),
        (lit(2.0) * col("s_g").cast("double") / lit(1048576.0)).as("g"),
        (col("__k") - lit(1L)).as("dof"))
  }

  /** EXACT Spearman rank correlation between two numeric columns — the
    * rank-robust member of the correlation family ([[corrStats]] is
    * Pearson on raw values; Spearman is Pearson ON AVERAGE RANKS, so
    * monotone-but-nonlinear association and heavy tails stop hiding).
    * Ties take average ranks; the [[mannWhitneyU]] DOUBLING keeps them
    * exact integers: a value with `c` copies and `c0` items strictly
    * below takes doubled rank `2·c0 + c + 1`. All five moment sums over
    * (r2x, r2y) are exact DECIMAL(38,0) integers (order-free), and ρ is
    * ONE fixed-order double expression over them — hash-exact
    * cross-engine, no floating rank ever materializes.
    *
    * Scale shape: each column collapses to its distinct-value histogram
    * (one partial agg each), doubled average ranks come from the
    * two-phase prefix machinery over HISTOGRAM rows, rows re-acquire
    * their ranks via two value-keyed joins (value keys:
    * high-cardinality, never a hot partition), and the moments are one
    * partial-aggregable decimal agg. Nulls in either column drop the
    * row (complete-case, the standard convention); fewer than 2 rows
    * fail fast in-plan. */
  def spearman(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    def ranks(c: String): DataFrame = {
      val h = rows.groupBy(col(c)).agg(count(lit(1)).as("__c"))
      graft.ops.RunningCount.withRunningAggs(h,
        Seq((col("__c"), graft.ops.RunningCount.Kind.Sum, "__cum")),
        Seq(col(c)))
        .select(col(c),
          (lit(2L) * (col("__cum") - col("__c")) + col("__c") + lit(1L))
            .as(s"__r2$c"))
    }
    val ranked = rows
      .join(ranks("__x"), Seq("__x"))
      .join(ranks("__y"), Seq("__y"))
    val m = ranked.agg(
      count(lit(1)).cast("long").as("n"),
      sum(dec(col("__r2__x"))).cast("decimal(38,0)").as("sx"),
      sum(dec(col("__r2__y"))).cast("decimal(38,0)").as("sy"),
      sum(dec(col("__r2__x")) * dec(col("__r2__x"))).cast("decimal(38,0)").as("sxx"),
      sum(dec(col("__r2__y")) * dec(col("__r2__y"))).cast("decimal(38,0)").as("syy"),
      sum(dec(col("__r2__x")) * dec(col("__r2__y"))).cast("decimal(38,0)").as("sxy"))
    val nOk = when(col("n") >= 2, col("n")).otherwise(raise_error(
      lit("spearman: fewer than 2 complete rows — no correlation to compute"))
      .cast("long"))
    val nd = nOk.cast("double")
    // fixed op order; each decimal->double cast correctly rounded. A
    // zero-variance column (all ties) yields NaN (0/0) on both engines.
    m.select(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
      col("sxy"),
      ((nd * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        sqrt((nd * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
          (nd * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))))
        .as("rho"))
  }

  /** EXACT Kendall τ-b rank correlation between two DISCRETE numeric
    * columns — the pair-concordance member of the correlation family
    * ([[spearman]] correlates average ranks; τ-b counts concordant vs
    * discordant PAIRS, the statistic behind Mann–Kendall trend tests and
    * the most robust of the three to outliers). Over the (x, y)
    * contingency cells: a concordant pair lives in two cells with
    * x₂ > x₁ AND y₂ > y₁, so C = Σ n₁·n₂ over ordered cell pairs above
    * the diagonal — each unordered row pair counted exactly once — and D
    * symmetrically with y₂ < y₁. Marginal tie corrections come from the
    * marginal histograms: T_x = Σ c_x(c_x−1)/2.
    * τ_b = (C−D)/√((n₀−T_x)(n₀−T_y)) with n₀ = n(n−1)/2.
    *
    * Everything before the one √ readout is an exact DECIMAL(38,0)
    * integer, so the statistic hash-gates cross-engine. Ties-only input
    * (a constant column) nulls τ instead of ANSI-throwing.
    *
    * Scale shape: ONE (x, y)-keyed partial agg collapses the data to the
    * cell table; the C/D pass is a broadcast cell-pair join — |cells|²
    * work, which is why the PRECONDITION is discrete or pre-bucketed
    * columns (quantity × discount, grade × band; bucket continuous
    * columns first, exactly like [[chi2Drift]]'s categorical contract).
    * Marginals re-aggregate the cell table. Nothing data-sized leaves the
    * first shuffle. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__c"))
    val tot = cells.agg(sum(col("__c")).cast("long").as("__n"))
      .select(when(col("__n") > 1, col("__n")).otherwise(raise_error(
        lit("kendallTau: need at least 2 complete rows")).cast("long"))
        .as("__n"))
    // tie-pair counts ride DOUBLED (t2 = Σ c(c−1) = 2·T) — the
    // [[mannWhitneyU]] discipline: no decimal division anywhere, the /2
    // cancels in the τ readout (τ = 2(C−D)/√(den2x·den2y))
    def tiePairs2(marg: DataFrame, cnt: String): DataFrame =
      marg.select((dec(col(cnt)) * dec(col(cnt) - 1)).as("__t"))
        .agg(coalesce(sum(col("__t")), lit(0L).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__tp"))
    val tx = tiePairs2(cells.groupBy("__x")
      .agg(sum(col("__c")).as("__cx")), "__cx")
      .select(col("__tp").as("t2_x"))
    val ty = tiePairs2(cells.groupBy("__y")
      .agg(sum(col("__c")).as("__cy")), "__cy")
      .select(col("__tp").as("t2_y"))
    val c2 = cells.select(col("__x").as("__x2"), col("__y").as("__y2"),
      col("__c").as("__c2"))
    val pairs = cells.join(broadcast(c2), col("__x2") > col("__x"))
      .select((dec(col("__c")) * dec(col("__c2"))).as("__p"),
        (col("__y2") > col("__y")).as("__conc"),
        (col("__y2") < col("__y")).as("__disc"))
      .agg(coalesce(sum(when(col("__conc"), col("__p"))),
        lit(0L).cast("decimal(38,0)")).cast("decimal(38,0)").as("c_pairs"),
        coalesce(sum(when(col("__disc"), col("__p"))),
          lit(0L).cast("decimal(38,0)")).cast("decimal(38,0)").as("d_pairs"))
    val n02 = (dec(col("__n")) * dec(col("__n") - 1)).cast("decimal(38,0)")
    val den2X = n02 - col("t2_x")
    val den2Y = n02 - col("t2_y")
    pairs.crossJoin(broadcast(tot)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("__n").as("n"), col("c_pairs"), col("d_pairs"),
        col("t2_x"), col("t2_y"), n02.as("n0_2"),
        when(den2X =!= 0L && den2Y =!= 0L,
          lit(2.0) * (col("c_pairs") - col("d_pairs")).cast("double") /
            sqrt(den2X.cast("double") * den2Y.cast("double")))
          .otherwise(lit(null).cast("double")).as("tau_b"))
  }

  /** Jensen–Shannon divergence between two corpora's shingle
    * distributions — the symmetric, bounded (0 … ln 2 nats) corpus-level
    * drift readout the per-category tests don't give: "how far apart are
    * these two crawls' token distributions as WHOLES". JSD(P,Q) =
    * H(M) − (H(P)+H(Q))/2 with M = (P+Q)/2; unlike KL it is finite when
    * one side has vocabulary the other lacks (the 0·ln 0 = 0 terms are
    * skipped exactly).
    *
    * Engine-portable arithmetic (the [[zipfFit]] discipline): every ln is
    * quantized to the 2⁻²⁰ grid (`floor(ln(x)·2²⁰ + ½)` — StrictMath-vs-
    * libm ulps can't reach the hash), entropy numerators are EXACT
    * DECIMAL(38,0) sums of per-shingle integer products (order-free, so
    * no fold ordering is even needed):
    *   S_P = Σ_{ca>0} ca·(qln(ca) − qln(A)),   H(P) = −S_P/(A·2²⁰)
    *   n_i = ca·B + cb·A (M's numerator over denominator 2AB),
    *   S_M = Σ n_i·(qln(n_i) − qln(2AB)),      H(M) = −S_M/(2AB·2²⁰)
    * and the readout doubles derive in ONE FIXED op order from the exact
    * components. Empty sides fail fast in-plan ([[ksStatistic]]
    * convention).
    *
    * Scale shape: one shingle-keyed partial agg collapses both corpora to
    * the joint histogram (side totals ride a 1-row broadcast); the sums
    * are plain partial-aggregable decimal aggs — no windows, no driver
    * loops, nothing vocabulary-sized leaves the executors. */
  def jsDivergence(
      a: DataFrame,
      b: DataFrame,
      ngram: Int = 3,
      textCol: String = "text"): DataFrame = {
    val g = 1048576.0
    def qlnD(x: Column): Column =
      floor(log(x.cast("double")) * lit(g) + lit(0.5)).cast("long")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def shingles(df: DataFrame, side: Int) = df
      .select(explode(TextFunctions.shinglesNative(col(textCol), ngram)).as("sh"))
      .select(col("sh"), lit(side).as("__side"))
    val counts = shingles(a, 0).unionByName(shingles(b, 1))
      .groupBy("sh")
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).cast("long").as("cb"))
    val tot = counts.agg(
      sum(col("ca")).cast("long").as("a_total"),
      sum(col("cb")).cast("long").as("b_total"))
    val aT = when(col("a_total") > 0, col("a_total")).otherwise(raise_error(
      lit("jsDivergence: corpus A has no shingles — no divergence to compute"))
      .cast("long"))
    val bT = when(col("b_total") > 0, col("b_total")).otherwise(raise_error(
      lit("jsDivergence: corpus B has no shingles — no divergence to compute"))
      .cast("long"))
    // mixture numerator n_i = ca·B + cb·A over denominator 2AB: decimal
    // products so 100 TB-scale counts never overflow a long
    val nMix = dec(col("ca")) * dec(bT) + dec(col("cb")) * dec(aT)
    val sums = counts.crossJoin(broadcast(tot)).agg(
      sum(when(col("ca") > 0,
        dec(col("ca")) * dec(qlnD(col("ca")) - qlnD(aT))).otherwise(dec(lit(0L))))
        .cast("decimal(38,0)").as("s_p"),
      sum(when(col("cb") > 0,
        dec(col("cb")) * dec(qlnD(col("cb")) - qlnD(bT))).otherwise(dec(lit(0L))))
        .cast("decimal(38,0)").as("s_q"),
      sum(nMix * dec(qlnD(nMix) - qlnD(dec(lit(2L)) * dec(aT) * dec(bT))))
        .cast("decimal(38,0)").as("s_m"),
      max(col("a_total")).as("a_total"),
      max(col("b_total")).as("b_total"))
    // fixed double op order; each decimal->double cast correctly rounded
    val aD = col("a_total").cast("double")
    val bD = col("b_total").cast("double")
    sums
      .withColumn("h_p", -(col("s_p").cast("double") / aD) / lit(g))
      .withColumn("h_q", -(col("s_q").cast("double") / bD) / lit(g))
      .withColumn("h_m",
        -(col("s_m").cast("double") / (lit(2.0) * aD * bD)) / lit(g))
      .withColumn("jsd", col("h_m") - (col("h_p") + col("h_q")) / lit(2.0))
      .select(col("a_total"), col("b_total"), col("s_p"), col("s_q"),
        col("s_m"), col("h_p"), col("h_q"), col("h_m"), col("jsd"))
  }

  /** Exact frequency-threshold heavy hitters over a token column: every
    * token with global count >= `minCount`, with its EXACT count — the
    * vocabulary-pruning / stopword-discovery primitive. Two passes:
    *
    * 1. A per-partition MISRA-GRIES pass (k = `counters` decrement
    *    counters) produces a candidate set. MG's guarantee: any item a
    *    partition undercounts loses at most (partition tokens)/k, so
    *    summed over partitions the union of survivors is a SUPERSET of
    *    every token with global count > N/k. The pass also returns N (the
    *    exact global token count) for free.
    * 2. An exact count of ONLY the candidates: broadcast the candidate
    *    set, semi-join it onto the token stream BEFORE the shuffle, then
    *    an ordinary partial-agg count + the `minCount` cut.
    *
    * If `minCount <= N / counters` the MG superset guarantee does not
    * cover the threshold, and the operator falls back to the full exact
    * groupBy — correctness never depends on the sketch. Output is
    * IDENTICAL either way (MG only prunes, never decides), which is what
    * makes a sketch-assisted operator oracle-gateable at all.
    *
    * Scale shape: the whole point is the exchange. A full token groupBy
    * at 100 TB shuffles every (token, 1) pair — trillions of rows for a
    * heavy-hitter query whose answer is a few thousand rows. Here pass 1
    * is scan-local (a fixed `counters`-entry hash map per partition,
    * TREE-MERGED executor-side into one summary — the driver sees
    * O(counters) strings at any partition count, see [[mgSketch]]; pass 1
    * runs EAGERLY at call time because the candidate set steers the plan),
    * and pass 2's shuffle carries only tokens that
    * already survived a broadcast hash probe — the exchange shrinks from
    * |corpus| to |candidate occurrences|. Two corpus scans is the honest
    * floor (same as BM25's): the second pass must see every occurrence
    * of every candidate. */
  def heavyHitters(
      docs: DataFrame,
      minCount: Long,
      counters: Int = 4096,
      textCol: String = "text"): DataFrame =
    heavyHittersImpl(docs, n => { val _ = n; minCount }, counters, textCol)

  /** [[heavyHitters]] with a SCALE-INVARIANT threshold: count >=
    * (N · fracNum) div fracDen, N = exact global token count (known for
    * free from the MG pass). The form a growing corpus wants — "tokens
    * above 0.1% of the stream" stays the same query at 10× the data,
    * where an absolute count silently changes meaning. Integer floor
    * division keeps the cut engine-exact. */
  def heavyHittersByFraction(
      docs: DataFrame,
      fracNum: Long,
      fracDen: Long,
      counters: Int = 4096,
      textCol: String = "text"): DataFrame = {
    require(fracNum >= 1 && fracDen >= fracNum,
      s"need 0 < fracNum/fracDen <= 1: $fracNum/$fracDen")
    heavyHittersImpl(docs, n => math.max(1L, n * fracNum / fracDen),
      counters, textCol)
  }

  /** One ≤`counters`-entry Misra-Gries summary of the whole token stream
    * plus the exact global token count: per-partition MG passes
    * TREE-MERGED executor-side (Agarwal et al., "Mergeable Summaries",
    * PODS'12 — merge = add counters pointwise, then subtract the
    * (counters+1)-th largest count and drop non-positives). The merged
    * summary provably keeps every token with global count > N/(counters+1),
    * so the superset guarantee survives merging, and the DRIVER holds
    * O(counters) strings at ANY partition count — where collecting the raw
    * per-partition survivor sets would hold partitions × counters (≈4×10⁸
    * strings at 10⁵ tasks × 4096 counters). NOTE: runs EAGERLY (one full
    * corpus scan) at call time — it is the candidate-discovery action, not
    * a lazy plan. */
  private[graft] def mgSketch(
      toks: DataFrame,
      counters: Int): (Long, Map[String, Long]) = {
    val spark = toks.sparkSession
    import spark.implicits._
    val perPart = toks.as[String].rdd
      .mapPartitions { it =>
        val counts = new scala.collection.mutable.HashMap[String, Long]
        var n = 0L
        it.foreach { tok =>
          n += 1
          counts.get(tok) match {
            case Some(c) => counts.update(tok, c + 1)
            case None =>
              if (counts.size < counters) counts.update(tok, 1L)
              else {
                // decrement-all step; drop zeros (the classic MG step)
                val dead = List.newBuilder[String]
                counts.foreach { case (k, c) =>
                  if (c == 1L) dead += k else counts.update(k, c - 1)
                }
                dead.result().foreach(counts.remove)
              }
          }
        }
        Iterator.single((n, counts.toMap))
      }
    if (perPart.getNumPartitions == 0) (0L, Map.empty)
    else perPart.treeReduce { (a, b) =>
      val m = new scala.collection.mutable.HashMap[String, Long]
      a._2.foreach { case (k, v) => m.update(k, v) }
      b._2.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
      if (m.size > counters) {
        // subtract the (counters+1)-th largest count; ties with it hit 0
        // and drop too, so at most `counters` survive
        val sorted = m.values.toArray
        java.util.Arrays.sort(sorted)
        val dec = sorted(m.size - counters - 1)
        val dead = List.newBuilder[String]
        m.foreach { case (k, c) =>
          if (c <= dec) dead += k else m.update(k, c - dec)
        }
        dead.result().foreach(m.remove)
      }
      (a._1 + b._1, m.toMap)
    }
  }

  /** EXACT trimmed and winsorized means of a numeric column — the robust
    * location estimates a pipeline reports next to the mean when heavy
    * tails would otherwise dominate it (a handful of 10⁹-char documents
    * should not move "typical doc length"): drop (trimmed) or clamp
    * (winsorized) the lowest and highest k = ⌊n·tail⌋ observations by
    * RANK, then average the rest.
    *
    * Engine-portable arithmetic: over the distinct-value histogram with
    * cumulative counts, each value's KEPT multiplicity is the exact
    * integer `min(cum, n−k) − max(cum−c, k)` clamped at 0 — no
    * per-row sort, ties handled by mass not by row identity; the kept sum
    * accumulates as DECIMAL(20,4)·count products (the money-column sum
    * convention: values exact at 4dp), so the means are
    * ONE fixed-order double division each. The winsorized tails clamp to
    * the boundary ORDER STATISTICS (value at rank k+1 / rank n−k), read
    * with two filtered min/max aggs on the same histogram. A fully-trimmed
    * column (n − 2k = 0) nulls the trimmed mean instead of ANSI-throwing.
    *
    * Scale shape: one value-keyed partial agg to the histogram, the
    * two-phase prefix pass for cumulative counts, and three 1-row aggs —
    * nothing data-sized past the first shuffle. */
  def trimmedMeans(
      df: DataFrame,
      valueCol: String,
      tailNum: Long = 1L,
      tailDen: Long = 10L): DataFrame = {
    require(tailDen > 0 && tailNum >= 0 && tailNum * 2 < tailDen,
      s"tail fraction must satisfy 0 <= num/den < 1/2: $tailNum/$tailDen")
    def dec4(c: Column) = c.cast("decimal(20,4)")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = graft.ops.RunningCount.withRunningAgg(counts, col("__c"),
      graft.ops.RunningCount.Kind.Sum, Seq(col("__v")), "__cum")
    val tot = counts.agg(sum(col("__c")).cast("long").as("n"))
      .select(when(col("n") > 0, col("n")).otherwise(raise_error(
        lit("trimmedMeans: no non-null values — nothing to average"))
        .cast("long")).as("n"))
      .withColumn("k", expr(s"n * ${tailNum}L div ${tailDen}L"))
    val withTot = cum.crossJoin(broadcast(tot))
    val kept = greatest(
      least(col("__cum"), col("n") - col("k")) -
        greatest(col("__cum") - col("__c"), col("k")),
      lit(0L))
    // the kept sum is its own always-1-row agg and the final frame drives
    // from tot, so an empty input evaluates the raise (the [[theilIndex]]
    // convention) instead of short-circuiting to zero rows
    val core = withTot
      .select((dec4(col("__v")) * kept).as("__s"))
      .agg(sum(col("__s")).cast("decimal(38,4)").as("__tsum"))
    // boundary order statistics: value at rank k+1 (low clamp) and at
    // rank n−k (high clamp) — one filtered min/max each on the histogram
    val loCut = withTot.filter(col("__cum") > col("k"))
      .agg(min(col("__v")).as("lo_cut"))
    val hiCut = withTot.filter(col("__cum") - col("__c") < col("n") - col("k"))
      .agg(max(col("__v")).as("hi_cut"))
    tot.crossJoin(broadcast(core))
      .crossJoin(broadcast(loCut)).crossJoin(broadcast(hiCut))
      .select(col("n"), col("k"), col("lo_cut"), col("hi_cut"),
        when(col("n") - lit(2L) * col("k") > 0,
          col("__tsum").cast("double") /
            (col("n") - lit(2L) * col("k")).cast("double"))
          .otherwise(lit(null).cast("double")).as("trimmed_mean"),
        ((col("__tsum") + dec4(col("lo_cut")) * col("k") +
          dec4(col("hi_cut")) * col("k")).cast("decimal(38,4)").cast("double") /
          col("n").cast("double")).as("winsor_mean"))
  }

  /** Theil T inequality index over a positive integer column — the
    * ENTROPY-based concentration diagnostic next to [[giniIndex]]'s
    * rank-based one (Gini weights transfers by rank distance; Theil is
    * additively DECOMPOSABLE across subgroups, which is why pipeline
    * audits report both). T = (1/S)·Σ xᵢ·ln(xᵢ·n/S) with S = Σx: 0 when
    * every value is equal, ln(n) at total concentration.
    *
    * Engine-portable arithmetic (the [[jsDivergence]] discipline): each
    * per-row term is the exact integer xᵢ·(qln(xᵢ·n) − qln(S)) — integer
    * products under the 2⁻²⁰-grid-quantized ln — summed order-free into
    * DECIMAL(38,0); the readout divides once by S·2²⁰ in fixed op order.
    * Rows with x ≤ 0 or null are excluded (no mass to weigh).
    *
    * Scale shape: one 1-row (n, S) agg broadcast back, then ONE
    * partial-aggregable integer-sum scan — no shuffle beyond the two
    * aggs, nothing data-sized on the driver. */
  def theilIndex(df: DataFrame, valueCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val vals = df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("long").as("__x"))
    // the fail-fast rides the ALWAYS-1-ROW totals frame, so an entirely
    // empty input raises too (a per-data-row raise would never evaluate)
    val tot = vals.agg(count(lit(1)).cast("long").as("n"),
      sum(col("__x").cast("decimal(18,0)")).cast("decimal(38,0)").as("sum_x"))
      .select(when(col("n") > 0, col("n")).otherwise(raise_error(
        lit("theilIndex: no positive values — no inequality to measure"))
        .cast("long")).as("n"), col("sum_x"))
    val nOk = col("n")
    // the term sum is its own always-1-row agg; the final frame drives
    // from tot so an empty input evaluates the raise instead of
    // short-circuiting to zero rows
    val sT = vals.crossJoin(broadcast(tot))
      .select((dec(col("__x")) *
        dec(qln(dec(col("__x")) * nOk) - qln(col("sum_x")))).as("__t"))
      .agg(sum(col("__t")).cast("decimal(38,0)").as("s_t"))
    tot.crossJoin(broadcast(sT))
      .select(col("n"), col("sum_x"), col("s_t"),
        (col("s_t").cast("double") /
          (col("sum_x").cast("double") * lit(1048576.0))).as("theil"))
  }

  /** Hill tail-index estimator over a positive column — the TAIL member
    * of the scaling-law family ([[zipfFit]] fits the whole rank-frequency
    * line; Hill reads only the extreme upper tail, which is what decides
    * whether "one more 10⁹-char document" is expected or a bug):
    * γ̂ = (1/k)·Σ_{i≤k} ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k order statistics,
    * α̂ = 1/γ̂ the Pareto exponent.
    *
    * Engine-portable arithmetic: the top-k multiset comes from the
    * DESC-cumulative value histogram (per distinct value the exact kept
    * multiplicity min(cum, k) − (cum − c), the [[trimmedMeans]] mass
    * discipline — no row-level sort), each term is the exact integer
    * m·(qln(x) − qln(x_ref)) under the 2⁻²⁰ grid, summed order-free into
    * DECIMAL(38,0); γ̂ and α̂ are fixed-order double readouts. Fails fast
    * in-plan when fewer than k+1 positive rows exist.
    *
    * Scale shape: one value-keyed partial agg + the two-phase prefix
    * pass + two 1-row aggs — nothing data-sized past the first shuffle. */
  def hillTail(
      df: DataFrame,
      valueCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val counts = df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("long").as("__x"))
      .groupBy("__x").agg(count(lit(1)).as("__c"))
    // DESC cumulative counts: order by the negated value
    val cum = graft.ops.RunningCount.withRunningAgg(counts, col("__c"),
      graft.ops.RunningCount.Kind.Sum, Seq(-col("__x")), "__cum")
    val tot = counts.agg(sum(col("__c")).cast("long").as("__n"))
      .select(when(col("__n") > k, col("__n")).otherwise(raise_error(
        lit(s"hillTail: need more than k=$k positive rows")).cast("long"))
        .as("__n"))
    // x_ref = the (k+1)-th order statistic from the top: the largest
    // value whose DESC-cumulative count reaches k+1
    val xRef = cum.crossJoin(broadcast(tot))
      .filter(col("__cum") >= k + 1)
      .agg(max(col("__x")).as("x_ref"))
    val kept = greatest(
      least(col("__cum"), lit(k.toLong)) - (col("__cum") - col("__c")),
      lit(0L))
    val sG = cum.crossJoin(broadcast(xRef))
      .select((dec(kept) * dec(qln(dec(col("__x"))) - qln(dec(col("x_ref")))))
        .as("__t"))
      .agg(sum(col("__t")).cast("decimal(38,0)").as("s_gamma"))
    tot.crossJoin(broadcast(xRef)).crossJoin(broadcast(sG))
      .select(lit(k.toLong).as("k"), col("__n").as("n"), col("x_ref"),
        col("s_gamma"),
        (col("s_gamma").cast("double") /
          (lit(k.toDouble) * lit(1048576.0))).as("gamma"),
        // an all-equal tail (s_gamma = 0) has an infinite Pareto exponent
        // by convention — null, not an ANSI divide-by-zero
        when(col("s_gamma") =!= 0L,
          lit(1.0) / (col("s_gamma").cast("double") /
            (lit(k.toDouble) * lit(1048576.0))))
          .otherwise(lit(null).cast("double")).as("alpha"))
  }

  /** Empirical-Bayes shrunk per-group rates — the small-domain fix every
    * per-source quality dashboard needs: a domain with 3/4 "good" docs
    * must not outrank one with 900/1000, so each group's rate shrinks
    * toward the corpus rate m = K/N with prior strength `s` pseudo-trials:
    * shrunk = (k + s·m)/(n + s) (the Dirichlet-smoothed rate; s is the
    * evidence a group needs before its own data dominates the prior).
    *
    * Engine-portable arithmetic: k, n, K, N are exact integers; m, raw
    * and shrunk are fixed-order double expressions over them (shrunk
    * multiplies out to (k·N + s·K)/((n + s)·N) — still one division of
    * exactly-derived doubles). No cross-group float accumulation exists
    * anywhere, so group count is unbounded.
    *
    * Scale shape: ONE group-keyed partial agg + a 1-row global broadcast
    * back onto the groups frame. */
  def ebShrinkRates(
      df: DataFrame,
      groupCol: String,
      isSuccess: Column,
      strength: Long = 50L): DataFrame = {
    require(strength >= 0, s"strength must be >= 0: $strength")
    val groups = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(isSuccess, 1L).otherwise(0L)).cast("long").as("k"))
    // per-group output granularity: an empty input yields an EMPTY frame
    // (there is no row to carry a diagnostic), unlike the 1-row
    // statistics which raise in-plan
    val tot = groups.agg(sum(col("n")).cast("long").as("__nn"),
      sum(col("k")).cast("long").as("__kk"))
    val m = col("__kk").cast("double") / col("__nn").cast("double")
    groups.crossJoin(broadcast(tot))
      .select(col("group"), col("k"), col("n"),
        (col("k").cast("double") / col("n").cast("double")).as("raw_rate"),
        m.as("m"),
        ((col("k").cast("double") + lit(strength.toDouble) * m) /
          (col("n").cast("double") + lit(strength.toDouble)))
          .as("shrunk_rate"))
  }

  /** Lorenz curve at decile points — the CURVE behind [[giniIndex]]'s
    * scalar (gini = 1 − 2∫L): L(i/10) = share of total mass held by the
    * smallest i/10 of rows, the "bottom 50% of documents hold 12% of the
    * characters" readout a mixture report plots. Exact arithmetic: decile
    * boundaries are integer ranks rᵢ = ⌊i·n/10⌋; per distinct value the
    * mass INSIDE the boundary is x·(min(cum, rᵢ) − min(cum−c, rᵢ)) — the
    * [[trimmedMeans]] tie-splitting-by-mass discipline, so ties at a
    * boundary split deterministically with no row identity involved; mass
    * numerators are exact DECIMAL(38,0), shares one double division each.
    *
    * Scale shape: one value-keyed partial agg + the two-phase prefix
    * pass, then a ×10 decile explode of the HISTOGRAM (never the data)
    * and one 10-group agg. */
  def lorenzCurve(
      df: DataFrame,
      valueCol: String,
      points: Int = 10): DataFrame = {
    require(points >= 1, s"points must be >= 1: $points")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def d18(c: Column) = c.cast("decimal(18,0)")
    val counts = df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(valueCol).cast("long").as("__x"))
      .groupBy("__x").agg(count(lit(1)).as("__c"))
    val cum = graft.ops.RunningCount.withRunningAgg(counts, col("__c"),
      graft.ops.RunningCount.Kind.Sum, Seq(col("__x")), "__cum")
    val tot = counts.agg(
      sum(col("__c")).cast("long").as("__n"),
      sum(d18(col("__x")) * d18(col("__c"))).cast("decimal(38,0)").as("__s"))
      .select(when(col("__n") > 0, col("__n")).otherwise(raise_error(
        lit("lorenzCurve: no non-null values — no mass to rank"))
        .cast("long")).as("__n"), col("__s"))
    val pts = (1 to points).map(i => lit(i.toLong))
    val kept = least(col("__cum"), col("__r")) -
      least(col("__cum") - col("__c"), col("__r"))
    // the decile frame derives from the ALWAYS-1-ROW totals and drives
    // the output join, so an empty input evaluates the raise (the
    // [[theilIndex]] convention) instead of short-circuiting to no rows
    val decs = tot.select(col("__n"), col("__s"),
        explode(array(pts: _*)).as("i"))
      .withColumn("__r", expr(s"i * __n div ${points.toLong}L"))
    val mass = cum.crossJoin(broadcast(decs.select("i", "__r")))
      .select(col("i"), (d18(col("__x")) * d18(kept)).as("__m"))
      .groupBy("i")
      .agg(sum(col("__m")).cast("decimal(38,0)").as("mass"))
    decs.join(mass, Seq("i"), "left")
      .select(col("i"), col("__r").as("r"), col("__n").as("n"),
        col("mass"),
        (col("__r").cast("double") / col("__n").cast("double"))
          .as("pop_share"),
        when(col("__s") =!= 0L,
          col("mass").cast("double") / col("__s").cast("double"))
          .otherwise(lit(null).cast("double")).as("mass_share"))
  }

  /** Herfindahl–Hirschman concentration index of a categorical mix — the
    * log-free, division-light companion of [[mixEntropy]] (antitrust's
    * market-concentration readout applied to corpus source shares):
    * HHI = Σ (cᵢ/N)² = (Σcᵢ²)/N², 1/k at uniform, 1 at total
    * concentration; 1/HHI is the "effective number of sources" a mixture
    * report quotes.
    *
    * Exact arithmetic: one category-keyed partial agg to the histogram,
    * Σc and Σc² as exact DECIMAL(38,0) integers, two fixed-order double
    * readouts (hhi, effective k) — no logs, no quantization at all.
    * Scale shape: histogram agg + one 1-row agg, nothing else. */
  def hhi(df: DataFrame, catCol: String): DataFrame = {
    def d18(c: Column) = c.cast("decimal(18,0)")
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__cat"))
      .agg(count(lit(1)).as("__c"))
    counts.agg(count(lit(1)).cast("long").as("k"),
      sum(d18(col("__c"))).cast("decimal(38,0)").as("n"),
      sum(d18(col("__c")) * d18(col("__c"))).cast("decimal(38,0)").as("ssq"))
      .select(col("k"),
        when(col("n") > 0, col("n")).otherwise(raise_error(
          lit("hhi: no non-null categories — no mix to measure"))
          .cast("decimal(38,0)")).as("n"), col("ssq"))
      .select(col("k"), col("n"), col("ssq"),
        (col("ssq").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("hhi"),
        ((col("n").cast("double") * col("n").cast("double")) /
          col("ssq").cast("double")).as("effective_k"))
  }

  /** Per-day Shannon entropy of a categorical mix — COMPOSITION drift
    * over time, where the two-cohort tests ([[chi2Drift]]/[[gTest]]) give
    * one global verdict: a crawl whose source mix collapses toward one
    * domain shows as a falling daily entropy long before any single-day
    * comparison fires. H_day = ln(n_d) − (1/n_d)·Σ_c c·ln(c) in nats,
    * with the category count k_d as the accompanying richness readout.
    *
    * Engine-portable arithmetic: days are timezone-free integer epoch-day
    * indexes (the [[TimeSeries.autocorrelation]] convention), entropy
    * numerators are Σ c·(qln(c) − qln(n_d)) — order-free DECIMAL(38,0)
    * sums of grid-quantized-ln integer products per day, one fixed-order
    * double readout per row. A single-category day reads exactly 0.
    *
    * Scale shape: ONE (day, category)-keyed partial agg collapses the
    * data; per-day totals re-aggregate that table and join back on the
    * day key — days × categories rows end to end. */
  def mixEntropy(
      df: DataFrame,
      catCol: String,
      tsCol: String = "ts"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val usPerDay = 86400000000L
    val cells = df.filter(col(tsCol).isNotNull && col(catCol).isNotNull)
      .select(expr(s"unix_micros(`$tsCol`) div ${usPerDay}L").as("day"),
        col(catCol).cast("string").as("__cat"))
      .groupBy("day", "__cat").agg(count(lit(1)).as("__c"))
    val days = cells.groupBy("day")
      .agg(sum(col("__c")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k"))
    cells.join(days, "day")
      .select(col("day"), col("n"), col("k"),
        (dec(col("__c")) * dec(qln(dec(col("__c"))) - qln(col("n"))))
          .as("__t"))
      .groupBy("day", "n", "k")
      .agg(sum(col("__t")).cast("decimal(38,0)").as("s_h"))
      .select(col("day"), col("n"), col("k"), col("s_h"),
        (-col("s_h").cast("double") /
          (col("n").cast("double") * lit(1048576.0))).as("h"))
  }

  /** EXACT mutual information between two categorical columns — the
    * ASSOCIATION member next to the drift family (chi2/G test whether two
    * COHORTS differ on one column; MI asks how much two COLUMNS predict
    * each other within one corpus — feature redundancy, label leakage,
    * source/language coupling). MI = (1/N)·Σ_xy c_xy·ln(c_xy·N/(c_x·c_y))
    * in nats, with the marginal entropies H(X), H(Y) on the same scan and
    * the normalized readout NMI = 2·MI/(H(X)+H(Y)).
    *
    * Engine-portable arithmetic (the [[gTest]] discipline): each cell
    * term is the exact integer c_xy·(qln(c_xy·N) − qln(c_x·c_y)); entropy
    * numerators are Σ c_x·(qln(c_x) − qln(N)) — all order-free
    * DECIMAL(38,0) sums of grid-quantized-ln integer products, readout
    * doubles in one fixed op order. Rows with a null on either column are
    * excluded (no cell to land in). Independent columns contribute ≈0
    * (exactly 0 when the quantized lns cancel); MI ≥ 0 up to grid error.
    *
    * Scale shape: ONE (x,y)-keyed partial agg collapses the corpus to the
    * contingency table; marginals re-aggregate THAT table (never the
    * data) and re-enter via broadcast — categorical columns are
    * low-cardinality by construction (language, source, label; bucket
    * first for an unbounded column). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("string").as("__x"),
        col(yCol).cast("string").as("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__cxy"))
    val mx = cells.groupBy("__x").agg(sum(col("__cxy")).as("__cx"))
    val my = cells.groupBy("__y").agg(sum(col("__cxy")).as("__cy"))
    // fail-fast on the always-1-row totals frame (the [[theilIndex]]
    // convention): an entirely empty table raises instead of vanishing
    val tot = cells.agg(sum(col("__cxy")).cast("long").as("__n"),
      count(lit(1)).cast("long").as("__k"))
      .select(when(col("__n") > 0, col("__n")).otherwise(raise_error(
        lit("mutualInfo: no non-null (x, y) pairs — no table to measure"))
        .cast("long")).as("__n"), col("__k"))
    val nOk = col("__n")
    // entropy numerator over a marginal histogram: Σ c·(qln(c) − qln(N))
    def entNum(hist: DataFrame, c: String): DataFrame =
      hist.crossJoin(broadcast(tot))
        .select((dec(col(c)) * dec(qln(dec(col(c))) - qln(nOk))).as("__t"))
        .agg(sum(col("__t")).cast("decimal(38,0)").as("__s"))
    // the term sum is its own always-1-row agg; the final frame drives
    // from tot so an empty table evaluates the raise (the [[theilIndex]]
    // convention) instead of short-circuiting to zero rows
    val sMi = cells.join(broadcast(mx), "__x").join(broadcast(my), "__y")
      .crossJoin(broadcast(tot))
      .select((dec(col("__cxy")) *
        dec(qln(dec(col("__cxy")) * nOk) - qln(dec(col("__cx")) * dec(col("__cy")))))
        .as("__t"))
      .agg(sum(col("__t")).cast("decimal(38,0)").as("s_mi"))
    val g = lit(1048576.0)
    tot.crossJoin(broadcast(sMi))
      .crossJoin(broadcast(entNum(mx, "__cx").select(col("__s").as("s_hx"))))
      .crossJoin(broadcast(entNum(my, "__cy").select(col("__s").as("s_hy"))))
      .select(col("__n").as("n"), col("__k").as("k"),
        col("s_mi"), col("s_hx"), col("s_hy"),
        (col("s_mi").cast("double") / (col("__n").cast("double") * g))
          .as("mi"),
        (-col("s_hx").cast("double") / (col("__n").cast("double") * g))
          .as("h_x"),
        (-col("s_hy").cast("double") / (col("__n").cast("double") * g))
          .as("h_y"),
        // degenerate 1-cell table: H(X)+H(Y) = 0 and NMI is undefined —
        // null, not an ANSI divide-by-zero (Spark raises even for doubles)
        (when(col("s_hx") + col("s_hy") =!= 0L,
          lit(2.0) * (col("s_mi").cast("double") / (col("__n").cast("double") * g)) /
            ((-col("s_hx").cast("double") / (col("__n").cast("double") * g)) +
              (-col("s_hy").cast("double") / (col("__n").cast("double") * g))))
          .otherwise(lit(null).cast("double")))
          .as("nmi"))
  }

  private def heavyHittersImpl(
      docs: DataFrame,
      threshold: Long => Long,
      counters: Int,
      textCol: String): DataFrame = {
    require(counters >= 1, s"counters must be >= 1: $counters")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val (total, sketch) = mgSketch(toks, counters)
    val minCount = threshold(total)
    require(minCount >= 1, s"threshold must be >= 1: $minCount")
    if (minCount <= total / counters) {
      // threshold below the sketch's guarantee — exact full path
      toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
    } else {
      val cands = sketch.keys.toSeq.toDF("token")
      toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
    }
  }

  /** K-ANONYMITY audit over quasi-identifier columns (Sweeney 2002) —
    * the privacy gate a dataset must pass before release: every
    * quasi-identifier combination must be shared by at least `k` rows,
    * else those rows are re-identifiable by linking the quasi columns
    * against an external table. Returns one row per equivalence class
    * with its size and the pass flag; the release pipeline suppresses
    * or generalizes the failing classes (the caller picks which — a
    * `filter(!$"k_anonymous")` is the suppression list).
    *
    * Quasi columns should be pre-generalized by the caller (bands, not
    * raw values — e.g. `n_tokens div 100`): k-anonymity over raw
    * high-cardinality columns is unachievable by construction.
    *
    * Scale shape: ONE keyed partial aggregation — the class census is
    * |distinct quasi combinations|-sized, nothing else. */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("k_anonymous", col("n") >= k)
  }
}
