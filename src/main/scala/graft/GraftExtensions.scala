package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration: exposes the engine's native
  * expressions as SQL functions, so the whole operator surface is reachable
  * from `spark.sql(...)` as well as the DataFrame API.
  *
  * Activate with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registered: cosine_similarity(a, b), word_shingles(text, n),
  * minhash_bands(shingles, bands, rows_per_band), simhash64(tokens),
  * minhash_signature(shingles, k), rolling_hash(text),
  * nearest_centroid(vec, cents), quantize_int8(vec), zorder_key(x, y, bits),
  * gopher_signals(text), gopher_keep(text[, min_words]), c4_clean(text[,
  * min_line_words]), bloom_filter_agg(hash[, items[, bits]]) /
  * bloom_might_contain(bloom, hash) — Spark's runtime-filter Bloom pair,
  * graft_filter(line, pattern) — the reference's FILTER predicate
  * (case-insensitive substring, Operators.java:121-144) as a SQL function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Explicit arity validation: args(i) on a short list throws a raw
    * IndexOutOfBoundsException, and EXTRA arguments would be silently
    * discarded — a swapped-argument call computing plausible wrong numbers
    * with no error. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name takes exactly $n argument${if (n == 1) "" else "s"}, got ${args.length}")
      build(args)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float/double arrays"),
      arity("cosine_similarity", 2)(args => CosineSimilarity(args(0), args(1)))))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram set"),
      arity("word_shingles", 2)(args =>
        WordShingles(args(0), intLit(args(1), "n"), distinctOut = true))))

    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(shingles, bands, rows_per_band) - LSH band keys"),
      arity("minhash_bands", 3)(args => Sketches.MinHashBands(args(0),
        intLit(args(1), "bands"), intLit(args(2), "rows_per_band")))))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(tokens[, portable]) - 64-bit SimHash of a token array; " +
          "portable=true uses the md5-derived engine-portable token hash"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => Sketches.SimHash64(t)
        case Seq(t, p) => Sketches.SimHash64(t, p match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"portable must be a boolean literal, got $other")
        })
        case _ => throw new IllegalArgumentException("simhash64 takes 1 or 2 arguments")
      }))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k-permutation MinHash"),
      arity("minhash_signature", 2)(args =>
        Sketches.MinHashSignature(args(0), intLit(args(1), "k")))))

    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - polynomial rolling content hash"),
      arity("rolling_hash", 1)(args => Sketches.RollingHash(args(0)))))

    ext.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid",
        "nearest_centroid(vec, cents) - cid of the max-cosine centroid in an " +
          "array<struct<cid bigint, cv array<float|double>>> (first max wins ties)"),
      arity("nearest_centroid", 2)(args => NearestCentroid(args(0), args(1)))))

    ext.injectFunction((FunctionIdentifier("graft_filter"),
      info("graft_filter", "graft_filter(line, pattern) - case-insensitive substring match"),
      arity("graft_filter", 2) { args =>
        import org.apache.spark.sql.catalyst.expressions._
        Contains(Lower(args(0)), Lower(args(1)))
      }))

    // Column-composition functions (built-in chains, no custom Expression
    // class) register through the same bridge: compose on a Column wrapper,
    // hand back the underlying expression tree.
    import org.apache.spark.sql.GraftExpr
    def composed(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : Seq[Expression] => Expression =
      arity(name, 1)(args => GraftExpr.catalystExpression(f(GraftExpr.column(args.head))))

    ext.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8",
        "quantize_int8(vec) - struct(scale, q): symmetric max-abs int8 quantization"),
      composed("quantize_int8", VectorFunctions.quantizeInt8)))

    ext.injectFunction((FunctionIdentifier("zorder_key"),
      info("zorder_key",
        "zorder_key(x, y, bits) - bit-interleaved Morton key of two bits-bit values"),
      arity("zorder_key", 3)(args => GraftExpr.catalystExpression(
        graft.sources.Layouts.zorderKey(GraftExpr.column(args(0)),
          GraftExpr.column(args(1)), intLit(args(2), "bits"))))))

    ext.injectFunction((FunctionIdentifier("hilbert_key"),
      info("hilbert_key",
        "hilbert_key(x, y, bits) - 2-D Hilbert-curve index of two bits-bit values (tighter locality than zorder_key)"),
      arity("hilbert_key", 3)(args =>
        graft.functions.HilbertKey(args(0), args(1), intLit(args(2), "bits")))))

    ext.injectFunction((FunctionIdentifier("redact_pii"),
      info("redact_pii",
        "redact_pii(text) - scrub emails/IPv4s/card-length digit runs/phone shapes to typed placeholders"),
      composed("redact_pii", TextFunctions.redactPii)))

    ext.injectFunction((FunctionIdentifier("dup_token_fraction"),
      info("dup_token_fraction",
        "dup_token_fraction(text) - fraction of token occurrences repeating an earlier token"),
      composed("dup_token_fraction", TextFunctions.duplicateTokenFraction)))

    ext.injectFunction((FunctionIdentifier("top_bigram_fraction"),
      info("top_bigram_fraction",
        "top_bigram_fraction(text) - share of bigram occurrences taken by the most frequent bigram"),
      composed("top_bigram_fraction", TextFunctions.topBigramFraction)))

    ext.injectFunction((FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - stopword-hit language guess (en/es/de/fr/zh/und)"),
      composed("lang_id", TextFunctions.langId)))

    ext.injectFunction((FunctionIdentifier("gopher_signals"),
      info("gopher_signals",
        "gopher_signals(text) - struct of the eight exact Gopher rule counts " +
          "(n_tokens, sum_token_len, n_alpha_tokens, n_stop, n_symbols, " +
          "n_lines, n_bullet_lines, n_ellipsis_lines)"),
      arity("gopher_signals", 1)(args =>
        GopherSignals(args.head, TextFunctions.stopwords.head._2))))

    ext.injectFunction((FunctionIdentifier("gopher_keep"),
      info("gopher_keep",
        "gopher_keep(text[, min_words]) - Gopher rule-suite keep decision"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => GraftExpr.catalystExpression(
          QualityFilters.gopherKeep(GraftExpr.column(t)))
        case Seq(t, mw) => GraftExpr.catalystExpression(
          QualityFilters.gopherKeep(GraftExpr.column(t),
            minWords = intLit(mw, "min_words")))
        case _ => throw new IllegalArgumentException("gopher_keep takes 1 or 2 arguments")
      }))

    ext.injectFunction((FunctionIdentifier("c4_clean"),
      info("c4_clean",
        "c4_clean(text[, min_line_words]) - C4 line filter: " +
          "struct(clean_text, n_kept_lines)"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => C4LineFilter(t, 3)
        case Seq(t, mw) => C4LineFilter(t, intLit(mw, "min_line_words"))
        case _ => throw new IllegalArgumentException("c4_clean takes 1 or 2 arguments")
      }))

    ext.injectFunction((FunctionIdentifier("char_profile"),
      info("char_profile",
        "char_profile(text) - struct(n_cp, n_distinct, max_cnt, sum_sq, " +
          "entropy_bits): one-pass code-point diversity profile " +
          "(Renyi-2 entropy = log2(n_cp^2 / sum_sq))"),
      arity("char_profile", 1)(args => CharProfile(args.head))))

    ext.injectFunction((FunctionIdentifier("array_pairs"),
      info("array_pairs",
        "array_pairs(arr) - all ordered (i < j) element pairs of a string " +
          "array as array<struct<x, y>> (collocation pair generator)"),
      arity("array_pairs", 1)(args => ArrayPairs(args.head))))

    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A ∩ B| of two SORTED bigint " +
          "arrays by two-pointer merge (callers own sortedness)"),
      arity("sorted_intersect_count", 2)(args =>
        SortedIntersectCount(args(0), args(1)))))

    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(text[, form]) - UAX #15 normalization; " +
          "form in ('NFC','NFD','NFKC','NFKD'), default NFC"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => UnicodeNormalize(t, "NFC")
        case Seq(t, f) => UnicodeNormalize(t, f match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got $other")
        })
        case _ => throw new IllegalArgumentException(
          "unicode_normalize takes 1 or 2 arguments")
      }))

    // Spark's runtime-filter Bloom machinery, surfaced to SQL: build with
    // `bloom_filter_agg(xxhash64(k), items, bits)` in a scalar subquery,
    // probe with `bloom_might_contain((SELECT ...), xxhash64(k))` — the
    // might-contain side REQUIRES a constant/subquery bloom (Spark's own
    // type check), which is exactly the shape that ships the bitmap with
    // task binaries instead of joining it.
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64_value[, est_items[, num_bits]]) - " +
          "aggregate long hashes into a Bloom-filter bitmap (binary)"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        args match {
          case Seq(h) => new BloomFilterAggregate(h,
            org.apache.spark.sql.catalyst.expressions.Literal(4000000L))
          case Seq(h, n) => new BloomFilterAggregate(h, n)
          case Seq(h, n, b) => new BloomFilterAggregate(h, n, b)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg takes 1 to 3 arguments")
        }
      }))

    ext.injectFunction((FunctionIdentifier("hashed_bow_margin"),
      info("hashed_bow_margin",
        "hashed_bow_margin(text, weights_array, bias) - fastText-style " +
          "hashed bag-of-words linear margin (portable md5 buckets, " +
          "in-order fold; buckets = size of the weight array)"),
      arity("hashed_bow_margin", 3)(args => GraftExpr.catalystExpression(
        TextFunctions.hashedBowMarginDyn(GraftExpr.column(args(0)),
          GraftExpr.column(args(1)), GraftExpr.column(args(2)))))))

    ext.injectFunction((FunctionIdentifier("strip_markup"),
      info("strip_markup",
        "strip_markup(text) - HTML/markup strip (script/style/comment " +
          "bodies dropped, tags flattened, standard entities decoded, " +
          "whitespace collapsed) - the CommonCrawl text-extraction step"),
      arity("strip_markup", 1)(args => GraftExpr.catalystExpression(
        TextFunctions.stripMarkup(GraftExpr.column(args(0)))))))

    ext.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, xxhash64_value) - membership probe; " +
          "false positives possible, false negatives never"),
      arity("bloom_might_contain", 2)(args =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1)))))

    ext.injectFunction((FunctionIdentifier("luhn_checksum"),
      info("luhn_checksum",
        "luhn_checksum(digits) - ISO 7812 mod-10 checksum base (double " +
          "every second digit from the right, overflow -9); NULL on " +
          "empty or non-digit input"),
      arity("luhn_checksum", 1)(args => LuhnSum(args(0)))))

    ext.injectFunction((FunctionIdentifier("luhn_valid"),
      info("luhn_valid",
        "luhn_valid(digits) - true iff the digit string carries a valid " +
          "Luhn check digit (the card-number validator the \\d{12,19} " +
          "redaction pattern lacks)"),
      arity("luhn_valid", 1)(args => GraftExpr.catalystExpression(
        TextFunctions.luhnValid(GraftExpr.column(args(0)))))))

    ext.injectFunction((FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "kmv_sketch(value, k) - AGGREGATE: the k smallest distinct md5-60 " +
          "hashes (mergeable KMV distinct sketch; oracle-reproducible)"),
      arity("kmv_sketch", 2)(args =>
        graft.functions.Sketches.KmvSketch(args(0), intLit(args(1), "k"))
          .toAggregateExpression())))

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1], byte-" +
          "based, prefix boost above 0.7 (matches DuckDB's " +
          "jaro_winkler_similarity bit-exactly)"),
      arity("jaro_winkler", 2)(args =>
        graft.functions.JaroWinkler(args(0), args(1)))))

    ext.injectFunction((FunctionIdentifier("iban_mod97"),
      info("iban_mod97",
        "iban_mod97(iban) - ISO 13616 mod-97 residue of the rotated, " +
          "letter-expanded IBAN (1 iff check digits verify); NULL on " +
          "non-[0-9A-Z] chars or length < 5 (strict electronic format)"),
      arity("iban_mod97", 1)(args => graft.functions.Mod97Sum(args(0)))))

    ext.injectFunction((FunctionIdentifier("iban_valid"),
      info("iban_valid",
        "iban_valid(iban) - true iff iban_mod97(iban) = 1; malformed " +
          "input is false, not NULL (checksum only - country lengths " +
          "are a registry join)"),
      arity("iban_valid", 1)(args => GraftExpr.catalystExpression(
        TextFunctions.ibanValid(GraftExpr.column(args(0)))))))

    ext.injectFunction((FunctionIdentifier("code_score"),
      info("code_score",
        "code_score(text) - integer-weighted code-punctuation/keyword " +
          "score (the Stack-vs-prose corpus router); threshold as " +
          "score * 1000 >= permille * length(text)"),
      arity("code_score", 1)(args => GraftExpr.catalystExpression(
        TextFunctions.codeScore(GraftExpr.column(args(0)))))))
  }
}
