package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

private[functions] object TextExpressions {
  /** Strip leading/trailing ASCII SPACE only — the semantics of Spark's
    * `trim()` and DuckDB's `trim()`. Java's `String.trim` strips every
    * char <= U+0020 (tabs, newlines), which would silently diverge from
    * the composed formulations and the SQL oracles on control-char-edged
    * text. */
  def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }
}

/** Native word n-gram shingling: trim -> whitespace-split -> n-gram join
  * (-> optional first-occurrence distinct) in one evaluation.
  *
  * Matches the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', slice(split(
  * trim(text), "\\s+"), i+1, n))))` exactly (same token split semantics:
  * Java `Pattern.split(s, -1)` == Spark `StringSplitSQL` on a trimmed
  * string; empty text yields one empty token, fewer than n tokens yield an
  * empty array). The HOF chain evaluates interpreted with a lambda frame per
  * element — its first heavy use measured ~50s of interpreter/JIT warmup at
  * sf0.01; this expression is one tight JVM loop.
  */
case class WordShingles(child: Expression, n: Int, distinctOut: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // NULL text -> empty array, matching the composed formulation exactly
  // (`when(size(split(trim(NULL))) >= n, ...)` falls to the otherwise([])
  // branch) — the declared element-identity must include the null row.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val text = TextExpressions.trimSpaces(input.asInstanceOf[UTF8String].toString)
    val toks = text.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    if (distinctOut) {
      val seen = new java.util.LinkedHashSet[String](m * 2)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString); i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Fraction of word-n-gram occurrences taken by the single most frequent
  * n-gram (MassiveText's repetition filter) — one pass: tokenize, count
  * n-grams in a hash map, max/total. 0.0 below n tokens. Fused because the
  * HOF formulation (sort_array + ArrayAggregate with a struct accumulator
  * referenced three times) evaluates interpreted and re-runs the whole fold
  * per reference — measured 1.8 ms/doc vs ~5 µs here (tools/CurationProbe,
  * r07). */
/** Native Luhn mod-10 checksum base (ISO 7812): the sum over the digit
  * string of each digit, doubling every second from the RIGHT (overflow
  * −9). Null on empty or non-digit input — the validator treats those as
  * invalid. One tight generated loop per row; the `aggregate(sequence(…))`
  * HOF formulation this replaces evaluated interpreted with a per-position
  * substr + cast Column tree and ran ~1 ms/row (5.3 s for the sf0.1
  * documents scan, the slowest query in the whole bench) — ~20× the cost
  * of every other pure-scan signal. */
case class LuhnSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // null OUT even on non-null input (empty / non-digit strings) — the
  // child-derived default would let the optimizer assume non-null and
  // read garbage through the row writer
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"luhn_sum needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LuhnSum.sum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer ${ev.value}Box = graft.functions.LuhnSum.sum($c);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.intValue(); }
    """)

  override protected def withNewChildInternal(c: Expression): LuhnSum =
    copy(child = c)
}

object LuhnSum {
  /** The checksum kernel, shared by interpreted eval and generated code:
    * boxed Integer so "non-digit/empty -> null" survives the JVM call. */
  def sum(s: UTF8String): java.lang.Integer = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return null
    var acc = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b < '0' || b > '9') return null
      val d = b - '0'
      // position from the right is n-1-i; double when it is odd
      acc += (if (((n - i) & 1) == 0) { val dd = d * 2; if (dd > 9) dd - 9 else dd }
              else d)
      i += 1
    }
    acc
  }
}

/** ISO 13616 IBAN mod-97 residue: rotate the first four characters
  * (country + check digits) to the end, expand letters A–Z to 10–35, and
  * fold the resulting decimal string modulo 97 incrementally — a valid
  * IBAN's residue is exactly 1. Strict ELECTRONIC format: uppercase
  * letters and digits only; any other character (incl. lowercase and the
  * paper format's spaces), or fewer than 5 characters, yields null —
  * strip/upcase upstream when parsing display forms. The incremental
  * `(acc·10^k + v) mod 97` fold never exceeds 97·100 + 35, so the whole
  * 34-char big-integer reduction runs in one int register per row
  * (codegen'd, like [[LuhnSum]]). Checksum ONLY: country-specific LENGTH
  * validation (the ISO registry table) is a separate broadcast-join
  * concern. */
case class Mod97Sum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // null OUT even on non-null input (short / non-alnum strings) — see
  // LuhnSum on why the child-derived default is unsafe here
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iban_mod97 needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Mod97Sum.mod97(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer ${ev.value}Box = graft.functions.Mod97Sum.mod97($c);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.intValue(); }
    """)

  override protected def withNewChildInternal(c: Expression): Mod97Sum =
    copy(child = c)
}

object Mod97Sum {
  /** The mod-97 kernel, shared by interpreted eval and generated code:
    * boxed Integer so "invalid -> null" survives the JVM call. The
    * rotation is an index remap — no string copy. */
  def mod97(s: UTF8String): java.lang.Integer = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < 5) return null // 2 country + 2 check + at least 1 BBAN char
    var acc = 0
    var i = 0
    while (i < n) {
      val b = bytes((i + 4) % n) // chars 4..n-1, then the leading 4
      if (b >= '0' && b <= '9') acc = (acc * 10 + (b - '0')) % 97
      else if (b >= 'A' && b <= 'Z') acc = (acc * 100 + (b - 'A' + 10)) % 97
      else return null
      i += 1
    }
    acc
  }
}

case class TopNgramFraction(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = DoubleType
  // NULL text -> 0.0, matching the HOF reference (whose when() falls to the
  // otherwise(0.0) branch on a null fold), the sibling
  // duplicateTokenFraction, and the oracles' coalesce(tbf, 0.0) — a
  // null-propagating variant would silently DROP null-text rows from
  // filter(topBigramFraction <= x) pipelines the oracle keeps.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => 0.0
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.trimSpaces(input.asInstanceOf[UTF8String].toString)
      .split("\\s+", -1)
    if (toks.length < n) return 0.0
    val m = toks.length - n + 1
    val counts = new java.util.HashMap[String, Int](m * 2)
    var best = 0
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(16 * n)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toDouble / m.toDouble
  }
  override protected def withNewChildInternal(c: Expression): TopNgramFraction =
    copy(child = c)
}

/** Native character n-grams (1-char step) over CODE POINTS — the unit both
  * Spark's `substring` and DuckDB's `substr` count, so the DuckDB oracle
  * `list_transform(range(1, greatest(length(t) - 1, 1)), i -> substr(t, i, 3))`
  * produces the identical array. Feeds the Cavnar-Trenkle-style n-gram
  * language ID (TextFunctions.langIdNgram). Fewer than n code points yield
  * an empty array. One tight loop per row — the HOF formulation would
  * re-evaluate the (lower/trim) child per element, interpreted. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code-point start offsets (UTF-16 indices)
    val starts = new Array[Int](s.codePointCount(0, s.length) + 1)
    var idx = 0
    var cp = 0
    while (idx < s.length) {
      starts(cp) = idx
      idx += Character.charCount(s.codePointAt(idx))
      cp += 1
    }
    starts(cp) = s.length
    if (cp < n) return new GenericArrayData(Array.empty[Any])
    val m = cp - n + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromString(s.substring(starts(i), starts(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CharNgrams = copy(child = c)
}

/** Fused character-n-gram language ID: one pass over the text's code-point
  * n-grams, counting multiset hits against each language's profile
  * (HashSet membership), then argmax with first-listed tie priority;
  * zero hits -> "und". Fused for the same reason as MinHashBands: a
  * per-language `size(filter(ngrams, isin(profile)))` column fans the
  * n-gram expression into every score reference (scores appear in the
  * greatest() AND the when-chain), re-evaluating it ~3x languages times
  * per row, interpreted. */
case class NgramLangId(
    child: Expression,
    n: Int,
    profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && profiles.nonEmpty)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    profiles.map { case (_, ps) =>
      val s = new java.util.HashSet[String](ps.size * 2)
      ps.foreach(s.add); s
    }.toArray
  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](sets.length)
    var idx = 0
    // sliding code-point window: start offsets ring buffer of size n
    val starts = new Array[Int](n)
    var cp = 0
    while (idx < s.length) {
      starts(cp % n) = idx
      idx += Character.charCount(s.codePointAt(idx))
      cp += 1
      if (cp >= n) {
        val gram = s.substring(starts(cp % n), idx)
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(gram)) counts(l) += 1
          l += 1
        }
      }
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) { best = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) und else langs(bestIdx)
  }
  override protected def withNewChildInternal(c: Expression): NgramLangId = copy(child = c)
}

/** Fused C4 line filter: split a page into lines, keep each line iff it
  * ends in terminal punctuation (`.!?"”`), has at least `minLineWords`
  * whitespace-tokens, and does not mention "javascript" (case-insensitive),
  * then rejoin — one tight JVM pass per document, returning
  * `struct(clean_text, n_kept_lines)`.
  *
  * Matches [[QualityFilters.c4CleanComposed]] exactly (spec-pinned): same
  * `split(text, "\n")` semantics (limit -1 keeps trailing empty lines as
  * candidates), same ASCII-space-only trim before the word count (empty
  * lines count one empty token, like `split(trim(l), "\\s+")`), same
  * terminal-punctuation set. The HOF formulation evaluates interpreted
  * with a lambda frame per line — the same trap WordShingles /
  * TopNgramFraction close; this is the gate/scale path. */
case class C4LineFilter(child: Expression, minLineWords: Int)
    extends UnaryExpression with CodegenFallback {
  require(minLineWords >= 1, s"minLineWords must be >= 1: $minLineWords")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept_lines", LongType, nullable = false)))
  // null text -> ("", 0): callers coalesce, but be safe under direct use
  override def nullable: Boolean = false

  private def lineOk(l: String): Boolean = {
    if (l.isEmpty) return false
    val last = l.charAt(l.length - 1)
    if (last != '.' && last != '!' && last != '?' && last != '"' && last != '”')
      return false
    if (TextExpressions.trimSpaces(l).split("\\s+", -1).length < minLineWords)
      return false
    !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")
  }

  private def result(cleanText: String, kept: Long): Any =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(cleanText), kept))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => result("", 0L)
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val lines = input.asInstanceOf[UTF8String].toString.split("\n", -1)
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var i = 0
    while (i < lines.length) {
      if (lineOk(lines(i))) {
        if (kept > 0) sb.append('\n')
        sb.append(lines(i))
        kept += 1
      }
      i += 1
    }
    result(sb.toString, kept)
  }

  override protected def withNewChildInternal(c: Expression): C4LineFilter = copy(child = c)
}

/** Fused Gopher rule signals (Rae et al. 2021): all eight exact counts in
  * ONE pass over the document — one whitespace split plus char scans —
  * returning `struct(n_tokens, sum_token_len, n_alpha_tokens, n_stop,
  * n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines)` as longs.
  *
  * Matches [[QualityFilters.gopherCountsComposed]] exactly (spec-pinned):
  * token signals use `trimSpaces` + `split("\\s+", -1)` (the composed
  * `tokens()` semantics — empty text yields one empty token), line signals
  * use the RAW coalesced text, `n_symbols` counts `#` chars plus
  * non-overlapping left-to-right `...` occurrences (the `replace`-identity
  * the composed form uses), and an ellipsis line is one ending in `...` or
  * `…`. The composed form pays eight regexp passes plus an interpreted
  * per-token HOF lambda for the stopword count — the same trap WordShingles
  * closes; this is the gate/scale path. */
case class GopherSignals(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(
    GopherSignals.fields.map(StructField(_, LongType, nullable = false)))
  // null text behaves like empty text (the sibling ops' convention)
  override def nullable: Boolean = false

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => nullSafeEval(UTF8String.EMPTY_UTF8)
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // token signals over the space-trimmed text
    val toks = TextExpressions.trimSpaces(raw).split("\\s+", -1)
    val nTokens = toks.length.toLong
    var sumTokLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumTokLen += t.length
      var j = 0
      var hasAlpha = false
      while (j < t.length && !hasAlpha) {
        val c = t.charAt(j)
        hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      if (stopSet.contains(t)) nStop += 1
      i += 1
    }
    // char signals over the RAW text: '#' count, non-overlapping '...'
    // (left-to-right, the replace() identity), line count
    var nHash = 0L
    var nDots = 0L
    var nLines = 1L
    i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '#') nHash += 1
      if (c == '\n') nLines += 1
      if (c == '.' && i + 2 < raw.length &&
          raw.charAt(i + 1) == '.' && raw.charAt(i + 2) == '.') {
        nDots += 1
        i += 3
      } else i += 1
    }
    // line-shape signals: bullet start, ellipsis end (both '...' and '…')
    var nBullet = 0L
    var nEllipsis = 0L
    val lines = raw.split("\n", -1)
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.nonEmpty) {
        val first = l.charAt(0)
        if (first == '-' || first == '*' || first == '•') nBullet += 1
        if (l.endsWith("...") || l.charAt(l.length - 1) == '…') nEllipsis += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, sumTokLen, nAlpha, nStop, nHash + nDots, nLines,
        nBullet, nEllipsis))
  }

  override protected def withNewChildInternal(c: Expression): GopherSignals = copy(child = c)
}

object GopherSignals {
  val fields: Seq[String] = Seq("n_tokens", "sum_token_len", "n_alpha_tokens",
    "n_stop", "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines")
}

/** Deflate-compressed byte count of the UTF-8 text — the compression-ratio
  * quality signal (the CCNet/Gopher-family gibberish detector): natural
  * prose deflates to roughly 35–60% of raw, templated/repetitive text far
  * below that, and random noise above ~100%, so deflate_len/byte_len
  * separates all three with one cheap pass. Emits the raw COUNT
  * (division-free — the caller forms the ratio), level = standard zlib
  * 1..9. Per-row, scan-bound; the Deflater is reused per task thread via a
  * ThreadLocal (allocating one per row would dominate the work).
  *
  * No SQL oracle exists (DuckDB has no zlib surface), so the gate is
  * rows-only by design; exact byte counts depend on the zlib build, but
  * the ORDER of the signal (repetitive < prose < noise) is what consumers
  * threshold on and is stable — spec-pinned. Null -> null. */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 1 && level <= 9, s"zlib level must be 1..9: $level")

  @transient private lazy val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(level, true)
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(c: Expression): DeflateSize =
    copy(child = c)
}

/** Unicode normalization (UAX #15) — the canonicalization pass BEFORE
  * fingerprinting/shingling/exact dedup: visually identical strings that
  * differ only in composition (é as U+00E9 vs e + combining U+0301, ﬁ
  * ligatures under NFKC) hash to different md5s and defeat shingle
  * equality, silently deflating duplicate recall on multilingual corpora.
  * `java.text.Normalizer` is the JDK's UAX #15 implementation; DuckDB's
  * `nfc_normalize` implements the same NFC mapping, so the NFC form is
  * oracle-gateable byte-for-byte. Per-row, no shuffle; null -> null.
  * `form` ∈ NFC | NFD | NFKC | NFKD (validated at construction). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  // fail at plan time, not per row mid-job, on a typo'd form
  private val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // the common case is already-normalized ASCII/NFC text: isNormalized
    // is a cheap scan that skips the allocating normalize pass for it
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

/** Character(code-point)-level diversity profile in ONE pass: total code
  * points, distinct code points, the top count, the Simpson collision
  * numerator Σcnt² (Rényi-2 entropy = log2(n²/Σcnt²)), and Shannon entropy
  * in bits. The integer fields are the hash-gateable form of a char-entropy
  * quality signal — a float-only entropy would be addition-order- and
  * libm-dependent across engines, while n/distinct/max/Σcnt² are exact and
  * carry the same screening power (gibberish: low distinct or one dominant
  * char; encrypted/random noise: near-uniform → Σcnt² ≈ n²/distinct). The
  * entropy_bits double is the human-facing convenience, NOT part of any
  * hash gate. Code points, not UTF-16 units, to match DuckDB's
  * string_split(text, '') oracle on non-BMP input. Null behaves like empty
  * text (zero profile) — the sibling ops' convention. */
case class CharProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => nullSafeEval(UTF8String.EMPTY_UTF8)
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Array[Long]](64)
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var maxCnt = 0L
    var sumSq = 0L
    var entropy = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxCnt) maxCnt = c
      sumSq += c * c
      val p = c.toDouble / n.toDouble
      entropy -= p * (Math.log(p) / Math.log(2.0))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, maxCnt, sumSq,
        if (n == 0L) 0.0 else entropy))
  }

  override protected def withNewChildInternal(c: Expression): CharProfile =
    copy(child = c)
}

/** All ordered pairs (a[i], a[j]) with i < j of a string array, as one
  * array<struct<x, y>> — the collocation pair generator. One tight loop
  * per row where the HOF formulation (indexed transform + nested transform
  * + flatten) evaluates interpreted with a lambda frame per element pair.
  * The caller passes a SORTED DISTINCT array so x < y lexicographically;
  * this expression does not re-sort. Null input -> empty array. */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", StringType, nullable = true),
      StructField("y", StringType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = arr.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](x, arr.getUTF8String(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ArrayPairs =
    copy(child = c)
}

/** Jaro-Winkler similarity (Winkler 1990) of two strings, computed over
  * UTF-8 BYTES — the semantics of DuckDB's `jaro_winkler_similarity`
  * (RapidFuzz lineage), established empirically AGAINST DuckDB 1.0.0
  * (the oracle engine pinned in this container; a DuckDB upgrade could
  * change its implementation details and flip the q_link_jw gate with
  * zero code change here — diagnose a future gate failure against this
  * pin first): byte-wise comparison,
  * either side empty -> 0.0, transpositions integer-halved, the Winkler
  * prefix boost (cap 4, weight 0.1) applied only when the Jaro score
  * STRICTLY exceeds 0.7. Fixed float op order `((m/l1 + m/l2) +
  * (m-t)/m) / 3` then `sim + (p*0.1)*(1-sim)` replays bit-identically in
  * an IEEE engine evaluating the same order — which is what lets an
  * independent SQL oracle hash-check the raw doubles. The matching pass
  * is the standard windowed greedy (window = max(l1,l2)/2 - 1, floor 0).
  *
  * The record-linkage complement of levenshtein: edit distance counts
  * ANY edits, Jaro-Winkler weighs agreement and rewards shared prefixes
  * — the standard name/title matcher. Byte-based also means no decode:
  * evaluation runs directly on the UTF8String buffer. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler needs (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
}

object JaroWinkler {
  /** The kernel, shared by interpreted eval and generated code. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max((if (l1 > l2) l1 else l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + w)
      var j = math.max(0, i - w)
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1; matched = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val cap = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < cap && s1(p) == s2(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** BM25 per-(doc, query) scoring fold — the native form of the
  * `aggregate(qarr, struct(0.0, 0L), …)` HOF in
  * [[graft.operators.Retrieval]]'s scoreMatched (kept there in scaladoc as
  * the reference semantics). Inputs: the doc's matched-term bag
  * `qtfs: array<struct<tok: string, tf: long>>`, the query's ti-ordered
  * term table `qarr: array<struct<ti: int, term: string, idf: double>>`,
  * and the precomputed per-doc length normalizer
  * `norm = k1·(1−b + b·dl/avgdl)` (built by the caller with the exact
  * expression the HOF lambda closed over — same double, same op order).
  * `k1p1` is k1+1 as a literal parameter.
  *
  * Per qarr element, in array order (exactly the HOF's left fold):
  *   tf = first qtfs entry whose tok equals term (filter order; a missing
  *        term, a null term, or a null tf field reads 0) cast to double
  *   s += (idf · (tf · k1p1)) / (tf + norm)    [unconditionally — a 0-tf
  *        term adds +0.0, exactly as the HOF does]
  *   h += tf.toLong
  * Null qtfs ELEMENTS are skipped (the HOF's filter drops them); a null
  * qarr element or null idf poisons s to null from that point on while h
  * keeps accumulating — bit-for-bit the HOF's struct-field null algebra.
  * Result: struct<s: double, h: long> (s nullable).
  *
  * Why native: the HOF ran interpreted — per (matched doc, query) pair a
  * lambda frame per term AND a fresh filtered array per tf lookup; that
  * scan was the whole cost of every BM25 scoring round (two rounds in
  * bm25WithFeedback). The query table decodes per row, deliberately
  * uncached — see the in-class comment. */
case class Bm25Fold(
    first: Expression,
    second: Expression,
    third: Expression,
    k1p1: Double)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("h", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bagOk = first.dataType match {
      case ArrayType(StructType(f), _) if f.length == 2 &&
        f(0).dataType == StringType && f(1).dataType == LongType => true
      case _ => false
    }
    val qOk = second.dataType match {
      case ArrayType(StructType(f), _) if f.length == 3 &&
        f(1).dataType == StringType && f(2).dataType == DoubleType => true
      case _ => false
    }
    if (bagOk && qOk && third.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bm25_fold needs (array<struct<string,bigint>>, " +
          "array<struct<int,string,double>>, double), got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  // NO decoded-input cache here, deliberately: unlike PqCode/Sq8L2 —
  // whose cached object is the ONE broadcast codebook/census, so any
  // re-decode reproduces identical content and staleness is harmless —
  // qarr cycles through |queries| DIFFERENT contents row by row, and a
  // cached multi-content decode measurably served one query's idfs to
  // another's rows in the full q_bm25 plan (r18 probe: scores off only
  // for the middle query, hits — term lookups — unaffected). A query's
  // term table is 3-5 entries; decoding it per row is noise next to the
  // HOF's per-term lambda frames.

  override def nullSafeEval(bag: Any, q: Any, nrm: Any): Any = {
    val qtfs = bag.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val qarr = q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val norm = nrm.asInstanceOf[Double]
    val nBag = qtfs.numElements()
    var s = 0.0
    var sNull = false
    var h = 0L
    var i = 0
    val k = qarr.numElements()
    while (i < k) {
      var term: UTF8String = null
      var idf: java.lang.Double = null
      if (!qarr.isNullAt(i)) {
        val st = qarr.getStruct(i, 3)
        if (!st.isNullAt(1)) term = st.getUTF8String(1)
        if (!st.isNullAt(2)) idf = java.lang.Double.valueOf(st.getDouble(2))
      }
      // first qtfs entry whose tok equals term; null bag elements, null
      // toks and null tf fields read as "no/zero tf" (the HOF's
      // filter + try_element_at + coalesce chain)
      var tf = 0.0
      if (term != null) {
        var j = 0
        var found = false
        while (j < nBag && !found) {
          if (!qtfs.isNullAt(j)) {
            val e = qtfs.getStruct(j, 2)
            if (!e.isNullAt(0) && e.getUTF8String(0).equals(term)) {
              found = true
              if (!e.isNullAt(1)) tf = e.getLong(1).toDouble
            }
          }
          j += 1
        }
      }
      if (!sNull) {
        if (idf == null) sNull = true
        else s += (idf.doubleValue() * (tf * k1p1)) / (tf + norm)
      }
      h += tf.toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      if (sNull) null else java.lang.Double.valueOf(s), h)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Bm25Fold =
    copy(first = f, second = s, third = t)
}

/** All `windowTokens`-token window hashes of a token array, one pass —
  * the native form of the spanWindows HOF
  * `transform(sequence(0, n−L), i => md5(array_join(slice(__t, i+1, L),
  * " ")))` (kept at the call site in scaladoc as the reference).
  * Element i of the result is the md5 hex (lowercase, UTF8 bytes — the
  * Spark/DuckDB md5-of-string) of the SPACE-joined tokens [i, i+L);
  * arrays shorter than L yield an empty array (the sequence guard's
  * `otherwise(empty)`), and null elements are skipped WITHOUT a
  * separator, exactly array_join's null handling. Null input -> null
  * (explodes to zero rows, same as the empty array).
  *
  * Why native: the HOF paid a lambda frame + a fresh slice array + a
  * fresh joined string per START POSITION per document, interpreted —
  * the whole single-task cost of the ExactSubstr census scan. This
  * builds each window's bytes into one reused buffer and hashes in
  * place. MessageDigest is per-thread (ThreadLocal): expression
  * instances can be shared across local-mode task threads. */
case class SpanWindowHashes(child: Expression, windowTokens: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if windowTokens >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_window_hashes needs array<string> and windowTokens >= 1, " +
            s"got ${child.dataType} / $windowTokens")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val L = windowTokens
    if (n < L) return new GenericArrayData(Array.empty[Any])
    val md = SpanWindowHashes.digest.get()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - L + 1)
    val sep = ' '.toByte
    var s = 0
    while (s <= n - L) {
      md.reset()
      var first = true
      var j = s
      while (j < s + L) {
        val t = toks(j)
        if (t != null) { // array_join skips nulls without a separator
          if (!first) md.update(sep)
          md.update(t)
          first = false
        }
        j += 1
      }
      out(s) = UTF8String.fromString(
        SpanWindowHashes.hex(md.digest()))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SpanWindowHashes =
    copy(child = c)
}

object SpanWindowHashes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexChars((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** All ordered within-window token pairs (t_i, t_j), i < j <= i+window —
  * the TextRank co-occurrence pair generator, native. Replicates the
  * composed HOF (kept at the call site in scaladoc as the reference)
  * element-for-element in the same (i asc, j asc) order:
  * `flatten(transform(sequence(0, n−2), i => transform(sequence(i+1,
  * least(i+window, n−1)), j => struct(t[i+1], t[j+1]))))`.
  * Arrays shorter than 2 yield an empty array; a null input yields an
  * empty array (the caller filters size >= 2 first, so both are
  * unreachable there). The HOF paid two nested lambda frames plus a
  * struct alloc per pair, interpreted — the whole graph-build scan. */
case class WindowedPairs(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if window >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"windowed_pairs needs array<string> and window >= 1, " +
            s"got ${child.dataType} / $window")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case v => nullSafeEval(v)
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val buf = new scala.collection.mutable.ArrayBuffer[Any](n * window)
    i = 0
    while (i <= n - 2) {
      val hi = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= hi) {
        buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](toks(i), toks(j)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WindowedPairs =
    copy(child = c)
}
