package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document-level quality filter suites from the public training-data
  * literature: the Gopher heuristic rules (Rae et al. 2021, MassiveText) and
  * the C4 line/page filters (Raffel et al. 2020). The reference engine has
  * no equivalent — these are part of the LLM-pipeline surface this library
  * adds on top of its operator set.
  *
  * Design rules shared with [[TextFunctions.qualityCounts]]:
  *   - counts, not ratios: every signal is an exact integer, so the DuckDB
  *     oracle hash-matches bit-for-bit, and every threshold test is
  *     integer cross-multiplication (`10 * n_symbols <= n_tokens` instead
  *     of `n_symbols / n_tokens <= 0.1`) — division-free, overflow-safe at
  *     document sizes, no float-rounding drift between engines;
  *   - RE2-compatible patterns only (no lookaround) so Spark's codegen'd
  *     regexp kernels and DuckDB compute identical counts;
  *   - null text behaves like empty text (the sibling ops' convention).
  *
  * All signals are pure per-row codegen'd primitives: scan-bound, zero
  * shuffles at any scale. */
object QualityFilters {

  private def txt(text: Column): Column = coalesce(text, lit(""))

  /** The Gopher rule signals as exact longs, via the fused
    * [[GopherSignals]] expression: one whitespace split + char scans per
    * document instead of the composed form's eight regexp passes and
    * interpreted per-token stopword lambda. Identical output —
    * spec-pinned against [[gopherCountsComposed]]. */
  def gopherCounts(text: Column): Seq[(String, Column)] = {
    import org.apache.spark.sql.GraftExpr
    val st = GraftExpr.column(
      GopherSignals(GraftExpr.expression(txt(text)), TextFunctions.stopwords.head._2))
    GopherSignals.fields.map(f => f -> st.getField(f))
  }

  /** The Gopher rule signals, COMPOSED reference implementation (backs the
    * spec; the gate/scale path is [[gopherCounts]]). `n_symbols` counts `#`
    * characters plus `...` occurrences (the paper's "symbol" set);
    * `n_alpha_tokens` counts whitespace-tokens containing at least one
    * ASCII letter; bullet/ellipsis line counts follow the paper's
    * line-shape rules. */
  def gopherCountsComposed(text: Column): Seq[(String, Column)] = {
    val t = txt(text)
    val nHash = length(t) - length(replace(t, lit("#"), lit("")))
    val nDots = (length(t) - length(replace(t, lit("..."), lit("")))) / 3
    Seq(
      "n_tokens" -> size(TextFunctions.tokens(t)).cast("long"),
      // Σ length(token) == count of non-ws chars (same identity as
      // qualityCounts' sumTokenLength)
      "sum_token_len" -> length(regexp_replace(t, "\\s", "")).cast("long"),
      // one match per token containing a letter: the prepended space gives
      // every token a leading `\s`, a match consumes that space plus part
      // of the token, and a second match inside the same token is
      // impossible (no `\s` left before the next real token)
      "n_alpha_tokens" ->
        regexp_count(concat(lit(" "), t), lit("\\s\\S*[A-Za-z]")).cast("long"),
      "n_stop" -> TextFunctions.stopwordCount(t).cast("long"),
      "n_symbols" -> (nHash + nDots.cast("int")).cast("long"),
      "n_lines" -> size(split(t, "\n")).cast("long"),
      "n_bullet_lines" ->
        regexp_count(concat(lit("\n"), t), lit("\n[-*•]")).cast("long"),
      "n_ellipsis_lines" ->
        regexp_count(concat(t, lit("\n")), lit("(\\.\\.\\.|…)\n")).cast("long"))
  }

  /** The Gopher keep decision over [[gopherCounts]], all thresholds as
    * integer cross-multiplications. Defaults are the paper's published
    * bounds: 50..100k words, mean word length 3..10, symbol/word <= 0.1,
    * <= 90% bullet lines, <= 30% ellipsis-ending lines, >= 80% of words
    * alphabetic, >= 2 stopword hits. */
  def gopherKeep(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val c = gopherCounts(text).toMap
    val nTok = c("n_tokens")
    (nTok >= minWords) && (nTok <= maxWords) &&
      (c("sum_token_len") >= nTok * 3) && (c("sum_token_len") <= nTok * 10) &&
      (c("n_symbols") * 10 <= nTok) &&
      (c("n_bullet_lines") * 10 <= c("n_lines") * 9) &&
      (c("n_ellipsis_lines") * 10 <= c("n_lines") * 3) &&
      (c("n_alpha_tokens") * 5 >= nTok * 4) &&
      (c("n_stop") >= 2)
  }

  /** C4 line filter, COMPOSED reference implementation (higher-order
    * functions evaluate interpreted — this formulation defines the
    * semantics and backs the spec; the gate/scale path is the fused
    * [[C4LineFilter]] expression via [[c4Clean]]). A line survives iff it
    * ends in terminal punctuation (`.!?"”`), carries at least
    * `minLineWords` whitespace-tokens, and does not mention "javascript"
    * (case-insensitive) — the paper's line rules. */
  def c4CleanComposed(text: Column, minLineWords: Int = 3): Seq[(String, Column)] = {
    val kept = filter(split(txt(text), "\n"), l =>
      l.rlike("[.!?\"”]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    Seq(
      "clean_text" -> array_join(kept, "\n"),
      "n_kept_lines" -> size(kept).cast("long"))
  }

  /** C4 line filter via the fused native expression: one pass per document
    * (split, test, rejoin in a tight JVM loop) instead of the interpreted
    * per-line lambda frames of the HOF formulation. Identical output —
    * spec-pinned against [[c4CleanComposed]]. */
  def c4Clean(text: Column, minLineWords: Int = 3): Seq[(String, Column)] = {
    import org.apache.spark.sql.GraftExpr
    val st = GraftExpr.column(C4LineFilter(GraftExpr.expression(txt(text)), minLineWords))
    Seq(
      "clean_text" -> st.getField("clean_text"),
      "n_kept_lines" -> st.getField("n_kept_lines"))
  }

  /** C4's PAGE-level keep: at least `minKeptLines` surviving lines, and the
    * original page mentions neither "lorem ipsum" (case-insensitive) nor a
    * curly brace (the paper's code-page heuristic). Evaluated on the RAW
    * text — a page is dropped for containing `{` even if the offending
    * line would have been filtered. */
  def c4DocKeep(text: Column, nKeptLines: Column, minKeptLines: Int = 1): Column = {
    val t = txt(text)
    (nKeptLines >= minKeptLines) &&
      !lower(t).contains("lorem ipsum") &&
      !t.contains("{")
  }
}
