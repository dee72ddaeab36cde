package graft

import graft.functions.QualityFilters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher (Rae et al. 2021) + C4 (Raffel et al. 2020) quality-filter
  * suites: the fused [[graft.functions.C4LineFilter]] must be
  * bit-identical to the composed HOF reference formulation, and each
  * Gopher rule must trip on the document shape it was written for. */
class QualityFiltersSpec extends AnyFunSuite with SparkSpec {

  private val edgeTexts: Seq[String] = Seq(
    // multi-line page: good line / short line / no terminal punct / js line
    "this is a perfectly good sentence here.\nshort one.\nno punctuation at the end\nthis line mentions JavaScript sadly.",
    // terminal-punct variants, incl. the unicode close-quote
    "ends with bang word now!\nends with question mark now?\nends with quote now ”\nends with curly quote today.”",
    // trailing newline -> empty last line candidate; blank middle line
    "first good line is right here.\n\nlast good line is right here.\n",
    // space-only and tab-edged lines (ASCII-space trim semantics)
    "   \n\tone two three four.\n  padded line with five words.  ",
    // single line, no newline at all
    "just one single plain line of text.",
    "", null)

  private def bothC4(minWords: Int) = {
    import spark.implicits._
    val df = edgeTexts.toDF("t")
    val comp = QualityFilters.c4CleanComposed(col("t"), minWords)
    val fused = QualityFilters.c4Clean(col("t"), minWords)
    df.select(
      comp.map { case (n, c) => c.as("comp_" + n) } ++
        fused.map { case (n, c) => c.as("fused_" + n) }: _*).collect()
  }

  test("C4LineFilter fused output is identical to the composed HOF formulation") {
    for (minWords <- Seq(1, 3, 5); r <- bothC4(minWords)) {
      assert(r.getAs[String]("comp_clean_text") == r.getAs[String]("fused_clean_text"),
        s"minWords=$minWords row=$r")
      assert(r.getAs[Long]("comp_n_kept_lines") == r.getAs[Long]("fused_n_kept_lines"),
        s"minWords=$minWords row=$r")
    }
  }

  test("C4 line rules: punct-terminated kept, short/unterminated/javascript dropped") {
    import spark.implicits._
    val page = edgeTexts.head
    val r = Seq(page).toDF("t")
      .select(QualityFilters.c4Clean(col("t"), 3).map { case (n, c) => c.as(n) }: _*)
      .first()
    assert(r.getAs[String]("clean_text") == "this is a perfectly good sentence here.")
    assert(r.getAs[Long]("n_kept_lines") == 1L)
  }

  test("C4 page keep: lorem ipsum and curly braces drop the page on RAW text") {
    import spark.implicits._
    val pages = Seq(
      "good line number one stays here.\ngood line number two stays here.",
      "Lorem Ipsum dolor sit amet today.\ngood line number two stays here.",
      "good line number one stays here.\ncode goes { right here } now.")
    val df = pages.toDF("t")
    val cols = QualityFilters.c4Clean(col("t"), 3).toMap
    val got = df.select(
      QualityFilters.c4DocKeep(col("t"), cols("n_kept_lines"), minKeptLines = 2)
        .as("keep")).collect().map(_.getBoolean(0)).toSeq
    // page 2: lorem ipsum (case-insensitive); page 3: '{' even though the
    // offending line itself would have survived the line filter
    assert(got == Seq(true, false, false))
  }

  test("GopherSignals fused counts are identical to the composed formulation") {
    import spark.implicits._
    val texts = edgeTexts ++ Seq(
      "# ## ### .... ..... …\n…\n...",          // symbol/ellipsis pile-ups
      "- dash line\n* star line\n• bullet line", // every bullet marker
      "\tthe tab-edged a line of it \n",         // trim-vs-\s divergence edges
      "the a of and to in is it the the")        // pure stopwords
    val df = texts.toDF("t")
    val rows = df.select(
      QualityFilters.gopherCountsComposed(col("t")).map { case (n, c) => c.as("c_" + n) } ++
        QualityFilters.gopherCounts(col("t")).map { case (n, c) => c.as("f_" + n) }: _*)
      .collect()
    for (r <- rows; f <- graft.functions.GopherSignals.fields)
      assert(r.getAs[Long]("c_" + f) == r.getAs[Long]("f_" + f), s"$f in $r")
  }

  private def gopherRow(text: String, minWords: Int = 5): Row = {
    import spark.implicits._
    Seq(text).toDF("t").select(
      QualityFilters.gopherCounts(col("t")).map { case (n, c) => c.as(n) } :+
        QualityFilters.gopherKeep(col("t"), minWords = minWords).as("keep"): _*)
      .first()
  }

  test("gopherCounts signals are exact on a hand-built document") {
    val doc = "the cat sat on # the mat ...\n- bullet line here\nplain line ..."
    val r = gopherRow(doc)
    assert(r.getAs[Long]("n_tokens") == 15L)
    assert(r.getAs[Long]("sum_token_len") ==
      doc.split("\\s+").filter(_.nonEmpty).map(_.length).sum.toLong)
    assert(r.getAs[Long]("n_alpha_tokens") == 11L) // all but #, -, ..., ...
    assert(r.getAs[Long]("n_stop") == 2L)          // the, the
    assert(r.getAs[Long]("n_symbols") == 3L)       // one '#', two '...'
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("n_bullet_lines") == 1L)
    assert(r.getAs[Long]("n_ellipsis_lines") == 2L) // lines 1 and 3 end in ...
  }

  test("gopherKeep trips each rule on the document shape it targets") {
    // mean token length must clear 3.0, so longer content words than the
    // classic pangram filler
    val good = "the quick brown foxes jumped over the lazy sleeping dogs and " +
      "it is quite a pleasant sunny day outside today"
    assert(gopherRow(good).getAs[Boolean]("keep"))
    // too few words
    assert(!gopherRow("the cat sat", minWords = 5).getAs[Boolean]("keep"))
    // mean word length < 3
    assert(!gopherRow("a a a a a of the is it to in a a a a").getAs[Boolean]("keep"))
    // symbol flood: > 10% '#'
    assert(!gopherRow(good + " # # # # # # #").getAs[Boolean]("keep"))
    // ellipsis-terminated lines > 30%
    assert(!gopherRow("the cat sat on the mat and ...\nit is a good day to ...")
      .getAs[Boolean]("keep"))
    // bullet lines > 90%
    assert(!gopherRow("- the cat sat on the mat today").getAs[Boolean]("keep"))
    // alpha-token fraction < 80%
    assert(!gopherRow("the cat sat on the mat 1 2 3 4 5 6 7 8 9").getAs[Boolean]("keep"))
    // < 2 stopword hits
    assert(!gopherRow("cats sit around mats every single sunny day outside")
      .getAs[Boolean]("keep"))
  }

  test("null and empty text produce zero counts and keep=false, never null") {
    for (t <- Seq(null.asInstanceOf[String], "")) {
      val r = gopherRow(t)
      assert(!r.anyNull, r.toString)
      assert(r.getAs[Long]("sum_token_len") == 0L)
      assert(!r.getAs[Boolean]("keep"))
    }
  }
}
