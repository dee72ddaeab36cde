package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).first().get(0)
  }

  test("tokens splits on whitespace runs like the reference (Operators.java:166)") {
    assert(one(TextFunctions.tokens(col("t")), "  a  b\tc ")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
  }

  test("shingles produce n-grams; short docs yield empty") {
    assert(one(TextFunctions.shingles(col("t"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b c", "b c d"))
    assert(one(TextFunctions.shingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("shinglesNative is element-identical to the composed shingles") {
    import spark.implicits._
    // "\tp q\n": Spark/DuckDB trim strips SPACES only, so the tab and
    // newline survive into the token stream — the native expression must
    // not Java-trim them away
    val texts = Seq("a b c d e", "x x x", "one two", "solo", "", "  p  q  r  ",
      "\tp q\n", " \t mixed edge \n ", null)
    val df = texts.toDF("t")
    val both = df.select(
      TextFunctions.shingles(col("t"), 2).as("hof"),
      TextFunctions.shinglesNative(col("t"), 2).as("native")).collect()
    // includes the NULL row: both formulations yield an EMPTY array, not null
    both.foreach(r => assert(!r.isNullAt(0) && !r.isNullAt(1) &&
      r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("jaccard of identical sets is 1.0, disjoint is 0.0") {
    import spark.implicits._
    val df = Seq(("x y z", "x y z"), ("a b c", "d e f")).toDF("l", "r")
    val got = df.select(TextFunctions.jaccard(
      TextFunctions.shingleSet(col("l"), 1), TextFunctions.shingleSet(col("r"), 1)))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("charNgrams: code-point trigrams, short strings empty, unicode intact") {
    assert(one(TextFunctions.charNgrams(col("t")), "abcd")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abc", "bcd"))
    assert(one(TextFunctions.charNgrams(col("t")), "ab").asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(one(TextFunctions.charNgrams(col("t")), " AbC ")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abc")) // lowered + trimmed
    assert(one(TextFunctions.charNgrams(col("t")), "的是了在")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("的是了", "是了在"))
  }

  test("langIdNgram matches an independent trigram-count reimplementation") {
    import spark.implicits._
    val texts = Seq(
      "the cat and the dog in the house",
      "el perro y el gato en la casa que",
      "der hund und die katze ist nicht da",
      "le chat et les chiens dans une maison",
      "的 是 了 在 我 有 和 不",  // spaced, like the synthetic zh docs
      "zzzz qqqq", "", "ab")
    val got = texts.toDF("t")
      .select(TextFunctions.langIdNgram(col("t"))).collect().map(_.getString(0)).toSeq
    def expected(text: String): String = {
      val t = text.trim.toLowerCase
      val tris = if (t.length < 3) Seq.empty else t.sliding(3).toSeq
      val scores = TextFunctions.trigramProfiles.map { case (lang, ps) =>
        lang -> tris.count(ps.toSet)
      }
      val best = (0 +: scores.map(_._2)).max
      if (best == 0) "und" else scores.find(_._2 == best).get._1
    }
    assert(got.toSeq == texts.map(expected))
    // the obvious cases actually classify
    assert(got.take(5).toSeq == Seq("en", "es", "de", "fr", "zh"))
  }

  test("langId: stopword argmax with listed-order ties, und when no hits") {
    assert(one(TextFunctions.langId(col("t")), "the cat of the hat is it") == "en")
    assert(one(TextFunctions.langId(col("t")), "el que la de los y") == "es")
    assert(one(TextFunctions.langId(col("t")), "xyzzy plugh") == "und")
    // 'de' is in both es and fr lists; es wins (listed first)
    assert(one(TextFunctions.langId(col("t")), "de") == "es")
  }

  test("quality counts are exact integers") {
    import spark.implicits._
    val cols = TextFunctions.qualityCounts(col("t")).map { case (n, c) => c.as(n) }
    val r = Seq("the cat sat").toDF("t").select(cols: _*).first()
    assert(r.getAs[Long]("n_chars") == 11L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("sum_token_len") == 9L)
    assert(r.getAs[Long]("n_stop") == 1L)
  }

  test("bpe estimate counts alnum runs plus punctuation chars") {
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "a,b c!") == 5)
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "hello world") == 2)
    assert(one(TextFunctions.bpeTokenEstimate(col("t")), "don't stop") == 4)
  }

  test("normalizeText lowercases, collapses whitespace, optionally strips punctuation") {
    assert(one(TextFunctions.normalizeText(col("t")), "  The   QUICK\t\nfox  ") ==
      "the quick fox")
    assert(one(TextFunctions.normalizeText(col("t"), stripPunct = true),
      "Don't  stop -- EVER!") == "don t stop ever")
    // punctuation kept by default
    assert(one(TextFunctions.normalizeText(col("t")), "A, b!") == "a, b!")
    // normalized twins shingle identically (the dedup preprocessing point)
    import spark.implicits._
    val r = Seq(("The quick  brown fox", "the QUICK brown\tfox"))
      .toDF("a", "b").select(
        TextFunctions.shingleSet(TextFunctions.normalizeText(col("a")), 2).as("sa"),
        TextFunctions.shingleSet(TextFunctions.normalizeText(col("b")), 2).as("sb"))
      .selectExpr("array_sort(sa) = array_sort(sb) AS eq").first()
    assert(r.getBoolean(0))
  }

  test("redactPii scrubs emails, IPs, card numbers and phone shapes; plain text untouched") {
    def red(s: String) = one(TextFunctions.redactPii(col("t")), s)
    assert(red("mail jane.doe+x@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(red("host 192.168.1.254 down") == "host <IP> down")
    assert(red("card 4111222233334444 declined") == "card <LONGNUM> declined")
    assert(red("call 555-123-4567 or 555.1234.5678") == "call <PHONE> or <PHONE>")
    // order: the email pattern wins over the digit patterns inside it
    assert(red("a12345678901234@b.com") == "<EMAIL>")
    // non-PII digits survive: years, short ids, versions
    assert(red("v2.1 in 2024 build 1234567") == "v2.1 in 2024 build 1234567")
    assert(red("no pii here at all") == "no pii here at all")
  }

  test("deflateSize: repetitive < prose < noise ordering, deterministic, null/empty sane") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString
    val prose = ("the quick brown fox jumps over the lazy dog while carrying " +
      "a surprisingly heavy basket of fresh garden vegetables ") * 18
    val repetitive = "spam " * 400
    val df = Seq((1L, repetitive), (2L, prose.take(2000)), (3L, noise),
      (4L, ""), (5L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"), TextFunctions.deflateSize(col("text")).as("dl"),
        octet_length(col("text")).cast("long").as("bl"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    def ratio(id: Long) = { val (d, b) = got(id).get; d.toDouble / b }
    assert(ratio(1L) < ratio(2L) && ratio(2L) < ratio(3L),
      s"ordering: ${ratio(1L)} ${ratio(2L)} ${ratio(3L)}")
    assert(ratio(1L) < 0.05 && ratio(3L) > 0.8)
    assert(got(4L).get._1 > 0L, "empty text still emits the deflate terminator")
    assert(got(5L).isEmpty, "null -> null")
    // partition-invariant and rerun-stable within one JVM
    val again = df.repartition(4)
      .select(col("id"), TextFunctions.deflateSize(col("text")).as("dl"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert((1L to 5L).forall(i => again(i) == got(i).map(_._1)))
  }

  test("duplicateTokenFraction: 0 for all-unique, rises with repeats, 0 for empty") {
    assert(one(TextFunctions.duplicateTokenFraction(col("t")), "a b c d") == 0.0)
    assert(one(TextFunctions.duplicateTokenFraction(col("t")), "a a a a") == 0.75)
    assert(one(TextFunctions.duplicateTokenFraction(col("t")), "a b a b") == 0.5)
    assert(one(TextFunctions.duplicateTokenFraction(col("t")), "") == 0.0)
  }

  test("native topBigramFraction equals the HOF reference on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val words = Seq("a", "b", "c", "dd", "ee")
    val docs = (Seq.fill(60)(Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
      .mkString(" ")) ++ Seq("", "solo", "  x  x  x  ", "\ta b\n", " \t z z \n ", null))
      .toDF("t")
    val both = docs.select(
      TextFunctions.topBigramFraction(col("t")).as("native"),
      TextFunctions.topBigramFractionHof(col("t")).as("hof")).collect()
    // includes the NULL row: both yield 0.0 (matching duplicateTokenFraction
    // and the oracles' coalesce) — a null-propagating native would silently
    // drop null-text rows from threshold filters the oracle keeps
    both.foreach(r => assert(!r.isNullAt(0) && r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("topBigramFraction: dominant phrase share, exact on crafted docs") {
    // "x y" appears 3 times of 5 bigrams: x y x y x y
    assert(one(TextFunctions.topBigramFraction(col("t")), "x y x y x y") == 0.6)
    // all bigrams distinct -> 1/3
    assert(one(TextFunctions.topBigramFraction(col("t")), "a b c d") ==
      1.0 / 3.0)
    // short docs have no bigrams
    assert(one(TextFunctions.topBigramFraction(col("t")), "solo") == 0.0)
    assert(one(TextFunctions.topBigramFraction(col("t")), "") == 0.0)
  }

  test("charProfile: exact integer diversity stats, code-point units") {
    import spark.implicits._
    val r = Seq("aabbc").toDF("t")
      .select(TextFunctions.charProfile(col("t")).as("p")).collect()(0)
      .getStruct(0)
    assert(r.getAs[Long]("n_cp") == 5)
    assert(r.getAs[Long]("n_distinct") == 3)
    assert(r.getAs[Long]("max_cnt") == 2)
    assert(r.getAs[Long]("sum_sq") == 4 + 4 + 1)
    // Shannon entropy of {2/5, 2/5, 1/5}
    assert(math.abs(r.getAs[Double]("entropy_bits") - 1.5219280948873621) < 1e-12)
    // non-BMP chars count ONCE (code points, not UTF-16 units): emoji is
    // a surrogate pair in the JVM but one element in DuckDB's split
    val emoji = Seq("\ud83d\ude00\ud83d\ude00x").toDF("t")
      .select(TextFunctions.charProfile(col("t")).as("p")).collect()(0)
      .getStruct(0)
    assert(emoji.getAs[Long]("n_cp") == 3)
    assert(emoji.getAs[Long]("n_distinct") == 2)
    assert(emoji.getAs[Long]("max_cnt") == 2)
  }

  test("charProfile: null and empty behave as zero profile") {
    import spark.implicits._
    val rows = Seq(Some(""), None).toDF("t")
      .select(TextFunctions.charProfile(col("t")).as("p")).collect()
    rows.foreach { row =>
      val p = row.getStruct(0)
      assert(p.getAs[Long]("n_cp") == 0 && p.getAs[Long]("n_distinct") == 0 &&
        p.getAs[Long]("max_cnt") == 0 && p.getAs[Long]("sum_sq") == 0 &&
        p.getAs[Double]("entropy_bits") == 0.0)
    }
  }

  test("charProfile: uniform text maximizes diversity (Renyi-2 relation)") {
    import spark.implicits._
    // uniform over 4 chars: Renyi-2 = log2(n^2/sum_sq) = log2(16/4) = 2 bits
    val p = Seq("abcd").toDF("t")
      .select(TextFunctions.charProfile(col("t")).as("p")).collect()(0)
      .getStruct(0)
    val renyi2 = math.log(
      p.getAs[Long]("n_cp").toDouble * p.getAs[Long]("n_cp") /
        p.getAs[Long]("sum_sq")) / math.log(2)
    assert(renyi2 == 2.0)
    assert(p.getAs[Double]("entropy_bits") == 2.0)
    // repeated single char: zero entropy, sum_sq = n^2
    val q = Seq("zzzz").toDF("t")
      .select(TextFunctions.charProfile(col("t")).as("p")).collect()(0)
      .getStruct(0)
    assert(q.getAs[Long]("sum_sq") == 16 && q.getAs[Double]("entropy_bits") == 0.0)
  }

  test("readabilitySignals: counts and FK grade on hand-checked text") {
    import spark.implicits._
    val df = Seq("The cat sat. It purred!? Good cat.").toDF("t")
      .select(TextFunctions.readabilitySignals(col("t"))
        .map { case (n, c) => c.as(n) }: _*)
    val r = df.collect()(0)
    // whitespace tokens (punctuation attaches): The|cat|sat.|It|purred!?|
    // Good|cat. -> 7
    assert(r.getAs[Long]("n_words") == 7)
    assert(r.getAs[Long]("n_sentences") == 3) // "!?" is ONE terminal run
    // vowel groups: The(1) cat(1) sat(1) It(1) purred(2: u, e) Good(1: oo)
    // cat(1) -> 8
    assert(r.getAs[Long]("n_syllables") == 8)
    val grade = 0.39 * (7.0 / 3) + 11.8 * (8.0 / 7) - 15.59
    assert(math.abs(r.getAs[Double]("fk_grade") - grade) < 1e-9)
    // degenerate inputs: no punctuation -> 1-sentence floor; empty text
    // -> split yields one empty token (the corpus-wide convention), no NaN
    val e = Seq("", "no stops here").toDF("t")
      .select(TextFunctions.readabilitySignals(col("t"))
        .map { case (n, c) => c.as(n) }: _*).collect()
    assert(e(0).getAs[Long]("n_sentences") == 0 && !e(0).getAs[Double]("fk_grade").isNaN)
    assert(e(1).getAs[Long]("n_words") == 3)
    // fk_grade is round(·, 12) — compare to the raw formula with tolerance
    assert(math.abs(e(1).getAs[Double]("fk_grade") -
      (0.39 * 3.0 + 11.8 * (4.0 / 3) - 15.59)) < 1e-9)
  }

  test("hashedBowMargin: bit-equals an independent replay of the md5-bucket fold") {
    import spark.implicits._
    val weights = (0 until 16).map(b => ((b * 7919) % 201 - 100) / 1e6)
    // independent reference: JDK MessageDigest md5 -> first 15 hex chars
    // -> decimal -> mod buckets, folded in token order
    def bucket(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.substring(0, 15), 16) % weights.length).toInt
    }
    def expected(text: String, bias: Double): Double =
      text.trim.split("\\s+", -1).foldLeft(bias)((acc, t) => acc + weights(bucket(t)))
    val docs = Seq("the quick brown fox", "a a a repeated tokens a",
      "single", "  padded   whitespace  ", "ünïcôde tökens")
      .toDF("text")
    val got = docs.select(col("text"),
        TextFunctions.hashedBowMargin(col("text"), weights, bias = 0.25).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    docs.collect().map(_.getString(0)).foreach { t =>
      assert(got(t) == expected(t, 0.25), s"margin mismatch for '$t'")
    }
    // filter semantics: keep iff margin > 0 (a pure scan predicate)
    val kept = docs.filter(
      TextFunctions.hashedBowMargin(col("text"), weights, bias = 0.25) > 0.0).count()
    assert(kept == docs.collect().count(r => expected(r.getString(0), 0.25) > 0.0))
  }

  test("stripMarkup: script/style/comment bodies vanish, tags flatten, " +
      "entities decode, whitespace collapses") {
    import spark.implicits._
    val html = "<html><body><script type=\"t\">var x = 1 < 2;</script>" +
      "<!-- secret -->  <p class=\"main\">Hello   <b>world</b></p>" +
      "<style>p { color: red; }</style>5 &lt; 6 &amp;&amp; &quot;q&#39;s&quot;&nbsp;ok</body></html>"
    val got = Seq(html).toDF("text")
      .select(TextFunctions.stripMarkup(col("text")).as("c"))
      .collect().head.getString(0)
    assert(got == "Hello world 5 < 6 && \"q's\" ok")
    // script/comment CONTENT must not leak as text
    assert(!got.contains("secret") && !got.contains("var x"))
  }

  test("stripMarkup: &amp; decodes LAST, so decoded text cannot double-decode") {
    import spark.implicits._
    val got = Seq("literal &amp;lt; stays").toDF("text")
      .select(TextFunctions.stripMarkup(col("text")).as("c"))
      .collect().head.getString(0)
    // "&amp;lt;" -> "&lt;" (the literal five chars), NOT "<"
    assert(got == "literal &lt; stays")
  }

  test("blocklistHits: whole-token lowercase matches only — embedded " +
      "substrings and case variants behave correctly") {
    import spark.implicits._
    val bl = Seq("bad", "worse")
    val got = Seq(
      ("bad BAD Bad fine", 3L),       // case-folded whole tokens
      ("xbadx badx xbad", 0L),        // substrings never trip
      ("worse bad worse", 3L),
      ("", 0L)).toDF("text", "want")
      .select(col("want"), TextFunctions.blocklistHits(col("text"), bl)
        .cast("long").as("got"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (want, g) => assert(g == want) }
    // list is lowercased on entry: mixed-case lexicons still match
    val up = Seq(("bad", 1L)).toDF("text", "want")
      .select(TextFunctions.blocklistHits(col("text"), Seq("BAD")).cast("long"))
      .collect()(0).getLong(0)
    assert(up == 1L)
  }

  test("extractUrls + canonicalizeUrl + urlDomain: case fold, default " +
      "ports, fragments, trailing slash") {
    import spark.implicits._
    val text = "x HTTP://Ex.COM:80/A/?q=1#f y https://S.NET:443/ z " +
      "http://a.org:8080/p/ w http://plain.io"
    val got = Seq(text).toDF("text")
      .select(explode(TextFunctions.extractUrls(col("text"))).as("u"))
      .select(col("u"), TextFunctions.canonicalizeUrl(col("u")).as("c"),
        TextFunctions.urlDomain(col("u")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      // :80 stripped for http, host folded, fragment dropped, path case kept
      ("HTTP://Ex.COM:80/A/?q=1#f", "http://ex.com/A/?q=1", "ex.com"),
      // :443 stripped for https, bare trailing slash dropped
      ("https://S.NET:443/", "https://s.net", "s.net"),
      // non-default port SURVIVES (8080 is not 80, endswith cannot confuse)
      ("http://a.org:8080/p/", "http://a.org:8080/p", "a.org"),
      ("http://plain.io", "http://plain.io", "plain.io")))
  }

  test("stripMarkup: malformed nesting degrades to whitespace, never drops prose") {
    import spark.implicits._
    val got = Seq("<p>keep <b>this</p> text</i> too").toDF("text")
      .select(TextFunctions.stripMarkup(col("text")).as("c"))
      .collect().head.getString(0)
    assert(got == "keep this text too")
  }

  test("luhn: known card numbers, check-digit derivation, non-digit and " +
      "short inputs invalid") {
    import spark.implicits._
    val df = Seq("4111111111111111", "4111111111111112", "79927398713",
      "4111-1111", "7").toDF("cc")
    val got = df.select(col("cc"), TextFunctions.luhnValid(col("cc")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "4111111111111111" -> true,   // the classic Visa test number
      "4111111111111112" -> false,  // one-digit tamper
      "79927398713" -> true,        // the textbook Luhn example
      "4111-1111" -> false,         // non-digit
      "7" -> false))                // too short
    // check digit of 7992739871 is 3 (completes the textbook number)
    val cd = Seq("7992739871").toDF("base")
      .select(TextFunctions.luhnCheckDigit(col("base"))).collect().head.getInt(0)
    assert(cd == 3)
    // native LuhnSum == the HOF reference on digit strings (null routes
    // differ on non-digits: kernel fail-fast vs folded cast-null)
    val digitCases = Seq("4111111111111111", "79927398713", "0", "99", "1234567890")
    val parity = digitCases.toDF("cc").select(
        TextFunctions.luhnChecksum(col("cc")).as("native"),
        TextFunctions.luhnChecksumHof(col("cc")).as("hof"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    parity.foreach { case (n, h) => assert(n == h) }
  }

  test("iban: known-valid vectors, tamper detection, check-digit " +
      "derivation, strict-format nulls invalid") {
    import spark.implicits._
    val df = Seq(
      "GB82WEST12345698765432",  // the ISO 13616 worked example
      "DE89370400440532013000",  // the standard German sample
      "GB82WEST12345698765431",  // last-digit tamper
      "GB28WEST12345698765432",  // check-digit tamper
      "gb82WEST12345698765432",  // lowercase: strict electronic only
      "GB82 WEST 1234 5698 7654 32", // paper format (spaces)
      "DE12").toDF("iban")       // too short
    val got = df.select(col("iban"),
        TextFunctions.ibanValid(col("iban")).as("v"),
        TextFunctions.ibanMod97(col("iban")).as("m"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))))
      .toMap
    assert(got("GB82WEST12345698765432") == ((true, Some(1))))
    assert(got("DE89370400440532013000") == ((true, Some(1))))
    assert(got("GB82WEST12345698765431")._1 == false)
    assert(got("GB28WEST12345698765432")._1 == false)
    assert(got("gb82WEST12345698765432") == ((false, None)))
    assert(got("GB82 WEST 1234 5698 7654 32") == ((false, None)))
    assert(got("DE12") == ((false, None)))
    // generation: deriving the check digits of a known IBAN's BBAN
    // reproduces its published check digits, and the result validates
    val rebuilt = Seq(("GB", "WEST12345698765432")).toDF("cc", "bban")
      .select(concat(col("cc"),
        TextFunctions.ibanCheckDigits(col("cc"), col("bban")),
        col("bban")).as("iban"))
      .select(col("iban"), TextFunctions.ibanValid(col("iban")).as("v"))
      .collect().head
    assert(rebuilt.getString(0) == "GB82WEST12345698765432")
    assert(rebuilt.getBoolean(1))
  }

  test("codeScore: exact weighted counts on a hand snippet; prose scores 0") {
    import spark.implicits._
    // 1x'{' 1x'}' (x3) + 2x';' (x3) + 2x'=' (x2) + 2x'(' 2x')' +
    // 1 function + 1 'return ' + 1 ' var ' (x5)
    val snippet = "function f(x) { var y = x; return y; } (z = 1)"
    val got = Seq(snippet, "plain prose with no symbols at all")
      .toDF("text").select(TextFunctions.codeScore(col("text")).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    // braces: (1+1)x3 = 6; ';' x2 -> 6; '=' x2 -> 4; parens 2+2 -> 4; kw 3x5=15
    assert(got == Seq(6 + 6 + 4 + 4 + 15, 0))
  }

  test("jaroWinkler: textbook values, boost threshold, prefix cap, byte semantics") {
    import spark.implicits._
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // Winkler's own example
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334),     // jaro > 0.7 but prefix 0
      ("abcdefgh", "abcdxxxx", 0.6666666666666666), // jaro <= 0.7: NO boost
      ("aaaaaaaaaab", "aaaaaaaaaac", 0.9636363636363636), // prefix capped at 4
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("", "", 0.0), ("a", "", 0.0), ("", "a", 0.0), // empty -> 0 by convention
      ("abc", "abc", 1.0),
      ("日本語", "日本誤", 0.9555555555555556))   // BYTE-based (9-byte strings)
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == cases.map(_._3))
  }

  test("jaroWinkler: agrees with an independent char-DP reference on ASCII fuzz") {
    import spark.implicits._
    // independent reimplementation (chars == bytes on ASCII)
    def ref(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val w = math.max(math.max(l1, l2) / 2 - 1, 0)
      val m1 = Array.fill(l1)(false); val m2 = Array.fill(l2)(false)
      var m = 0
      for (i <- 0 until l1; j <- math.max(0, i - w) to math.min(l2 - 1, i + w)
           if !m1(i) && !m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1 }
      if (m == 0) return 0.0
      var t = 0; var j = 0
      for (i <- 0 until l1 if m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      t /= 2
      var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (sim > 0.7) {
        val p = s1.take(4).zip(s2.take(4)).takeWhile(c => c._1 == c._2).length
        sim += p * 0.1 * (1.0 - sim)
      }
      sim
    }
    val rnd = new scala.util.Random(11)
    val cases = (0 until 500).map { _ =>
      def str = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      (str, str)
    }
    val got = cases.toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == cases.map(c => ref(c._1, c._2)))
  }

}
