package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("native expressions are callable from spark.sql via GraftExtensions") {
    spark.sparkContext // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate() // reuses the existing SparkContext, new session state
      val r = s.sql(
        """SELECT
          |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
          |  word_shingles(' a b c d ', 3) AS sh,
          |  simhash64(array('x', 'y')) AS sim,
          |  simhash64(array('x', 'y'), true) AS sim_p,
          |  rolling_hash('abc') AS rh,
          |  size(minhash_signature(word_shingles('a b c d e', 2), 16)) AS sig_len,
          |  size(minhash_bands(word_shingles('a b c d e', 2), 8, 4)) AS n_bands,
          |  graft_filter('The ERROR line', 'error') AS hit,
          |  hilbert_key(0, 0, 3) AS h0,
          |  hilbert_key(7, 0, 3) AS h63
          |""".stripMargin).first()
      // hilbert walk of an 8x8 grid starts at (0,0) and ends at (7,0)
      assert(r.getLong(8) == 0L && r.getLong(9) == 63L)
      assert(r.getDouble(0) == 1.0)
      assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
      assert((r.getLong(3) >>> 60) == 0L) // portable simhash is 60-bit
      assert(r.getLong(4) != 0L)
      assert(r.getInt(5) == 16)
      assert(r.getInt(6) == 8)
      assert(r.getBoolean(7))
      val r2 = s.sql(
        """SELECT
          |  redact_pii('mail a@b.co from 10.0.0.1') AS red,
          |  dup_token_fraction('a a b') AS dup,
          |  top_bigram_fraction('x y x y x y') AS top,
          |  lang_id('the cat is in the hat') AS lang
          |""".stripMargin).first()
      assert(r2.getString(0) == "mail <EMAIL> from <IP>")
      assert(r2.getDouble(1) == 1.0 - 2.0 / 3.0)
      assert(r2.getDouble(2) == 0.6)
      assert(r2.getString(3) == "en")
      val r3 = s.sql(
        """SELECT
          |  gopher_signals('the cat sat # ...').n_tokens AS nt,
          |  gopher_signals('the cat sat # ...').n_symbols AS ns,
          |  gopher_keep('a b') AS keep_short,
          |  gopher_keep('the quick brown foxes jumped over the lazy dogs today', 5) AS keep5,
          |  c4_clean('good sentence with punctuation.' || chr(10) || 'no punct') AS c4,
          |  c4_clean('one two.' || chr(10) || 'one two three.', 2).n_kept_lines AS k2
          |""".stripMargin).first()
      assert(r3.getLong(0) == 5L)
      assert(r3.getLong(1) == 2L)
      assert(!r3.getBoolean(2)) // 2 words < default 50
      assert(r3.getBoolean(3))
      assert(r3.getStruct(4).getAs[String]("clean_text") == "good sentence with punctuation.")
      assert(r3.getLong(5) == 2L)
      val r4 = s.sql(
        """SELECT
          |  nearest_centroid(array(CAST(0.9 AS DOUBLE), 0.1D),
          |    array(named_struct('cid', 7L, 'cv', array(1.0D, 0.0D)),
          |          named_struct('cid', 9L, 'cv', array(0.0D, 1.0D)))) AS cid,
          |  quantize_int8(array(CAST(2.0 AS FLOAT), CAST(-1.0 AS FLOAT))).scale AS sc,
          |  quantize_int8(array(CAST(2.0 AS FLOAT), CAST(-1.0 AS FLOAT))).q AS q
          |""".stripMargin).first()
      assert(r4.getLong(0) == 7L)
      assert(r4.getDouble(1) == 2.0)
      assert(r4.getSeq[Int](2) == Seq(127, -63))
      // zorder_key(5=0b101, 3=0b011, 4 bits) -> 1+2+8+16 = 27
      assert(s.sql("SELECT zorder_key(5, 3, 4) AS z").first().getLong(0) == 27L)
      // unicode_normalize: decomposed e+U+0301 composes under NFC (2 chars
      // -> 1); NFKC additionally folds the fi ligature
      val un = s.sql("SELECT length(unicode_normalize('é')) AS a, " +
        "unicode_normalize('ﬁsh', 'NFKC') AS b").first()
      assert(un.getInt(0) == 1)
      assert(un.getString(1) == "fish")
      val e4 = intercept[Exception](
        s.sql("SELECT unicode_normalize('x', 'BOGUS')").collect())
      assert(e4.getMessage.contains("BOGUS"), e4.getMessage)
      // bloom: build over 0..99 in a scalar subquery, probe members (all
      // true — no false negatives) and enough non-members that a 1% bitmap
      // can't plausibly pass them all
      s.range(100).createOrReplaceTempView("bloom_keys")
      val bl = s.sql(
        """SELECT
          |  (SELECT count(*) FROM bloom_keys WHERE bloom_might_contain(
          |     (SELECT bloom_filter_agg(xxhash64(id), 100L, 960L) FROM bloom_keys),
          |     xxhash64(id))) AS members_in,
          |  (SELECT count(*) FROM range(1000, 3000) WHERE bloom_might_contain(
          |     (SELECT bloom_filter_agg(xxhash64(id), 100L, 960L) FROM bloom_keys),
          |     xxhash64(id))) AS strangers_in
          |""".stripMargin).first()
      assert(bl.getLong(0) == 100L) // every member passes
      assert(bl.getLong(1) < 200L, s"fp count ${bl.getLong(1)}") // ~1% fpp
      // arity errors are explicit, not raw IndexOutOfBounds / silent drops
      val e = intercept[Exception](s.sql("SELECT redact_pii()").collect())
      assert(e.getMessage.contains("exactly 1 argument"), e.getMessage)
      val e2 = intercept[Exception](s.sql("SELECT lang_id('a', 'b')").collect())
      assert(e2.getMessage.contains("exactly 1 argument"), e2.getMessage)
      val e3 = intercept[Exception](s.sql("SELECT gopher_keep()").collect())
      assert(e3.getMessage.contains("1 or 2 arguments"), e3.getMessage)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("char_profile and array_pairs are SQL-callable") {
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val p = s.sql("SELECT char_profile('aabbc') AS p").select("p.*").collect()(0)
      assert(p.getAs[Long]("n_cp") == 5 && p.getAs[Long]("n_distinct") == 3 &&
        p.getAs[Long]("sum_sq") == 9)
      val pairs = s.sql(
        "SELECT array_pairs(array('a','b','c')) AS ps").collect()(0)
        .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1)))
      assert(pairs == Seq(("a", "b"), ("a", "c"), ("b", "c")))
      intercept[Exception] { s.sql("SELECT char_profile()").collect() }
      val ic = s.sql("SELECT sorted_intersect_count(array(1L, 3L, 5L), " +
        "array(3L, 5L, 9L)) AS c").collect()(0).getLong(0)
      assert(ic == 2L)
      intercept[Exception] {
        s.sql("SELECT sorted_intersect_count(array(1L))").collect()
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("hashed_bow_margin is SQL-callable and equals the Column API") {
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s.implicits._
      val weights = (0 until 8).map(b => ((b * 37) % 21 - 10) / 1e6)
      val wSql = weights.mkString("array(", ", ", ")")
      val got = s.sql(
        s"SELECT hashed_bow_margin('the quick brown fox', $wSql, 0.25e0) AS m")
        .collect()(0).getDouble(0)
      val want = Seq("the quick brown fox").toDF("t")
        .select(graft.functions.TextFunctions
          .hashedBowMargin(org.apache.spark.sql.functions.col("t"), weights, 0.25))
        .collect()(0).getDouble(0)
      assert(got == want)
      intercept[Exception] { s.sql("SELECT hashed_bow_margin('x')").collect() }
      // strip_markup rides the same registry: SQL == Column API
      val html = "<p>keep</p><!-- drop --> 5 &lt; 6"
      val gotSm = s.sql(s"SELECT strip_markup('$html') AS c")
        .collect()(0).getString(0)
      val wantSm = Seq(html).toDF("t")
        .select(graft.functions.TextFunctions
          .stripMarkup(org.apache.spark.sql.functions.col("t")))
        .collect()(0).getString(0)
      assert(gotSm == wantSm && gotSm == "keep 5 < 6")
      intercept[Exception] { s.sql("SELECT strip_markup('x', 'y')").collect() }
      // r14 registrations: luhn_checksum / luhn_valid / code_score
      val luhn = s.sql(
        "SELECT luhn_checksum('79927398713') AS c, luhn_valid('79927398713') AS v, " +
          "luhn_valid('79927398710') AS w, luhn_checksum('12x') AS n").collect()(0)
      assert(luhn.getInt(0) % 10 == 0 && luhn.getBoolean(1) && !luhn.getBoolean(2))
      assert(luhn.isNullAt(3))
      val cs = s.sql("SELECT code_score('function f(x) { var y = x; return y; } (z = 1)') AS c")
        .collect()(0).getInt(0)
      assert(cs == 35)
      intercept[Exception] { s.sql("SELECT luhn_valid()").collect() }
      // r15 registrations: iban_mod97 / iban_valid
      val iban = s.sql(
        "SELECT iban_mod97('GB82WEST12345698765432') AS m, " +
          "iban_valid('GB82WEST12345698765432') AS v, " +
          "iban_valid('GB82WEST12345698765431') AS w, " +
          "iban_mod97('gb82') AS n").collect()(0)
      assert(iban.getInt(0) == 1 && iban.getBoolean(1) && !iban.getBoolean(2))
      assert(iban.isNullAt(3))
      intercept[Exception] { s.sql("SELECT iban_valid()").collect() }
      // r16 registration: jaro_winkler
      val jw = s.sql(
        "SELECT jaro_winkler('martha', 'marhta') AS a, " +
          "jaro_winkler('a', CAST(NULL AS STRING)) AS b").collect()(0)
      assert(jw.getDouble(0) == 0.9611111111111111)
      assert(jw.isNullAt(1))
      intercept[Exception] { s.sql("SELECT jaro_winkler('x')").collect() }
      // r16 registration: kmv_sketch (SQL aggregate)
      val kmv = s.sql(
        "SELECT size(kmv_sketch(v, 8)) AS n FROM VALUES ('a'),('b'),('a'),('c') t(v)")
        .collect()(0)
      assert(kmv.getInt(0) == 3) // 3 distinct, under k -> exact
      intercept[Exception] { s.sql("SELECT kmv_sketch('x')").collect() }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
