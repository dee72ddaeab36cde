package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("wordFrequencies: corpus-wide counts, empty tokens dropped") {
    val got = Tokenizer.wordFrequencies(docs("the cat the", "  ", "cat"))
      .orderBy("w").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("cat", 2L), ("the", 2L)))
  }

  test("bpePairCounts: weighted by word frequency, deterministic order") {
    // "aa" x3 and "ab" x1: pair "aa" weight 3, "ab" weight 1
    val got = Tokenizer.bpePairCounts(docs("aa aa ab", "aa"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("aa", 3L), ("ab", 1L)))
  }

  test("bpePairCounts: single-char words contribute nothing") {
    assert(Tokenizer.bpePairCounts(docs("a b c a")).collect().isEmpty)
  }

  test("charSymbols splits codepoints (unicode-safe)") {
    val got = docs("naïve 中文")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .select(Tokenizer.charSymbols(col("w")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got.map(_.mkString("|")).toSet == Set("n|a|ï|v|e", "中|文"))
  }

  test("applyMerge: greedy leftmost, non-overlapping on self-pairs") {
    import spark.implicits._
    val words = Seq("aaa", "aaaa", "baab", "ab", "a", "cc")
      .toDF("w")
      .select(col("w"), Tokenizer.charSymbols(col("w")).as("symbols"))
    val got = words
      .select(col("w"), Tokenizer.applyMerge(col("symbols"), "a", "a").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).mkString(" "))
      .toMap
    assert(got == Map(
      "aaa" -> "aa a", "aaaa" -> "aa aa", "baab" -> "b aa b",
      "ab" -> "a b", "a" -> "a", "cc" -> "c c"))
  }

  test("applyMerge composes across rounds (merged symbols re-mergeable)") {
    import spark.implicits._
    val syms = Seq(Seq("t", "h", "e")).toDF("symbols")
    val round1 = syms.select(Tokenizer.applyMerge(col("symbols"), "t", "h").as("symbols"))
    val round2 = round1.select(Tokenizer.applyMerge(col("symbols"), "th", "e").as("symbols"))
    assert(round2.collect().head.getSeq[String](0) == Seq("the"))
  }

  test("trainBpe: merges match the hand-computed greedy sequence") {
    // corpus: "low low low lower" -> vocab {low:3, lower:1}
    // round 1 pairs: lo:4, ow:4, we:1, er:1 -> argmax ties (lo, ow) -> 'l','o' (a asc)
    // round 2: [lo w]x3 [lo w e r] -> (lo,w):4, (w,e):1, (e,r):1 -> 'lo','w'
    // round 3: [low]x3 [low e r] -> (low,e):1, (e,r):1 -> tie resolves (e,r)? no:
    //   n equal (1,1); a asc: "e" < "low" -> ('e','r')
    val merges = Tokenizer.trainBpe(docs("low low low lower"), numMerges = 3)
    assert(merges == Seq(("l", "o", 4L), ("lo", "w", 4L), ("e", "r", 1L)))
  }

  test("trainBpe stops early when no pairs remain") {
    val merges = Tokenizer.trainBpe(docs("ab ab"), numMerges = 5)
    assert(merges == Seq(("a", "b", 2L)))
  }

  test("tokenCountsUnderMerges: per-word fold, ordered merges compose") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab xy"), (2L, "abab abab")).toDF("doc_id", "text")
    // merge 1 (a,b) -> ab; merge 2 (ab,ab) -> abab
    val out1 = graft.operators.Tokenizer.tokenCountsUnderMerges(docs,
      Seq(("a", "b"))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_subtokens"))).toMap
    // "abab" -> [ab, ab] (2), "ab" -> [ab] (1), "xy" -> [x, y] (2)
    assert(out1 == Map(1L -> ((3L, 5L)), 2L -> ((2L, 4L))))
    val out2 = graft.operators.Tokenizer.tokenCountsUnderMerges(docs,
      Seq(("a", "b"), ("ab", "ab"))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_subtokens"))).toMap
    // "abab" -> [abab] (1) after the second merge
    assert(out2 == Map(1L -> ((3L, 4L)), 2L -> ((2L, 2L))))
    // no merges: plain per-word char counts
    val out0 = graft.operators.Tokenizer.tokenCountsUnderMerges(docs, Seq.empty)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subtokens"))
      .toMap
    assert(out0 == Map(1L -> 8L, 2L -> 8L))
  }

  test("unigramSeed: occurrence-weighted substrings; singles always survive; minSeed prunes") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val seed = Tokenizer.unigramSeed(docs, maxPieceLen = 2, minSeedCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seed == Map("a" -> 3L, "b" -> 3L, "ab" -> 3L,
      "c" -> 3L, "d" -> 3L, "cd" -> 3L))
    // overlapping occurrences count: "aaa" has "aa" at 2 positions
    val rep = Seq((1L, "aaa")).toDF("doc_id", "text")
    val s2 = Tokenizer.unigramSeed(rep, maxPieceLen = 2, minSeedCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == Map("a" -> 3L, "aa" -> 2L))
    // a rare multi-char piece is pruned, its chars stay
    val rare = Seq((1L, "xy zz zz")).toDF("doc_id", "text")
    val s3 = Tokenizer.unigramSeed(rare, maxPieceLen = 2, minSeedCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!s3.contains("xy") && s3("x") == 1L && s3("zz") == 2L)
  }

  test("segmentViterbi: integer argmax, tie keeps the longest FINAL piece") {
    // equal-score tie: [a,aa] vs [aa,a] sum identically; the forward loop
    // keeps the smallest start index = longest last piece -> [a, aa]
    val score = Map("a" -> -510826L, "aa" -> -916291L)
    assert(Tokenizer.segmentViterbi("aaa", score, 2) == List("a", "aa"))
    // higher-probability long piece wins outright
    val score2 = Map("a" -> -2000000L, "ab" -> -1000000L, "b" -> -2000000L)
    assert(Tokenizer.segmentViterbi("abab", score2, 2) == List("ab", "ab"))
    // missing coverage fails fast
    intercept[IllegalArgumentException] {
      Tokenizer.segmentViterbi("aq", Map("a" -> -1L), 2)
    }
  }

  test("unigramTrain: EM prunes unused multi-char pieces, floors singles; encode readout") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val inv = Tokenizer.unigramTrain(docs, rounds = 2, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every word segments as its whole-word piece; chars floor at 1
    assert(inv == Map("a" -> 1L, "b" -> 1L, "ab" -> 3L,
      "c" -> 1L, "d" -> 1L, "cd" -> 3L))
    val enc = Tokenizer.tokenCountsUnderUnigram(docs,
        Tokenizer.unigramTrain(docs, rounds = 2, maxPieceLen = 2),
        maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 3 words per doc, each one piece
    assert(enc == Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L))))
  }

  test("unigramTrain: maxInventory fail-fast guards the driver collect") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    // this corpus seeds 6 pieces (a b c d ab cd); a cap of 3 must abort
    // with the sizing message, not OOM-collect
    val e = intercept[IllegalArgumentException] {
      Tokenizer.unigramTrain(docs, rounds = 1, maxPieceLen = 2,
        maxInventory = 3)
    }
    assert(e.getMessage.contains("maxInventory"))
    // a cap at exactly the inventory size passes and trains identically
    val inv = Tokenizer.unigramTrain(docs, rounds = 2, maxPieceLen = 2,
        maxInventory = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inv == Map("a" -> 1L, "b" -> 1L, "ab" -> 3L,
      "c" -> 1L, "d" -> 1L, "cd" -> 3L))
  }

  test("trainWordpieceMerges: likelihood argmax differs from BPE's count " +
      "argmax — rare-but-dependent beats frequent-but-independent") {
    // qu x2 (q, u occur nowhere else: ln2-ln2-ln2 = -0.69) vs th/ta/ha x5
    // each (t, h, a each occur 10x: ln5-ln10-ln10 = -3.0)
    val d = docs("qu qu th th th th th ta ta ta ta ta ha ha ha ha ha")
    val wp = Tokenizer.trainWordpieceMerges(d, numMerges = 1)
    assert(wp.head._1 == "q" && wp.head._2 == "u" && wp.head._3 == 2L)
    assert(wp.head._4 == math.round(
      (math.log(2) - math.log(2) - math.log(2)) * 1e6))
    // BPE on the same corpus takes a count-5 pair (ties to 'h a')
    val bpe = Tokenizer.trainBpe(d, numMerges = 1)
    assert(bpe.head._3 == 5L && (bpe.head._1, bpe.head._2) == (("h", "a")))
    // merges compose: after (q, u) the pair is gone, scores re-derive
    val wp2 = Tokenizer.trainWordpieceMerges(d, numMerges = 2)
    assert(wp2.map(m => (m._1, m._2)).head == (("q", "u")))
    assert(wp2(1)._1 != "q")
  }

  test("wordpieceVocab: role-split census, single-char floor per role") {
    // corpus: "abc" x2, "bc" x1. Word-start pieces: a, ab, abc, b, bc;
    // continuation: b, c, bc, c(from abc pos3). minCount=2 prunes
    // multi-char pieces seen once per role, chars always survive.
    val got = Tokenizer.wordpieceVocab(docs("abc abc bc"),
        maxPieceLen = 3, minCount = 2)
      .collect().map(r => ((r.getString(0), r.getBoolean(1)), r.getLong(2))).toMap
    assert(got(("a", false)) == 2L)     // word-start char
    assert(got(("b", true)) == 2L)      // continuation char (inside abc x2)
    assert(got(("c", true)) == 3L)      // inside abc x2 + inside bc x1
    assert(got(("abc", false)) == 2L)   // multi-char meets minCount
    assert(got(("bc", true)) == 2L)     // continuation bigram inside abc x2
    assert(!got.contains(("bc", false)))  // word-start "bc" seen once: pruned
    assert(got(("b", false)) == 1L)     // word-start char floor (bc x1)
  }

  test("segmentWordpiece: greedy longest-match-first with ## continuations") {
    val start = Set("un", "u", "n", "r", "e", "l", "a", "t", "d", "unrelat")
    val cont = Set("related", "relat", "ed", "e", "d", "r", "l", "a", "t", "n")
    // longest start piece "unrelat" wins over "un"; then "ed" continues
    assert(Tokenizer.segmentWordpiece("unrelated", start, cont, 8)
      == List("unrelat", "##ed"))
    // bounded by maxPieceLen: cap 2 forces "un" then greedy continuations
    assert(Tokenizer.segmentWordpiece("unrelated", start, cont, 2)
      == List("un", "##r", "##e", "##l", "##a", "##t", "##ed"))
    // missing coverage fails fast, not silently
    val e = intercept[IllegalArgumentException] {
      Tokenizer.segmentWordpiece("xy", Set("x"), Set.empty, 2)
    }
    assert(e.getMessage.contains("cannot segment"))
  }

  test("tokenCountsUnderWordpiece: census vocab covers its own corpus; " +
      "greedy counts via one word-keyed join") {
    val d = docs("abab ab", "abab cd cd")
    val vocab = Tokenizer.wordpieceVocab(d, maxPieceLen = 2, minCount = 2)
    val got = Tokenizer.tokenCountsUnderWordpiece(d, vocab, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vocab: start {a,ab,c,cd}, cont {b,ab,d,a(from abab)...}; greedy:
    // "abab" -> ab + ##ab (2), "ab" -> ab (1), "cd" -> cd (1)
    assert(got == Map(0L -> ((2L, 3L)), 1L -> ((3L, 4L))))
  }

  test("tokenCountsUnderWordpiece: maxInventory fail-fast") {
    val d = docs("ab ab cd cd")
    val vocab = Tokenizer.wordpieceVocab(d, maxPieceLen = 2, minCount = 1)
    val e = intercept[IllegalArgumentException] {
      Tokenizer.tokenCountsUnderWordpiece(d, vocab, maxPieceLen = 2,
        maxInventory = 2)
    }
    assert(e.getMessage.contains("maxInventory"))
  }
}
