package graft

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Text analysis: language ID heuristic, quality scoring, token
  * counting, fingerprinting.
  */
class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t, l) => (i, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("BM25: rarer terms and higher tf outrank; term-free docs absent") {
    // N=4, df(cat)=3, df(dog)=2, all dl=4 → norm=1. Hand BM25:
    // doc3 (dog×3, cat×1) ≈ 1.4459 > doc0 (cat×2, dog×1) ≈ 1.1836
    // > doc1 (cat×1) ≈ 0.3567; doc2 matches nothing.
    val d = docs(
      (0L, "cat cat dog x", "en"),
      (1L, "cat x y z", "en"),
      (2L, "x y z w", "en"),
      (3L, "dog dog dog cat", "en"))
    val rows = TextOps.bm25TopK(d, Seq("cat", "dog"), 10).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 0L, 1L))
    assert(rows.map(_.getAs[Long]("n_terms")).toSeq == Seq(2L, 2L, 1L))
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == Seq(1, 2, 3))
    assert(math.abs(rows.head.getAs[Double]("score") - 1.445906) < 1e-4)
  }

  test("langConfusion: diagonal mass for marker-bearing docs, row fractions") {
    val d = docs(
      (0L, "the cat and the dog", "en"), // 'the'/'and' markers → en
      (1L, "el gato y el perro", "es"), // 'el'/'y' markers → es
      (2L, "zz yy xx ww", "en")) // no markers → unknown
    val r = TextOps.langConfusion(d).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("predicted")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("row_frac"))).toMap
    assert(r(("en", "en")) == ((1L, 0.5)))
    assert(r(("en", "unknown")) == ((1L, 0.5)))
    assert(r(("es", "es")) == ((1L, 1.0)))
  }

  test("luhnCards: checksum separates real cards from lookalike digit runs") {
    val d = docs(
      (0L, "pay 4532015112830366 now", "en"), // valid Luhn
      (1L, "ref 4532015112830367 x", "en"), // bad check digit
      (2L, "no digits here", "en"),
      (3L, "id 12345 short run", "en")) // under 13 digits: not a candidate
    val r = TextOps.luhnCards(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_candidates"), x.getAs[Long]("n_luhn_valid"),
          x.getAs[Boolean]("has_card_pii"))).toMap
    assert(r(0L) == ((1L, 1L, true)))
    assert(r(1L) == ((1L, 0L, false)))
    assert(r(2L) == ((0L, 0L, false)))
    assert(r(3L) == ((0L, 0L, false)))
  }

  test("luhnCards: word boundaries reject runs outside 13-19 digits") {
    // a 25-digit run has no internal \b, so it must NOT partially match
    val d = docs(
      (0L, "ref 1234567890123456789012345 x", "en"),
      (1L, "pay 4532015112830366 ok", "en"))
    val r = TextOps.luhnCards(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_candidates")).toMap
    assert(r(0L) == 0L)
    assert(r(1L) == 1L)
  }

  test("zipfFit: degenerate single-point corpus yields null slope, not a crash") {
    val d = docs((0L, "solo solo solo", "en"))
    val r = TextOps.zipfFit(d, 100).collect()(0)
    assert(r.getAs[Long]("n") == 1L)
    assert(r.isNullAt(r.fieldIndex("slope"))) // 0/0 OLS denominator
  }

  test("zipfFit recovers slope -1 on an exact 12/r corpus") {
    // freq = 12/rank exactly: ln f = ln 12 - ln r -> slope -1.
    val text = Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++
      Seq.fill(4)("w3") ++ Seq.fill(3)("w4")
    val d = docs((0L, text.mkString(" "), "en"))
    val r = TextOps.zipfFit(d, 100).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("total_tokens") == 25L)
    assert(r.getAs[Long]("vocab_size") == 4L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) <= 0.001)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12)) <= 0.001)
  }

  test("phraseSearch: adjacency hits equal shingle counts, scattered words do not match") {
    val d = docs(
      (0L, "a b c a b c", "en"), // 'a b c' twice (positions 0 and 3)
      (1L, "a b c x y z", "en"),
      (2L, "x y z x y z", "en"),
      (3L, "a q b q c q", "en")) // phrase words scattered: no adjacency
    val rows = TextOps.phraseSearch(d, 2).collect()
    val byPhrase = rows.map(r => r.getAs[String]("phrase") -> r).toMap
    assert(byPhrase.keySet == Set("a b c", "x y z"))
    val abc = byPhrase("a b c")
    assert(abc.getAs[Long]("n_hits") == 3L)
    assert(abc.getAs[Long]("n_docs_pos") == 2L)
    assert(abc.getAs[Long]("first_doc") == 0L)
    val xyz = byPhrase("x y z")
    assert(xyz.getAs[Long]("n_hits") == 3L)
    assert(xyz.getAs[Long]("first_doc") == 1L)
    assert(rows.forall(_.getAs[Boolean]("agree")))
  }

  test("hashedDocVectors/Neighbors: identical docs are cos=1 twins, counts exact") {
    val d = docs(
      (0L, "alpha beta alpha", "en"),
      (1L, "alpha beta alpha", "en"), // identical to 0
      (2L, "gamma delta", "en"),
      (3L, "alpha gamma", "en"))
    val v = TextOps.hashedDocVectors(d).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(v(0L) == v(1L), "identical text must hash to the identical vector")
    // sum over a Seq — a Set would collapse equal per-bucket counts
    assert(v(0L).toSeq.map(_._2).sum == 3 && v(2L).toSeq.map(_._2).sum == 2,
      "bucket counts must sum to the token count")
    val nb = TextOps.hashedNeighbors(d, nQueries = 1, k = 3).collect()
    assert(nb.head.getLong(2) == 1L && nb.head.getDouble(3) == 1.0,
      s"doc 1 must be doc 0's cos=1 twin: ${nb.toSeq}")
  }

  test("hashedDenseVectors: fixed width, zero-filled, and exactly the sparse counts") {
    val d = docs(
      (0L, "alpha beta alpha", "en"),
      (1L, "gamma delta", "en"))
    val dim = 16
    val sparse = TextOps.hashedDocVectors(d, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = TextOps.hashedDenseVectors(d, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(dense.keySet == Set(0L, 1L))
    for ((id, v) <- dense) {
      assert(v.length == dim, s"doc $id width ${v.length}")
      for (b <- 0 until dim)
        assert(v(b) == sparse.getOrElse((id, b.toLong), 0L).toFloat,
          s"doc $id bucket $b: dense ${v(b)} vs sparse ${sparse.get((id, b.toLong))}")
    }
    assert(dense(0L).sum == 3f && dense(1L).sum == 2f,
      "dense components must sum to the token count")
  }

  test("rakeKeyphrases: hand-checked deg/freq scores on stopword-delimited runs") {
    // runs: [red apple pie], [green apple]; deg/freq by hand:
    // red 3/1, apple (3+2)/2 = 2.5, pie 3/1, green 2/1
    // → "red apple pie" = 8.5, "green apple" = 4.5
    val d = docs((0L, "the red apple pie of green apple", "en"))
    val r = TextOps.rakeKeyphrases(d, k = 10, minWords = 2).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("red apple pie", "green apple"),
      s"phrases: ${r.toSeq}")
    assert(r(0).getDouble(3) == 8.5 && r(1).getDouble(3) == 4.5, s"scores: ${r.toSeq}")
    assert(r(0).getLong(1) == 3 && r(1).getLong(1) == 2)
    assert(r(0).getLong(2) == 1 && r(1).getLong(2) == 1)
  }

  test("heapsFit: all-new-words corpus fits beta=1 exactly; shared-word corpus sublinear") {
    // every doc mints only new words → V(T) = T at every prefix → the
    // log-log points sit on y = x: beta 1, log_k 0, bit-exact
    val d1 = docs((0L until 10L).map(i => (i, s"u${i}a u${i}b u${i}c", "en")): _*)
    val r1 = TextOps.heapsFit(d1).head()
    assert(r1.getAs[Long]("n") == 10 && r1.getAs[Long]("total_tokens") == 30 &&
      r1.getAs[Long]("vocab_size") == 30, s"grid/total: $r1")
    assert(r1.getAs[Double]("beta") == 1.0 && r1.getAs[Double]("log_k") == 0.0,
      s"linear-growth fit: $r1")
    // half the tokens are one shared word → vocabulary grows sublinearly
    val d2 = docs((0L until 10L).map(i => (i, s"common w$i", "en")): _*)
    val b2 = TextOps.heapsFit(d2).head().getAs[Double]("beta")
    assert(b2 > 0 && b2 < 1, s"shared-word corpus must be sublinear: $b2")
  }

  test("pmiCollocations: the repeated pair wins, singletons filtered, exact PMI") {
    // one doc, "new york" × 5 with distinct fillers: T=14 tokens,
    // B=13 bigrams, every other bigram is a singleton (< minCount)
    val d = docs(
      (0L, "new york a1 new york a2 new york a3 new york a4 new york", "en"))
    val r = TextOps.pmiCollocations(d, minCount = 5, k = 20).collect()
    assert(r.length == 1, s"only the repeated pair survives: ${r.toSeq}")
    val row = r.head
    assert(row.getString(0) == "new york" && row.getLong(1) == 5 &&
      row.getLong(2) == 5 && row.getLong(3) == 5)
    // PMI = ln(n_pair·T·T / (B·n_a·n_b)), one exact-integer division
    val expected = BigDecimal(math.log((5.0 * 14 * 14) / (13.0 * 5 * 5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(4) == expected, s"pmi ${row.getDouble(4)} != $expected")
  }

  test("calibrateQualityThreshold: histogram threshold fits the budget, ties all-or-nothing") {
    // stopword-free texts → quality_score = n_words/100 exactly
    val d = docs(
      (0L, "w1 w2 w3", "en"), // .03
      (1L, "x1 x2 x3", "en"), // .03 (tie at the top)
      (2L, "y1 y2", "en"), // .02
      (3L, "z1", "en"), // .01
      (4L, "a1 a2", "de"), // .02 × 3: the whole tie group overflows
      (5L, "b1 b2", "de"),
      (6L, "c1 c2", "de"),
      (7L, "q1 q2 q3 q4 q5", "fr"), // .05
      (8L, "r1", "fr")) // .01
    val r = TextOps.calibrateQualityThreshold(d, p = 0.5).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    // en: kcut=2, the .03 tie group (cum=2) fits exactly
    assert(r("en").getAs[Long]("kcut") == 2 &&
      r("en").getAs[Double]("thr") == 0.03 &&
      r("en").getAs[Long]("n_keep") == 2 &&
      r("en").getAs[Double]("keep_rate") == 0.5)
    // de: kcut=1 but the only score's tie group holds 3 docs — a
    // threshold admits scores, not ranks, so nothing fits the budget
    assert(r("de").getAs[Long]("kcut") == 1 &&
      r("de").isNullAt(r("de").fieldIndex("thr")) &&
      r("de").getAs[Long]("n_keep") == 0 &&
      r("de").getAs[Double]("keep_rate") == 0.0)
    // fr: kcut=1, the single .05 doc fits
    assert(r("fr").getAs[Double]("thr") == 0.05 &&
      r("fr").getAs[Long]("n_keep") == 1 &&
      r("fr").getAs[Double]("keep_rate") == 0.5)
  }

  test("vocabPrune keeps words inside the df band, tf does not leak in") {
    val d = docs(
      (0L, "common mid rare rare rare", "en"), // tf(rare)=3 but df=1
      (1L, "common mid", "en"),
      (2L, "common", "en"),
      (3L, "common", "en"))
    val rows = TextOps.vocabPrune(d, minDf = 2, maxDfFrac = 0.5).collect()
    // common df=4 > 2 = floor(0.5*4); rare df=1 < 2; mid df=2 stays
    assert(rows.map(r => (r.getAs[Int]("rnk"), r.getAs[String]("word"),
      r.getAs[Long]("df"))).toSeq == Seq((1, "mid", 2L)))
  }

  test("repetitionStats: spammy repetition flags, varied text does not") {
    val varied = (1 to 60).map(i => s"w$i").mkString(" ")
    val spam = "buy now click here " * 15
    val d = docs(
      (0L, varied, "en"),
      (1L, (varied + " " + spam).trim, "en"),
      (2L, "only two", "en"), // too short for trigrams
      (3L, "one", "en")) // too short for bigrams too
    val r = TextOps.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r(0L).getBoolean(6))
    assert(r(0L).getDouble(2) == 1.0) // all words distinct
    assert(r(1L).getBoolean(6), r(1L).toString) // repeated phrase flags
    assert(r(1L).getDouble(4) > 0.1) // top bigram dominates
    // 2 words → a single bigram with share 1.0: flags (length gating is
    // the separate qualityScore filter); trigram level is null
    assert(r(2L).isNullAt(5) && r(2L).getDouble(4) == 1.0 && r(2L).getBoolean(6))
    assert(r(3L).isNullAt(4) && r(3L).isNullAt(5) && !r(3L).getBoolean(6))
  }

  test("redactPii: emails and phones counted and scrubbed; clean text untouched") {
    val d = docs(
      (0L, "plain words without contact info", "en"),
      (1L, "write to jane.doe+x@mail.example.org or call 555-0199 today", "en"),
      (2L, "two mails a@b.co and c.d@e.f.org but 1234-5678 is no phone", "en"))
    val r = TextOps.redactPii(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(1) == 0 && r(0L).getLong(2) == 0)
    // untouched text hashes to its own md5
    val plainMd5 = d.filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).head.getString(0)
    assert(r(0L).getString(3) == plainMd5)
    assert(r(1L).getLong(1) == 1 && r(1L).getLong(2) == 1)
    assert(r(2L).getLong(1) == 2 && r(2L).getLong(2) == 0)
    // redaction really rewrites the content
    assert(r(1L).getString(3) != null && r(1L).getString(3) != plainMd5)
  }

  test("lmScore: common phrases outscore rare ones; bigram counts; short docs null") {
    val d = docs(
      (0L, "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta gamma", "en"),
      (1L, "unique1 unique2 unique3 unique4", "en"),
      (2L, "one", "en"))
    val r = TextOps.lmScore(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(1) == 11) // 12 words → 11 bigram tokens
    assert(r(1L).getLong(1) == 3)
    assert(r(2L).getLong(1) == 0 && r(2L).isNullAt(2))
    // the corpus LM finds the repeated phrase far more probable
    assert(r(0L).getDouble(2) > r(1L).getDouble(2))
  }

  test("lmScoreCached: same corpus key returns the cached frame, values match") {
    val d = docs(
      (0L, "alpha beta gamma alpha beta gamma", "en"),
      (1L, "delta epsilon zeta", "en"))
    val a = TextOps.lmScoreCached(d, "lm-spec-corpus")
    val b = TextOps.lmScoreCached(d, "lm-spec-corpus")
    assert(a eq b, "second call must be a cache hit (same frame reference)")
    val plain = TextOps.lmScore(d).collect().map(_.toString).sorted
    assert(a.collect().map(_.toString).sorted.sameElements(plain))
  }

  test("chunkWords: chunk count, stride starts, overlap, short tails") {
    val d = docs(
      (0L, (1 to 150).map(i => s"w$i").mkString(" "), "en"), // 3 chunks
      (1L, (1 to 64).map(i => s"a$i").mkString(" "), "en"), // exactly width
      (2L, "tiny doc", "en"), // shorter than width
      (3L, (1 to 65).map(i => s"b$i").mkString(" "), "en")) // width + 1
    val r = TextOps.chunkWords(d, 64, 48).collect()
    val byDoc = r.groupBy(_.getLong(0))
    // ceil((150-64)/48) + 1 = 3 chunks; starts 1, 49, 97
    assert(byDoc(0L).length == 3)
    val c1 = byDoc(0L).find(_.getInt(1) == 1).get
    assert(c1.getString(2).startsWith("w49 ") && c1.getInt(3) == 64)
    val c2 = byDoc(0L).find(_.getInt(1) == 2).get
    assert(c2.getString(2).startsWith("w97 ") &&
      c2.getString(2).endsWith(" w150") && c2.getInt(3) == 54)
    // every word covered exactly (overlap regions shared, none lost)
    assert(byDoc(0L).flatMap(_.getString(2).split(" ")).distinct.length == 150)
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getInt(3) == 64)
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getString(2) == "tiny doc" &&
      byDoc(2L).head.getInt(3) == 2)
    // 65 words: second chunk is the 17-word tail starting at b49
    assert(byDoc(3L).length == 2)
    val t = byDoc(3L).find(_.getInt(1) == 1).get
    assert(t.getString(2).startsWith("b49 ") && t.getInt(3) == 17)
  }

  test("langId: marker argmax with unknown fallback") {
    val d = docs(
      (0L, "der hund und die katze ist hier", "de"),
      (1L, "the cat of the house is here", "en"),
      (2L, "qqq www eee rrr", "fr"))
    val r = TextOps.langId(d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(4)))
    assert(r.toSeq == Seq((0L, "de", true), (1L, "en", true), (2L, "unknown", false)))
  }

  test("qualityScore: exact ratio arithmetic") {
    val d = docs((0L, "the quick fox", "en")) // 3 words, 13 chars, 1 stopword
    val row = TextOps.qualityScore(d).collect().head
    assert(row.getAs[Long]("n_words") == 3)
    assert(row.getAs[Long]("len_chars") == 13)
    assert(row.getAs[Double]("avg_word_len") == math.rint((13 - 2) / 3.0 * 1e4) / 1e4)
    assert(row.getAs[Long]("stop_hits") == 1)
    assert(row.getAs[Double]("stopword_ratio") == 0.3333)
    // score = min(3/100, 1) * (1 - 0.3333) = 0.03 * 0.6667 = 0.02
    assert(row.getAs[Double]("quality_score") == 0.02)
  }

  test("tokenCounts: whitespace vs regex tokenization") {
    val d = docs((0L, "ab 12 x!y", "en"))
    val row = TextOps.tokenCounts(d).collect().head
    assert(row.getAs[Long]("ws_tokens") == 3)
    // [ab] [12] [x] [!] [y]
    assert(row.getAs[Long]("re_tokens") == 5)
  }

  test("fingerprints: case-insensitive content hash, winnow over 5-grams") {
    val d = docs(
      (0L, "A B C D E F", "en"),
      (1L, "a b c d e f", "en"),
      (2L, "a b", "en")) // too short for 5-grams → null winnow
    val r = TextOps.fingerprints(d).collect()
    assert(r(0).getString(1) == r(1).getString(1), "normalized md5 equal")
    assert(r(0).getString(2) == r(1).getString(2), "winnow equal")
    assert(r(2).isNullAt(2), "short doc has null winnow_min")
  }

  test("tfidfTopTerms: rare terms outrank common ones, k caps per doc") {
    val d = docs(
      (0L, "apple banana apple", "en"),
      (1L, "banana cherry", "en"),
      (2L, "cherry cherry cherry", "en"))
    val r = TextOps.tfidfTopTerms(d, 3).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("rnk"),
        x.getAs[String]("word"), x.getAs[Double]("tfidf")))
    // doc 0: apple (df=1, tf 2/3) must beat banana (df=2, tf 1/3):
    // 0.666667·ln(3) vs 0.333333·ln(1.5)
    val doc0 = r.filter(_._1 == 0L)
    assert(doc0.head._3 == "apple" && doc0.head._2 == 1)
    assert(doc0.head._4 == math.rint(
      math.rint(2.0 / 3 * 1e6) / 1e6 * math.rint(math.log(3.0) * 1e6) / 1e6 * 1e6) / 1e6)
    // doc 2 has one distinct term → one row despite k=3
    assert(r.count(_._1 == 2L) == 1)
    assert(r.filter(_._1 == 2L).head._3 == "cherry")
  }
}
