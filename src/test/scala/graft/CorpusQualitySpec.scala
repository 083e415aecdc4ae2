package graft

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Goldens for the corpus-quality battery: unigram entropy,
  * Gopher-style rules, length histogram, template-prefix grouping.
  */
class CorpusQualitySpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t, l) => (i, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("wordEntropy: uniform text maximizes, constant text zeroes") {
    val d = docs(
      (0L, "a b c d", "en"), // 4 distinct → ln 4
      (1L, "x x x x", "en"), // constant → 0
      (2L, "a a b b", "en")) // two at p=.5 → ln 2
    val r = TextOps.wordEntropy(d).collect().map(x => x.getLong(0) -> x).toMap
    // terms are rounded to 6dp before summing: ln4 = 1.386294361...,
    // each term round(-0.25*ln(0.25),6) = -0.346574 → H = 1.386296
    assert(r(0L).getAs[Double]("entropy") == 1.386296)
    assert(r(0L).getAs[Long]("n_words") == 4L && r(0L).getAs[Long]("n_distinct") == 4L)
    assert(r(1L).getAs[Double]("entropy") == 0.0)
    // round(0.5*ln(0.5),6) = -0.346574 → H = 0.693148
    assert(r(2L).getAs[Double]("entropy") == 0.693148)
  }

  test("gopherQuality: each rule can individually fail a doc") {
    val good = (1 to 30).map(i => "the word and some more text here with data now"
      .split(" ")(i % 10)).mkString(" ")
    val d = docs(
      (0L, good, "en"),
      (1L, "too short", "en"), // n_words < 20
      (2L, (1 to 25).map(_ => "zz") .mkString(" "), "en"), // mean len 2 < 3, no stopwords
      (3L, (1 to 25).map(_ => "99999").mkString(" "), "en")) // alpha_frac 0
    val r = TextOps.gopherQuality(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Boolean]("gopher_pass"), r(0L).toString)
    assert(!r(1L).getAs[Boolean]("gopher_pass"))
    assert(!r(2L).getAs[Boolean]("gopher_pass"))
    assert(r(2L).getAs[Double]("mean_word_len") == 2.0)
    assert(!r(3L).getAs[Boolean]("gopher_pass"))
    assert(r(3L).getAs[Double]("alpha_frac") == 0.0)
  }

  test("lengthHistogram buckets on exact floor(log2(tokens))") {
    val d = docs(
      (0L, "a", "en"), // 1 token → bucket 0
      (1L, "a b", "en"), // 2 → bucket 1
      (2L, "a b c", "en"), // 3 → bucket 1
      (3L, (1 to 8).map(_.toString).mkString(" "), "en"), // 8 → bucket 3
      (4L, "uno dos", "es")) // 2 → bucket 1
    val r = TextOps.lengthHistogram(d).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r == Map(("en", 0) -> 1L, ("en", 1) -> 2L, ("en", 3) -> 1L, ("es", 1) -> 1L))
  }

  test("templatePrefixGroups groups shared 3-word openers only") {
    val d = docs(
      (0L, "dear valued customer your account needs review", "en"),
      (1L, "dear valued customer please update your details", "en"),
      (2L, "hello world this is unique text", "en"),
      (3L, "dear valued customer we noticed a login", "en"))
    val r = TextOps.templatePrefixGroups(d, 3).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("prefix") == "dear valued customer")
    assert(r(0).getAs[Long]("n_docs") == 3L)
    assert(r(0).getAs[Long]("min_doc_id") == 0L && r(0).getAs[Long]("max_doc_id") == 3L)
  }
}
