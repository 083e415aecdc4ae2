package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Classify

/** Learned multinomial-NB language classifier: hand-checked posterior
  * math on a separable fixture, smoothing of unseen words, margin
  * semantics, confusion rollup.
  */
class ClassifySpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t, l) => (i, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // Two cleanly separable vocabularies.
  private def separable = docs(
    (0L, "aa aa bb", "en"),
    (1L, "aa bb bb", "en"),
    (2L, "cc cc dd", "de"),
    (3L, "cc dd dd", "de"))

  test("nbLangScores recovers separable classes with exact hand math") {
    val rows = Classify.nbLangScores(separable).collect()
    assert(rows.map(_.getAs[String]("nb_pred")).toSeq == Seq("en", "en", "de", "de"))
    assert(rows.forall(_.getAs[Boolean]("is_match")))
    assert(rows.forall(_.getAs[Long]("n_tokens") == 3L))
    // Hand math, doc 0 = [aa, aa, bb], V=4, t_en=6, t_de=6,
    // c(aa|en)=c(bb|en)=3 → each token P=(3+1)/10:
    //   en: ln(1/2) + 3·ln(4/10)  (each term rounded 6dp)
    //   de: ln(1/2) + 3·ln(1/10)  (all three tokens unseen in de)
    val lnHalf = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val en = lnHalf +
      BigDecimal(math.log(0.4)).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 3
    val de = lnHalf +
      BigDecimal(math.log(0.1)).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 3
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(r0.getAs[Double]("nb_logp") ==
      en.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r0.getAs[Double]("margin") ==
      (en - de).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unseen words fall back to the smoothed class mass, not a null") {
    // 'zz' appears in no training class; both classes score it with
    // ln(1/(t_l+V)) and the prediction is driven by the seen token.
    val d = docs(
      (0L, "aa aa", "en"),
      (1L, "cc cc", "de"),
      (2L, "aa zz", "en"))
    val r2 = Classify.nbLangScores(d).collect()
      .find(_.getAs[Long]("doc_id") == 2L).get
    assert(r2.getAs[String]("nb_pred") == "en")
    assert(!r2.isNullAt(r2.fieldIndex("nb_logp")))
    assert(r2.getAs[Double]("margin") > 0.0)
  }

  test("ties break on label order and margin is then zero") {
    // Symmetric corpus: doc 'aa bb' scores identically under both
    // classes → argmax picks 'de' < 'en' lexicographically, margin 0.
    val d = docs(
      (0L, "aa bb", "en"),
      (1L, "aa bb", "de"))
    val rows = Classify.nbLangScores(d).collect()
    assert(rows.forall(_.getAs[String]("nb_pred") == "de"))
    assert(rows.forall(_.getAs[Double]("margin") == 0.0))
  }

  test("nbConfusion rows sum to class mass with correct fractions") {
    val r = Classify.nbConfusion(separable).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("nb_pred")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("row_frac"))).toMap
    assert(r(("en", "en")) == ((2L, 1.0)))
    assert(r(("de", "de")) == ((2L, 1.0)))
    assert(r.size == 2)
  }
}
