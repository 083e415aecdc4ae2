package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Sketch

/** KMV bottom-k cardinality sketch: exact branch below k, estimator
  * accuracy above k, and the WindowGroupLimit partial top-k in the
  * physical plan (the property that keeps the sketch shuffle bounded
  * at corpus scale).
  */
class SketchSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t, src) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("below k the sketch is exact: est = k_eff = exact") {
    // one doc, 5 words → 3 distinct 3-grams, k = 128
    val d = docs((0L, "a b c d e", "srcA"))
    val r = Sketch.kmvDistinctNgrams(d, 3, 128).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("exact_distinct") == 3L)
    assert(r(0).getAs[Long]("k_eff") == 3L)
    assert(r(0).getAs[Double]("est_distinct") == 3.0)
    assert(r(0).getAs[Double]("rel_err") == 0.0)
  }

  test("above k the estimator lands within ±3/√k of the truth") {
    // 2000 distinct unigrams (n=1 grams), k=64 → σ ≈ 1/8; allow 3σ
    val words = (1 to 2000).map(i => s"w$i").mkString(" ")
    val d = docs((0L, words, "big"))
    val r = Sketch.kmvDistinctNgrams(d, n = 1, k = 64).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("exact_distinct") == 2000L)
    assert(r(0).getAs[Long]("k_eff") == 64L)
    val err = math.abs(r(0).getAs[Double]("rel_err"))
    assert(err <= 3.0 / math.sqrt(64.0), s"rel_err $err out of bound")
  }

  test("sketch set algebra: identical sources give J=1, disjoint give J=0") {
    // srcA ≡ srcB (same text → same gram set, 3 grams each);
    // srcC disjoint (3 other grams); all below k → exact counts
    val d = docs(
      (0L, "a b c d e", "srcA"),
      (1L, "a b c d e", "srcB"),
      (2L, "v w x y z", "srcC"))
    val r = Sketch.kmvSourceOverlap(d, 3, 128).collect()
      .map(x => (x.getAs[String]("src_a"), x.getAs[String]("src_b")) ->
        (x.getAs[Double]("union_est"), x.getAs[Double]("jaccard_est"),
          x.getAs[Double]("inter_est"))).toMap
    assert(r(("srcA", "srcB")) == ((3.0, 1.0, 3.0)))
    assert(r(("srcA", "srcC")) == ((6.0, 0.0, 0.0)))
    assert(r(("srcB", "srcC")) == ((6.0, 0.0, 0.0)))
  }

  test("the bottom-k filter compiles to a WindowGroupLimit partial top-k") {
    val d = docs((0L, "a b c d e f g", "srcA"))
    val plan = Sketch.kmvSketchOnly(d, 3, 8).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }
}
