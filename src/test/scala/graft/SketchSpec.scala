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

  test("cmsSelfJoinSize: one-sided estimate, exact on a collision-free fixture") {
    val spark2 = spark
    import spark2.implicits._
    // counts 3, 2, 1 → exact self-join size 9 + 4 + 1 = 14; three keys
    // in 4096 buckets land collision-free, so est == exact.
    val ev = (Seq.fill(3)(10L) ++ Seq.fill(2)(20L) ++ Seq(30L)).toDF("user_id")
    val r = Sketch.cmsSelfJoinSize(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_keys") == 3L)
    assert(r(0).getAs[Long]("exact_size") == 14L)
    assert(r(0).getAs[Long]("est_size") == 14L)
    assert(r(0).getAs[Long]("overcount") == 0L)
    assert(r(0).getAs[Double]("rel_err") == 0.0)
  }

  test("cmsSelfJoinSize never undercounts when collisions are forced") {
    val spark2 = spark
    import spark2.implicits._
    // 3000 keys into 4096 buckets force collisions; the inner-product
    // estimate may only go UP.
    val ev = (0L until 3000L).flatMap(u => Seq.fill((u % 3).toInt + 1)(u))
      .toDF("user_id")
    val r = Sketch.cmsSelfJoinSize(ev).collect()(0)
    assert(r.getAs[Long]("overcount") >= 0L)
    assert(r.getAs[Long]("est_size") >= r.getAs[Long]("exact_size"))
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

  test("HLL estimator lands within ±3σ; tiny sources take the linear-counting branch") {
    // big: 3000 distinct unigrams at m=512 → raw branch, σ = 1.04/√512
    // tiny: 4 distinct grams → almost-empty registers, corrected branch,
    // where linear counting is near-exact
    val words = (1 to 3000).map(i => s"w$i").mkString(" ")
    val d = docs((0L, words, "big"), (1L, "p q r s t u", "tiny"))
    val r = Sketch.hllDistinctNgrams(d, n = 1, p = 9).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val big = r("big")
    assert(big.getAs[Long]("exact_distinct") == 3000L)
    assert(big.getAs[Int]("corrected") == 0)
    assert(math.abs(big.getAs[Double]("rel_err")) <= 3.0 * 1.04 / math.sqrt(512.0))
    val tiny = r("tiny")
    assert(tiny.getAs[Long]("exact_distinct") == 6L)
    assert(tiny.getAs[Int]("corrected") == 1)
    assert(math.abs(tiny.getAs[Double]("est_distinct") - 6.0) <= 1.0)
  }

  test("HLL merged union equals the direct global sketch") {
    // split one 1500-word vocabulary across three sources with overlap;
    // the union estimate must equal an HLL computed on the global set —
    // i.e. merging register files loses nothing
    val all = (1 to 1500).map(i => s"w$i")
    val d = docs(
      (0L, all.take(700).mkString(" "), "a"),
      (1L, all.slice(500, 1100).mkString(" "), "b"),
      (2L, all.drop(900).mkString(" "), "c"))
    val merged = Sketch.hllUnion(d, n = 1, p = 9).collect()(0)
    val direct = Sketch.hllDistinctNgrams(
      d.withColumn("source", org.apache.spark.sql.functions.lit("one")),
      n = 1, p = 9).collect()(0)
    assert(merged.getAs[Long]("exact_distinct") == 1500L)
    assert(merged.getAs[Long]("s_int") == direct.getAs[Long]("s_int"))
    assert(merged.getAs[Double]("est_distinct") ==
      direct.getAs[Double]("est_distinct"))
  }

  test("CMS point queries never undercount and respect the e·N/width bound") {
    // 400 distinct unigrams, skewed counts: w1 appears 50×, rest once
    val txt = (Seq.fill(50)("w1") ++ (2 to 400).map(i => s"w$i")).mkString(" ")
    val d = docs((0L, txt, "src"))
    val r = Sketch.cmsHeavyHitters(d, n = 1, depth = 4, width = 64, k = 10).collect()
    assert(r.length == 10)
    val byGram = r.map(x => x.getAs[String]("gram") -> x).toMap
    assert(byGram("w1").getAs[Long]("exact_cnt") == 50L)
    r.foreach { x =>
      val over = x.getAs[Long]("overcount")
      assert(over >= 0L, s"${x.getAs[String]("gram")} undercounted")
      assert(x.getAs[Long]("est_cnt") ==
        x.getAs[Long]("exact_cnt") + over)
    }
    // N = 449 occurrences, width 64 → ε·N ≈ e/64·449 ≈ 19; min-of-4
    // rows should do far better, but assert the hard Markov-ish bound
    r.foreach(x => assert(x.getAs[Long]("overcount") <= 19L))
  }
}
