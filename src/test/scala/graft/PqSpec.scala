package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product quantization: codes, ADC search, and the exact-L2 ground
  * truth. Fixture: 8 well-separated one-hot anchors (dim 8) plus exact
  * twins of the first two — each subspace's Lloyd's converges to the
  * anchors themselves, so a twin's ADC distance to its original is
  * exactly 0 and it must rank first.
  */
class PqSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float], Int)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def oneHot(i: Int): Seq[Float] =
    Seq.tabulate(8)(j => if (j == i) 100f else 0f)

  private val corpus = emb(
    ((0L until 8L).map(i => (i, oneHot(i.toInt), 0)) ++
      Seq((100L, oneHot(0), 0), (101L, oneHot(1), 0))): _*)

  test("pqCodes: m rows per vector, codes within [0, k), twins share codes") {
    val codes = Similarity.pqCodes(corpus, m = 2, subDim = 4, k = 8, iters = 2).collect()
    assert(codes.length == 20) // 10 vectors x 2 subspaces
    assert(codes.forall(r => r.getAs[Long]("code") >= 0 && r.getAs[Long]("code") < 8))
    val byKey = codes.map(r => (r.getAs[Int]("sub"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("code")).toMap
    for (s <- 0 to 1; (orig, twin) <- Seq((0L, 100L), (1L, 101L)))
      assert(byKey((s, twin)) == byKey((s, orig)), s"sub=$s twin codes diverge")
  }

  test("pqAdcTopK: an exact twin has ADC distance 0 and ranks first") {
    val top = Similarity.pqAdcTopK(corpus, nQueries = 2, kTop = 1,
      m = 2, subDim = 4, k = 8, iters = 2).collect()
    val byQ = top.map(r => r.getAs[Long]("qid") -> r).toMap
    assert(byQ(0L).getAs[Long]("vec_id") == 100L && byQ(0L).getAs[Double]("adc_dist") == 0.0)
    assert(byQ(1L).getAs[Long]("vec_id") == 101L && byQ(1L).getAs[Double]("adc_dist") == 0.0)
  }

  test("pqRerankTopK: exact-cosine rerank puts the twin first with cos 1.0") {
    val top = Similarity.pqRerankTopK(corpus, nQueries = 2, k = 1, cand = 3,
      m = 2, subDim = 4, kc = 8, iters = 2).collect()
    val byQ = top.map(r => r.getAs[Long]("qid") -> r).toMap
    assert(byQ(0L).getAs[Long]("vec_id") == 100L && byQ(0L).getAs[Double]("cos") == 1.0)
    assert(byQ(1L).getAs[Long]("vec_id") == 101L && byQ(1L).getAs[Double]("cos") == 1.0)
  }

  test("l2TopK: exact ground truth ranks the twin first, orthogonal anchors after") {
    val top = Similarity.l2TopK(corpus, nQueries = 1, k = 3).collect()
    assert(top(0).getAs[Long]("vec_id") == 100L && top(0).getAs[Double]("dist") == 0.0)
    // remaining anchors are all at squared distance 100^2+100^2 = 20000,
    // so ranks 2-3 are the lowest vec_ids among them
    assert(top(1).getAs[Long]("vec_id") == 1L && top(1).getAs[Double]("dist") == 20000.0)
    assert(top(2).getAs[Long]("vec_id") == 2L)
  }
}
