package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Reciprocal-rank fusion: hand-computed ordering, one-sided ids, and
  * the single-query cosine ranking feeding the hybrid.
  */
class RetrievalSpec extends SparkSpec {

  test("rrfFuse: overlap outranks either single list, hand-checked order") {
    val spark2 = spark
    import spark2.implicits._
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rnk")
    val sem = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rnk")
    val r = Retrieval.rrfFuse(lex, sem, k = 10).collect()
    // 1/(60+r) sums: id2 = 1/62+1/61 > id3 = 1/63+1/62 > id1 = 1/61 > id4 = 1/63
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L, 1L, 4L))
    assert(r.head.getAs[Double]("rrf_score") ===
      BigDecimal(1.0 / 62).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble +
      BigDecimal(1.0 / 61).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // one-sided ids carry a null rank on the missing list
    val id4 = r.find(_.getAs[Long]("id") == 4L).get
    assert(id4.isNullAt(id4.fieldIndex("lex_rnk")))
  }

  test("cosineRankForQuery excludes the query and ranks by rounded cosine") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = Retrieval.cosineRankForQuery(emb, 0L, 5).collect()
    assert(r.length == 5 && !r.map(_.getAs[Long]("id")).contains(0L))
    val cs = r.map(_.getAs[Double]("cos")).toSeq
    assert(cs == cs.sorted.reverse)
    assert(r.map(_.getAs[Int]("rnk")).toSeq == (1 to 5))
  }

  test("IVF semantic side: recall gate vs the exact scan, fused overlap holds") {
    // sf0.01 — the oracle fixture (500 vectors; the 50-vector sf0.001
    // corpus quantizes too noisily for a stable gate)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Retrieval.cosineRankForQuery(emb, 0L, 20).collect()
      .map(_.getAs[Long]("id")).toSet
    val ivf = Retrieval.cosineRankForQueryIvf(emb, 20, 8, 2, 2).collect()
      .map(_.getAs[Long]("id")).toSet
    assert(ivf.size == 20 && !ivf.contains(0L))
    val semRecall = ivf.intersect(exact).size.toDouble / exact.size
    assert(semRecall >= 0.5, s"IVF semantic recall@20 $semRecall below gate")
    // fused overlap: the hybrid built on IVF candidates must agree
    // with the exact-side fusion on most of the top 10 — rank fusion
    // dampens candidate-set differences
    val docsDf = Tables.documents(spark, "/root/testdata/sf0.01")
    val lex = graft.operators.TextOps
      .bm25TopK(docsDf, Seq("hash", "merge", "scan"), 20)
      .select(col("doc_id").as("id"), col("rnk"))
    def fusedIds(sem: org.apache.spark.sql.DataFrame): Set[Long] =
      Retrieval.rrfFuse(lex, sem.select("id", "rnk"), 10).collect()
        .map(_.getAs[Long]("id")).toSet
    val fExact = fusedIds(Retrieval.cosineRankForQuery(emb, 0L, 20))
    val fIvf = fusedIds(Retrieval.cosineRankForQueryIvf(emb, 20, 8, 2, 2))
    val fusedOverlap = fIvf.intersect(fExact).size.toDouble / fExact.size
    assert(fusedOverlap >= 0.5, s"fused overlap $fusedOverlap below gate")
  }
}
