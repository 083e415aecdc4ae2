package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity search: cosine correctness + top-k ranking. */
class SimilaritySpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float], Int)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  val vecs = emb(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(1f, 0f, 0f, 0f), 0), // identical to 0
    (2L, Seq(0f, 1f, 0f, 0f), 0), // orthogonal to 0
    (3L, Seq(1f, 1f, 0f, 0f), 1), // 45° from 0
    (4L, Seq(-1f, 0f, 0f, 0f), 1)) // opposite of 0

  test("cosine: identical=1, orthogonal=0, 45°≈0.7071, opposite=-1") {
    val r = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id").isin(1, 2, 3, 4))
      .withColumn("cos", Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .orderBy("b.vec_id")
      .select("cos").collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(1.0, 0.0, 0.7071, -1.0))
  }

  test("brute-force top-k ranks by cosine desc with vec_id tiebreak") {
    val top = Similarity.bruteForceTopK(vecs, nQueries = 1, k = 4).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(top.toSeq == Seq((1, 1L, 1.0), (2, 3L, 0.7071), (3, 2L, 0.0), (4, 4L, -1.0)))
  }

  test("bucketed top-k only scores same-label candidates") {
    val top = Similarity.bucketedTopK(vecs, nQueries = 1, k = 4).collect()
      .map(r => r.getAs[Long]("vec_id")).toSet
    assert(top == Set(1L, 2L)) // label 0 bucket only
  }
}
