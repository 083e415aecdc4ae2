package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** [[GlobalRank]] must be bit-identical to the single-partition plan:
  * chunked row_number vs `row_number() OVER (ORDER BY …)` and chunked
  * ntile vs `ntile(n) OVER (ORDER BY …)` on data with ties, skew, and
  * non-divisible totals.
  */
class GlobalRankSpec extends SparkSpec {

  // 97 rows, heavy ties in v (17 distinct values), unique tie-break id
  private lazy val data = {
    import spark.implicits._
    (1 to 97).map(i => (i.toLong, (i * 31 % 17).toLong)).toDF("id", "v")
  }

  test("chunkedRowNumber equals the plain global row_number (desc + tie-break)") {
    val plain = data.withColumn("rnk",
      row_number().over(Window.orderBy(desc("v"), col("id"))))
    val chunked = GlobalRank.chunkedRowNumber(
      data, -col("v"), Seq(desc("v"), col("id")))
    val p = plain.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2)))
    val c = chunked.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(p.sameElements(c))
  }

  test("chunkedNtile equals plain ntile for divisible and ragged totals") {
    for (n <- Seq(3, 5, 7, 97, 200)) {
      val plain = data.withColumn("tile",
        ntile(n).over(Window.orderBy(desc("v"), col("id"))))
      val total = data.agg(count(lit(1)).as("__t"))
      val chunked = GlobalRank.chunkedNtile(
        data.crossJoin(broadcast(total)),
        -col("v"), Seq(desc("v"), col("id")), "__t", n, "tile")
      val p = plain.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2)))
      val c = chunked.orderBy("id").select("id", "tile").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(p.sameElements(c), s"ntile($n) mismatch")
    }
  }

  test("a non-monotone bucket fails loudly instead of mis-ranking") {
    // bucket = v % 3 is NOT monotone along ORDER BY v: bucket-0 rows
    // (v=0,3,6…) interleave with bucket-1/2 rows in sort order
    val bad = GlobalRank.chunkedRowNumber(
      data, col("v") % 3, Seq(col("v"), col("id")))
    val e = intercept[Throwable](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("monotone")),
      s"expected the monotonicity assertion, got: $e")
  }

  test("a full sort key repeated across two buckets fails loudly") {
    import spark.implicits._
    // key (v) is equal across rows that land in different buckets —
    // the tie group would be split arbitrarily by the decomposition
    val ties = Seq((1L, 5L), (2L, 5L), (3L, 9L)).toDF("id", "v")
    val bad = GlobalRank.chunkedRowNumber(ties, col("id"), Seq(col("v")))
    val e = intercept[Throwable](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("monotone")),
      s"expected the monotonicity assertion, got: $e")
  }

  test("executed plan has no unpartitioned table-sized window") {
    val chunked = GlobalRank.chunkedRowNumber(
      data, -col("v"), Seq(desc("v"), col("id")))
    chunked.collect()
    val plan = chunked.queryExecution.executedPlan.toString
    // the only Window without partition keys must be the per-bucket
    // offset cumsum (runs over bucket-cardinality rows); the data-sized
    // window must carry the __grb partition spec
    assert(plan.contains("__grb"), "expected bucket-partitioned window in plan")
  }
}
