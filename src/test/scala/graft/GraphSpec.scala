package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Graph

/** PageRank structure goldens on a planted path graph. */
class GraphSpec extends SparkSpec {

  private def pairs(rows: (Long, Long)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (a, b) => (a, b, 1.0) }.toDF("doc_a", "doc_b", "jaccard")
  }

  test("pageRank on a path: symmetric ends, dominant center, ranks sum to 1") {
    val r = Graph.pageRank(pairs((1L, 2L), (2L, 3L))).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L).getAs[Long]("degree") == 1L && r(2L).getAs[Long]("degree") == 2L)
    val (r1, r2, r3) = (r(1L).getAs[Double]("rank"),
      r(2L).getAs[Double]("rank"), r(3L).getAs[Double]("rank"))
    assert(r1 == r3) // symmetry is exact under the rounded arithmetic
    assert(r2 > r1)
    assert(math.abs(r1 + r2 + r3 - 1.0) < 1e-6)
  }

  test("pageRank on two disconnected edges is uniform") {
    val r = Graph.pageRank(pairs((1L, 2L), (3L, 4L))).collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Double]("rank")).distinct.length == 1)
  }

  test("triangles: K4 is all-clique (cc=1), an attached path closes nothing") {
    // K4 over 1..4 (6 edges) + pendant path 4-5-6
    val r = Graph.triangleStats(pairs(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("degree"), x.getAs[Long]("triangles"),
          x.getAs[Double]("clustering"))).toMap
    // each K4 node sits in C(3,2)=3 triangles of its 3 clique peers
    assert(r(1L) == ((3L, 3L, 1.0)))
    assert(r(2L) == ((3L, 3L, 1.0)))
    assert(r(3L) == ((3L, 3L, 1.0)))
    // node 4 gains the pendant edge: degree 4, still 3 triangles,
    // cc = 2·3/(4·3) = 0.5
    assert(r(4L) == ((4L, 3L, 0.5)))
    assert(r(5L) == ((2L, 0L, 0.0))) // path middle: open wedge only
    assert(r(6L) == ((1L, 0L, 0.0))) // leaf: degree < 2
  }
}
