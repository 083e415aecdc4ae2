package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: the chunked two-phase prefix sum must equal the
  * naive single-window global cumsum, and pack assignment must respect
  * capacity boundaries.
  */
class PackingSpec extends SparkSpec {

  test("chunked offsets ≡ naive global window, packs cut at capacity") {
    val spark2 = spark
    import spark2.implicits._
    // token counts chosen to exercise: exact boundary fill (10),
    // straddle (7 across offset 28→35 with capacity 10), multi-chunk
    // (chunkSize 3 over 10 docs → 4 chunks)
    val docsDf = Seq(
      (0L, 4L), (1L, 6L), (2L, 3L), (3L, 7L), (4L, 10L),
      (5L, 2L), (6L, 6L), (7L, 5L), (8L, 1L), (9L, 9L))
      .toDF("doc_id", "tokens")
    val packed = Packing.packSequences(docsDf, col("tokens"), capacity = 10L,
      chunkSize = 3L).collect()
    val naive = docsDf
      .withColumn("tok_offset", coalesce(
        sum("tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").collect()
    assert(packed.length == 10)
    packed.zip(naive).foreach { case (p, n) =>
      assert(p.getAs[Long]("doc_id") == n.getAs[Long]("doc_id"))
      assert(p.getAs[Long]("tok_offset") == n.getAs[Long]("tok_offset"),
        s"offset mismatch at doc ${p.getAs[Long]("doc_id")}")
      val off = p.getAs[Long]("tok_offset")
      assert(p.getAs[Long]("pack_id") == off / 10)
      assert(p.getAs[Long]("pack_pos") == off % 10)
      assert(p.getAs[Boolean]("straddles") == (off % 10 + p.getAs[Long]("tokens") > 10))
    }
    // doc 0+1 fill pack 0 exactly (4+6=10): doc 2 starts pack 1 cleanly
    val byId = packed.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(2L).getAs[Long]("pack_pos") == 0L && !byId(1L).getAs[Boolean]("straddles"))
    // doc 4 (10 tokens) starts at offset 20 → fills pack 2 exactly
    assert(byId(4L).getAs[Long]("pack_pos") == 0L && !byId(4L).getAs[Boolean]("straddles"))
    // offsets: 0,4,10,13,20,30,32,38,43,44 — docs 7 (38+5) and 9 (44+9)
    // cross a pack boundary; everything else fits
    assert(packed.filter(_.getAs[Boolean]("straddles"))
      .map(_.getAs[Long]("doc_id")).toSet == Set(7L, 9L))
  }

  test("degenerate chunking (one doc per chunk) still exact") {
    val spark2 = spark
    import spark2.implicits._
    val docsDf = (0L until 7L).map(i => (i, i + 1)).toDF("doc_id", "tokens")
    val packed = Packing.packSequences(docsDf, col("tokens"), capacity = 5L,
      chunkSize = 1L).collect()
    // offsets are 0,1,3,6,10,15,21 (prefix sums of 1..7)
    val expected = Seq(0L, 1L, 3L, 6L, 10L, 15L, 21L)
    assert(packed.map(_.getAs[Long]("tok_offset")).toSeq == expected)
  }
}
