package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition sort — the
  * [[WindowChunks]] idea applied to `row_number() OVER (ORDER BY …)`.
  *
  * A global rank window moves the whole table through ONE task. But if
  * the caller supplies a coarse integer `bucket` that is MONOTONE
  * NON-DECREASING along the global sort order (e.g. `-frequency` for an
  * `ORDER BY frequency DESC`), the global rank decomposes exactly:
  *
  *   rank(row) = Σ count(earlier buckets)  +  row_number within bucket
  *
  * The bucket counts are one tiny aggregate (one row per bucket — the
  * only remaining global window runs over THAT, bounded by bucket
  * cardinality, not table cardinality) broadcast back; the within-bucket
  * row_number partitions by bucket — parallelism = bucket count. Every
  * arithmetic step is integer-exact, so the result is bit-identical to
  * the single-partition plan (GlobalRankSpec proves it vs the plain
  * window; the oracle SQL keeps using plain `row_number`/`ntile`).
  *
  * Correctness requires only monotonicity, not balance: ties across a
  * bucket boundary are impossible because equal sort keys map to equal
  * buckets, and the within-bucket window orders by the FULL sort key
  * (including tie-breaks).
  */
object GlobalRank {

  /** Global `row_number() OVER (ORDER BY order…)` as `out`, decomposed
    * over `bucket` (monotone non-decreasing along `order` — the caller
    * negates descending keys).
    *
    * The monotonicity precondition is CHECKED, not trusted: the
    * decomposition is exact iff concatenating the buckets' sorted runs
    * in bucket order yields a globally sorted sequence, which holds iff
    * every per-bucket boundary row (first/last in sort order) is
    * bucket-ordered when the boundary rows are globally sorted — and no
    * full sort key repeats across two buckets (an equal key straddling
    * a boundary would make the split of its tie group arbitrary). Both
    * conditions fold into the offsets side as an `assert_true` that the
    * broadcast join cannot prune, so a non-monotone bucket fails the
    * job loudly instead of mis-ranking. Cost: one extra pass over `df`
    * (window + boundary filter) and one window over ≤2 rows per bucket
    * — the same bucket-cardinality bound as the offsets window.
    */
  def chunkedRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      out: String = "rnk"): DataFrame = {
    val withB = df.withColumn("__grb", bucket)
    // one row per bucket; the cumulative-offset window is bounded by
    // bucket cardinality (coarse by construction), not by |df|
    val offsets = withB.groupBy("__grb").agg(count(lit(1)).as("__grn"))
      .withColumn("__groff", coalesce(
        sum("__grn").over(Window.orderBy("__grb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__grb", "__groff")
    // guard: per-bucket boundary rows, globally sorted by the caller's
    // order (bucket appended ascending so cross-bucket ties land
    // bucket-ascending and are caught by the key-equality term, not
    // missed by the decrease term). The key VALUES are projected out
    // (the order columns may be desc-wrapped SortOrders — split via the
    // shim and re-applied to the projected fields)
    val split = order.map(org.apache.spark.sql.GraftShims.splitSortOrder)
    val keys = struct(split.zipWithIndex.map {
      case ((k, _), i) => k.as(s"k$i") }: _*)
    val wInB = Window.partitionBy("__grb").orderBy(order: _*)
    val bounds = withB
      .withColumn("__grrn", row_number().over(wInB))
      .withColumn("__grcnt", count(lit(1)).over(Window.partitionBy("__grb")))
      .filter(col("__grrn") === 1 || col("__grrn") === col("__grcnt"))
      .select(col("__grb"), keys.as("__grkey"))
    val boundOrder = split.zipWithIndex.map {
      case ((_, reapply), i) => reapply(col("__grkey")(s"k$i")) }
    val wBounds = Window.orderBy(boundOrder :+ col("__grb").asc: _*)
    val viol = bounds
      .withColumn("__grpb", lag("__grb", 1).over(wBounds))
      .withColumn("__grpk", lag("__grkey", 1).over(wBounds))
      .agg(sum(when(col("__grpb") > col("__grb") ||
          (col("__grpb") =!= col("__grb") && (col("__grpk") <=> col("__grkey"))),
        1L).otherwise(0L)).as("__grviol"))
    val checked = offsets.crossJoin(viol)
      .withColumn("__groff", col("__groff") + coalesce(
        assert_true(coalesce(col("__grviol"), lit(0L)) === 0L,
          lit("GlobalRank: bucket is not monotone non-decreasing along " +
            "the sort order (or a full sort key repeats across buckets) " +
            "— the chunked rank would be wrong")).cast("long"), lit(0L)))
      .select("__grb", "__groff")
    withB.join(broadcast(checked), "__grb")
      .withColumn(out,
        (col("__groff") +
          row_number().over(Window.partitionBy("__grb").orderBy(order: _*)))
          .cast("int"))
      .drop("__grb", "__groff")
  }

  /** `ntile(n)` from an exact rank and the frame total — the same
    * tiling Spark and DuckDB compute: the first (total % n) tiles get
    * (total div n + 1) rows, the rest (total div n). Pure integer
    * arithmetic; the CASE guards the q=0 (total < n) degenerate tier.
    */
  def ntileFromRank(rankCol: String, totalCol: String, n: Int): Column =
    expr(
      s"""CASE WHEN $rankCol <= ($totalCol % $n) * ($totalCol div $n + 1)
         |THEN ($rankCol - 1) div ($totalCol div $n + 1) + 1
         |ELSE ($totalCol % $n) +
         |  ($rankCol - ($totalCol % $n) * ($totalCol div $n + 1) - 1)
         |    div ($totalCol div $n) + 1 END""".stripMargin.replace('\n', ' '))
      .cast("int")

  /** Convenience: global ntile(n) over `order` via [[chunkedRowNumber]]
    * + [[ntileFromRank]]; `total` is a broadcast one-row count joined in
    * by the caller (shared across several ntiles of the same frame).
    */
  def chunkedNtile(df: DataFrame, bucket: Column, order: Seq[Column],
      totalCol: String, n: Int, out: String): DataFrame =
    chunkedRowNumber(df, bucket, order, s"__grk_$out")
      .withColumn(out, ntileFromRank(s"__grk_$out", totalCol, n))
      .drop(s"__grk_$out")
}
