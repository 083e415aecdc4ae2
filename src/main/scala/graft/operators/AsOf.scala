package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-event) join — an operator category Spark lacks
  * natively (SURVEY.md §2.3 ⊘). Implemented Spark-first with the
  * union + last(ignoreNulls) ordered-window technique instead of a
  * custom physical operator: tag both sides, union on the shared key /
  * time axis, and carry the latest right-side values forward to each
  * left row with an unbounded-preceding window.
  *
  * Cost model: one shuffle on the partition key + one sort on
  * (key, ts, side) — identical to what a dedicated merge-join-based
  * as-of operator needs, so there is nothing to gain from a custom
  * SparkPlan here; Catalyst's window machinery already gives the
  * single-pass merge. Skew-safe for keys with bounded history; at
  * 100 TB a hot key is salted by time-bucket, with bucket-boundary
  * anchors replicated.
  *
  * Ties (right row at exactly the left timestamp) are inclusive —
  * right side sorts before left at equal ts — matching DuckDB/pandas
  * `merge_asof` backward semantics (the oracle uses DuckDB's native
  * ASOF JOIN, so equivalence is checked cross-implementation).
  */
object AsOf {

  /** Left rows enriched with the most recent right-side values at or
    * before each left row's timestamp.
    *
    * @param left      probe side
    * @param right     reference side: key columns, ts column, value columns
    * @param keys      equality key columns present on both sides
    * @param ts        time column name present on both sides
    * @param valueCols right-side value columns to carry forward
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side 0 = right/reference, 1 = left/probe: at equal ts the
    // reference row sorts first, so last() sees it (inclusive match)
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col(ts), col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts).map(col): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col(ts), col("__side")) ++ valueCols.map(col) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
