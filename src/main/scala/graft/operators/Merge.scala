package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / merge semantics on PK (symbol, date) — SURVEY.md §2.3 J1/J2
  * and §2.7 I1–I3.
  *
  * The reference upserts into MySQL with
  * `INSERT … ON DUPLICATE KEY UPDATE` (last-wins,
  * /root/reference/fetch_and_store.py:306-314,
  * /root/reference/fetch_and_store_multi.py:218-240) and
  * `INSERT IGNORE` (first-wins, /root/reference/fetch_yfinance.py:23-26).
  * With plain parquet (no transactional table format available here) a
  * merge is a snapshot rewrite; the relational core is a left-anti join.
  *
  * Scale notes: both sides shuffle on the PK. At 100 TB the right move is
  * partition-pruned overwrite — partition the target by a (symbol-bucket,
  * date-range) grid, left-anti join only the partitions the new batch
  * touches, and use dynamic partition overwrite so untouched partitions
  * are never read or written. The left-anti join itself broadcasts
  * whenever the new batch (a daily increment) is small relative to the
  * target, which Spark/AQE picks up from size stats.
  */
object Merge {

  private val pk = Seq("symbol", "date")

  /** J1: last-wins upsert — every new row lands, old rows survive only
    * where no new row shares the PK.
    */
  def upsert(target: DataFrame, updates: DataFrame): DataFrame =
    updates.unionByName(target.join(updates, pk, "left_anti"))

  /** J2: first-wins insert-ignore — existing rows win, new rows land
    * only on unseen PKs.
    */
  def insertIgnore(target: DataFrame, inserts: DataFrame): DataFrame =
    target.unionByName(inserts.join(target, pk, "left_anti"))

  /** J1 alternative shape, used when the two batches are already unioned
    * with a source-priority column: keep the highest-priority row per PK.
    * Deterministic tiebreak required from the caller (priority unique per
    * PK within the union).
    */
  def dedupByPriority(unioned: DataFrame, priorityCol: String): DataFrame =
    unioned
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(pk.map(col): _*).orderBy(desc(priorityCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Snapshot diff (the CDC classify step): full-outer join on the PK
    * comparing the close, emitting added / removed / changed /
    * unchanged per key. Presence is carried by EXPLICIT marker columns,
    * not inferred from close nullity — a present row whose close is
    * null would otherwise misclassify as added/removed — and the value
    * comparison is null-safe (`<=>`), so null→null is "unchanged" and
    * null↔value is "changed". Equality compares the stored doubles
    * bit-for-bit — correct for change capture, where "unchanged" means
    * the value was not rewritten. One PK shuffle on each side.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.select(col("symbol"), col("date"),
      col("close").as("old_close"), lit(true).as("__in_old"))
    val n = newDf.select(col("symbol"), col("date"),
      col("close").as("new_close"), lit(true).as("__in_new"))
    o.join(n, pk, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("old_close") <=> col("new_close"), "unchanged")
          .otherwise("changed"))
      .drop("__in_old", "__in_new")
      .orderBy("symbol", "date")
  }

  /** I1: per-symbol high-watermark (`MAX(date) WHERE symbol=?` for all
    * symbols at once — /root/reference/fetch_and_store_multi.py:29-39).
    */
  def watermarks(df: DataFrame): DataFrame =
    df.groupBy("symbol").agg(max("date").as("last_date")).orderBy("symbol")

  /** I2: incremental filter — rows strictly after each symbol's
    * watermark (fetch_and_store_multi.py:269-279). Watermark side is a
    * per-symbol aggregate (tiny) → broadcast join at any scale.
    */
  def incremental(source: DataFrame, marks: DataFrame): DataFrame =
    source.join(broadcast(marks), Seq("symbol"), "left")
      .filter(col("last_date").isNull || col("date") > col("last_date"))
      .drop("last_date")
}
