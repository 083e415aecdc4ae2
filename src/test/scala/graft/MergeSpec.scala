package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Merge/upsert semantics (SURVEY.md §2.3 J1/J2, §2.7 I1-I3) —
  * properties: last-wins vs first-wins on the overlap, PK uniqueness,
  * idempotency, watermark incremental filtering.
  */
class MergeSpec extends SparkSpec {

  private def tbl(rows: (String, String, Double)*) = {
    val data = rows.map { case (s, dt, v) => (s, Date.valueOf(dt), v) }
    spark.createDataFrame(data).toDF("symbol", "date", "close")
  }

  private val target = tbl(
    ("A", "2020-01-01", 1.0), ("A", "2020-01-02", 1.0), ("B", "2020-01-01", 1.0))
  private val updates = tbl(("A", "2020-01-02", 2.0), ("A", "2020-01-03", 2.0))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    val oldT = tbl(
      ("A", "2020-01-01", 1.0), ("A", "2020-01-02", 1.0), ("B", "2020-01-01", 1.0))
    val newT = tbl(
      ("A", "2020-01-02", 1.0), // unchanged
      ("B", "2020-01-01", 2.0), // changed
      ("C", "2020-01-01", 3.0)) // added; A/2020-01-01 removed
    val r = Merge.snapshotDiff(oldT, newT).collect()
      .map(x => (x.getString(0), x.getDate(1).toString) ->
        x.getAs[String]("change_type")).toMap
    assert(r == Map(
      ("A", "2020-01-01") -> "removed",
      ("A", "2020-01-02") -> "unchanged",
      ("B", "2020-01-01") -> "changed",
      ("C", "2020-01-01") -> "added"))
  }

  test("upsert (J1): new rows win on the PK overlap, unseen PKs insert") {
    val m = asMap(Merge.upsert(target, updates))
    assert(m.size == 4)
    assert(m(("A", "2020-01-02")) == 2.0)
    assert(m(("A", "2020-01-03")) == 2.0)
    assert(m(("A", "2020-01-01")) == 1.0)
    assert(m(("B", "2020-01-01")) == 1.0)
  }

  test("insertIgnore (J2): existing rows win, only unseen PKs insert") {
    val m = asMap(Merge.insertIgnore(target, updates))
    assert(m.size == 4)
    assert(m(("A", "2020-01-02")) == 1.0)
    assert(m(("A", "2020-01-03")) == 2.0)
  }

  test("upsert is idempotent and keeps (symbol,date) unique") {
    val once = Merge.upsert(target, updates)
    val twice = Merge.upsert(once, updates)
    assert(asMap(once) == asMap(twice))
    assert(twice.groupBy("symbol", "date").count().filter(col("count") > 1).count() == 0)
  }

  test("dedupByPriority keeps the highest-priority row per PK") {
    val unioned = target.withColumn("prio", lit(0))
      .unionByName(updates.withColumn("prio", lit(1)))
    val m = asMap(Merge.dedupByPriority(unioned, "prio").drop("prio"))
    assert(m == asMap(Merge.upsert(target, updates)))
  }

  test("watermarks (I1) + incremental (I2): only rows past each symbol's max") {
    val marks = Merge.watermarks(target)
    val got = marks.collect().map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(got == Map("A" -> "2020-01-02", "B" -> "2020-01-01"))
    val source = tbl(
      ("A", "2020-01-02", 9.0), ("A", "2020-01-03", 9.0),
      ("B", "2020-01-02", 9.0), ("C", "2020-01-01", 9.0))
    val inc = asMap(Merge.incremental(source, marks))
    assert(inc.keySet == Set(
      ("A", "2020-01-03"), ("B", "2020-01-02"), ("C", "2020-01-01")))
  }
}
