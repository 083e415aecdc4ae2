package graft

import java.sql.Date
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Quality

/** DataQualityChecker parity (SURVEY.md §2.8; FIXTURES.md §B case 3) —
  * each reference rule (/root/reference/fetch_and_store.py:60-120) fires
  * on a crafted row; missing fields short-circuit.
  */
class QualitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("symbol", StringType), StructField("date", DateType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("adj_close", DoubleType), StructField("volume", LongType)))

  private def d(i: Int) = Date.valueOf(f"2020-01-$i%02d")

  // (row, expected error slugs in rule order)
  private val cases: Seq[(Row, Seq[String])] = Seq(
    Row("A", d(1), 10.0, 11.0, 9.0, 10.2, 10.0, 100L) -> Nil,
    // missing close short-circuits: only missing_*, even though close
    // rules would also fail
    Row("A", d(2), 10.0, 11.0, 9.0, null, 10.0, 100L) -> Seq("missing_close"),
    Row("A", d(3), -1.0, 11.0, 9.0, 10.0, 10.0, 100L) ->
      Seq("invalid_open", "low_gt_open_close"),
    Row("A", d(4), 10.0, -2.0, 9.0, 10.0, 10.0, 100L) ->
      Seq("invalid_high", "high_lt_low", "high_lt_open_close"),
    Row("A", d(5), 10.0, 11.0, -3.0, 10.0, 10.0, 100L) -> Seq("invalid_low"),
    Row("A", d(6), 10.0, 11.0, 9.0, -4.0, 10.0, 100L) ->
      Seq("invalid_close", "low_gt_open_close", "extreme_swing"),
    Row("A", d(7), 10.0, 11.0, 9.0, 10.0, 10.0, -5L) -> Seq("negative_volume"),
    Row("A", d(8), 10.0, 9.5, 9.8, 9.6, 10.0, 100L) ->
      Seq("high_lt_low", "high_lt_open_close", "low_gt_open_close"),
    Row("A", d(9), 10.0, 16.0, 9.0, 16.0, 10.0, 100L) -> Seq("extreme_swing"),
    Row("AAPL", d(10), 10.0, 11.0, 9.0, 10.0, 10.0, 0L) -> Seq("zero_volume_major"),
    // zero volume on a non-major symbol is allowed (fetch_and_store.py:98)
    Row("B", d(11), 10.0, 11.0, 9.0, 10.0, 10.0, 0L) -> Nil)

  private lazy val df = spark.createDataFrame(
    spark.sparkContext.parallelize(cases.map(_._1)), schema)

  test("per-row error arrays match the reference battery") {
    val got = Quality.withVerdict(df).orderBy("date")
      .select("errors").collect().map(_.getSeq[String](0).toList)
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((a, e), i) =>
      assert(a == e.toList, s"row $i")
    }
  }

  test("valid ∪ rejects = input; counts match") {
    val valid = Quality.validRows(df)
    val rej = Quality.rejects(df)
    assert(valid.count() == 2)
    assert(rej.count() == cases.size - 2)
    assert(valid.count() + rej.count() == df.count())
  }

  test("issue histogram counts per slug, desc") {
    val h = Quality.issueHistogram(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h("low_gt_open_close") == 3)
    assert(h("extreme_swing") == 2)
    assert(h("missing_close") == 1)
    assert(h("zero_volume_major") == 1)
  }

  test("success rate per symbol") {
    val sr = Quality.successRate(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(sr == List(("A", 1L, 9L), ("AAPL", 0L, 1L), ("B", 1L, 1L)))
  }

  test("interpolated messages carry the offending values, missing short-circuits") {
    val bad = bars("AA", Seq(10.0)).withColumn("close", lit(-2.5))
    val errs = Quality.withMessages(bad)
      .select(explode(col("errors")).as("e")).collect().map(_.getString(0)).toSeq
    assert(errs == Seq(
      "Invalid close price: $-2.5000",
      "Low ($9.0000) > Open/Close min",
      "Extreme price movement: -126.3% in one day"))
    // a missing field reports ONLY the Missing message, value rules skipped
    val missing = bars("AA", Seq(10.0))
      .withColumn("open", lit(null).cast("double"))
      .withColumn("close", lit(-2.5))
    val merrs = Quality.withMessages(missing)
      .select(explode(col("errors")).as("e")).collect().map(_.getString(0)).toSeq
    assert(merrs == Seq("Missing Open"))
  }

  test("continuity flags a >2x/<0.5x gap (P12)") {
    val oldB = bars("A", Seq(100.0, 100.0))
    val newB = bars("A", Seq(40.0)).withColumn("open", lit(40.0))
      .withColumn("date", lit("2021-01-01").cast("date"))
    val c = Quality.continuity(oldB, newB).collect()
    assert(c.length == 1)
    assert(c.head.getAs[String]("flag") == "discontinuity")
  }
}
