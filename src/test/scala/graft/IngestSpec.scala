package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** Schema-adaptive ingest (reference fetch_and_store_multi.py:41-82,
  * :202-242): name resolution for every adj_close spelling, flattened
  * MultiIndex names, the missing-column fallback, and the NaN/None→0
  * record fill.
  */
class IngestSpec extends SparkSpec {

  test("canonical resolves all four adj_close spellings and flattened names") {
    for (v <- Ingest.adjCloseVariants) {
      assert(Ingest.canonical(v).contains("adj_close"), v)
      assert(Ingest.canonical(v.toUpperCase).contains("adj_close"), v)
      assert(Ingest.canonical(s"  $v  ").contains("adj_close"), v)
      assert(Ingest.canonical(s"AAPL $v").contains("adj_close"), s"AAPL $v")
    }
    assert(Ingest.canonical("Open").contains("open"))
    assert(Ingest.canonical(" Date ").contains("date"))
    assert(Ingest.canonical("AAPL Close").contains("close"))
    assert(Ingest.canonical("Dividends").isEmpty)
  }

  test("normalizeSchema canonicalizes names, fills nulls, casts types") {
    val raw = bars("AA", Seq(10.0, 11.0, 12.0)).select(
      col("symbol").as("Symbol"),
      col("date").as(" Date "),
      col("open").as("Open"),
      col("high").as("AAPL High"),
      when(col("volume") === 101L, lit(null).cast("double"))
        .otherwise(col("low")).as("Low"),
      col("close").as("Close"),
      col("adj_close").as("Adjusted_Close"),
      col("volume").as("Volume"))
    val out = Ingest.normalizeSchema(raw).orderBy("date")
    assert(out.columns.toSeq ==
      Seq("symbol", "date", "open", "high", "low", "close", "adj_close", "volume"))
    val rows = out.collect()
    assert(rows.length == 3)
    // the null low (second row) filled with 0.0, others intact
    assert(rows.map(_.getAs[Double]("low")).toSeq == Seq(9.0, 0.0, 11.0))
    assert(rows.map(_.getAs[Double]("adj_close")).toSeq ==
      Seq(10.0 * 0.98, 11.0 * 0.98, 12.0 * 0.98))
    assert(out.schema("date").dataType.typeName == "date")
    assert(out.schema("volume").dataType.typeName == "long")
  }

  test("missing adj_close tolerated as a null column; symbol from argument") {
    val raw = bars("AA", Seq(10.0)).select(
      col("date").as("Date"), col("open").as("Open"), col("high").as("High"),
      col("low").as("Low"), col("close").as("Close"), col("volume").as("Volume"))
    val out = Ingest.normalizeSchema(raw, symbol = Some("ZZ"))
    val row = out.collect().head
    assert(row.getAs[String]("symbol") == "ZZ")
    assert(row.isNullAt(out.columns.indexOf("adj_close")))
  }

  test("missing required column fails fast with the reference's message shape") {
    val raw = bars("AA", Seq(10.0)).drop("close", "adj_close")
    val e = intercept[IllegalArgumentException](Ingest.normalizeSchema(raw))
    assert(e.getMessage.contains("Missing columns"))
    assert(e.getMessage.contains("close"))
  }

  test("NaN prices fill to 0.0 like pd.notna") {
    val raw = bars("AA", Seq(10.0))
      .withColumn("open", lit(Double.NaN))
    val out = Ingest.normalizeSchema(raw)
    assert(out.collect().head.getAs[Double]("open") == 0.0)
  }
}
