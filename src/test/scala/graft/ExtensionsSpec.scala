package graft

import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** SQL surface of the custom Catalyst expression: ewm_mean registered
  * through the SparkSessionExtensions descriptor must match the
  * Column-API EwmMean over a window.
  */
class ExtensionsSpec extends SparkSpec {

  test("extension rule rejects grouping ewm_mean at analysis; window use passes") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a static conf — inert when the builder
    // reuses an existing SparkContext — so attach programmatically
    val ext = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      import ext.implicits._
      Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("k", "x")
        .createOrReplaceTempView("t_ewm_guard")
      val e = intercept[Throwable] {
        ext.sql("SELECT k, ewm_mean(x, 0.5) AS e FROM t_ewm_guard GROUP BY k")
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("order-sensitive"), msgs)
      // the window form analyzes and runs
      val ok = ext.sql(
        """SELECT k, ewm_mean(x, 0.5) OVER (PARTITION BY k ORDER BY x) AS e
          |FROM t_ewm_guard""".stripMargin).collect()
      assert(ok.length == 3)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("ewm_mean is callable from SQL and matches the Column API") {
    GraftSparkExtensions.register(spark)
    val closes = Seq(10.0, 11.0, 9.0, 12.0, 13.0)
    bars("A", closes).createOrReplaceTempView("ext_bars")
    val sqlResult = spark.sql(
      """SELECT ewm_mean(close, 0.5) OVER (
        |  PARTITION BY symbol ORDER BY date
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ext_bars ORDER BY date""".stripMargin)
      .collect().map(_.getDouble(0))
    // span 3 → alpha 0.5; pandas-verified sequence (FIXTURES.md §B)
    val expected = Seq(10.0, 10.666666666666666, 9.714285714285714,
      10.933333333333334, 12.0)
    sqlResult.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-9)
    }
    val api = bars("A", closes)
      .withColumn("e", graft.functions.EwmMean.ewm(col("close"), 3)
        .over(Indicators.w.rowsBetween(Long.MinValue, 0)))
      .orderBy("date").collect().map(_.getAs[Double]("e"))
    sqlResult.zip(api).foreach { case (s, c) => assert(s == c) }
  }
}
