package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's DataQualityChecker battery (SURVEY.md §2.8, Q1–Q6) —
  * reference: /root/reference/fetch_and_store.py:18-185.
  *
  * Each rule is a named Column predicate; the verdict is their
  * conjunction and the error list is the array of failed-rule messages
  * (array_compact over per-rule when()s). Everything is a single
  * vectorized projection — the reference's `iterrows()` row loop
  * (fetch_and_store.py:143) becomes whole-stage-codegen'd expressions,
  * no shuffle at all until the histogram aggregation.
  */
object Quality {

  private val requiredFields = Seq("open", "high", "low", "close", "volume")
  private val majorSymbols = Seq("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA")

  /** Value rules (issue name → violation predicate), evaluated only when
    * no required field is missing, per fetch_and_store.py:75-118. Issue
    * names compress the reference's interpolated messages to stable slugs.
    */
  val valueRules: Seq[(String, Column)] = Seq(
    "invalid_open" -> (col("open") <= 0), // fetch_and_store.py:86-87
    "invalid_high" -> (col("high") <= 0), // :89-90
    "invalid_low" -> (col("low") <= 0), // :92-93
    "invalid_close" -> (col("close") <= 0), // :95-96
    "negative_volume" -> (col("volume") < 0), // :98-99
    "high_lt_low" -> (col("high") < col("low")), // :102-103
    "high_lt_open_close" -> (col("high") < greatest(col("open"), col("close"))), // :105-106
    "low_gt_open_close" -> (col("low") > least(col("open"), col("close"))), // :108-109
    "extreme_swing" -> (abs(col("close") - col("open")) / col("open") > 0.5), // :112-114
    "zero_volume_major" -> (col("volume") === 0 && col("symbol").isin(majorSymbols: _*))) // :117-118

  /** Q1: per-row error array + validity verdict. Missing required fields
    * short-circuit — the reference returns early with only the Missing-X
    * messages (fetch_and_store.py:70-76) — so a row with nulls reports
    * missing_* only, never the value rules.
    */
  def withVerdict(df: DataFrame): DataFrame = {
    val missing = array_compact(array(requiredFields.map(f =>
      when(col(f).isNull, lit(s"missing_$f"))): _*))
    val valueErrs = array_compact(array(valueRules.map { case (name, bad) =>
      when(bad, lit(name))
    }: _*))
    df.withColumn("errors",
        when(size(missing) > 0, missing).otherwise(valueErrs))
      .withColumn("is_valid", size(col("errors")) === 0)
  }

  /** Fixed-decimal price rendering for message interpolation, at scale
    * 4 — the true decimal width of the derived prices (2-decimal raw
    * prices × 1.01/0.99/0.97). At or above the true width the double is
    * never ON a rounding boundary, so Spark (which rounds the exact
    * binary value) and DuckDB (which rounds the shortest decimal repr)
    * agree; at width 2 a value like 1261.755 is a tie and the engines
    * split. Same rule as the query-rounding contract in SparkEntry.
    */
  private def d2(c: Column): Column = c.cast("decimal(18,4)").cast("string")

  /** `%+.1f`-style percent rendering (sign always, 1 decimal). */
  private def pct1(c: Column): Column =
    concat(when(c >= 0, lit("+")).otherwise(lit("")),
      c.cast("decimal(28,1)").cast("string"))

  /** Value rules with the reference's interpolated messages
    * (fetch_and_store.py:86-118) — same predicates and order as
    * [[valueRules]], message text carrying the offending values.
    * Deviation: numbers render with fixed decimals (see [[d2]]) and
    * volume without thousands separators, for cross-engine determinism.
    */
  def messageRules: Seq[(Column, Column)] = {
    val changePct = (col("close") - col("open")) / col("open") * lit(100.0)
    Seq(
      (col("open") <= 0, concat(lit("Invalid open price: $"), d2(col("open")))), // :86-87
      (col("high") <= 0, concat(lit("Invalid high price: $"), d2(col("high")))), // :89-90
      (col("low") <= 0, concat(lit("Invalid low price: $"), d2(col("low")))), // :92-93
      (col("close") <= 0, concat(lit("Invalid close price: $"), d2(col("close")))), // :95-96
      (col("volume") < 0, concat(lit("Negative volume: "), col("volume").cast("string"))), // :98-99
      (col("high") < col("low"),
        concat(lit("High ($"), d2(col("high")), lit(") < Low ($"), d2(col("low")), lit(")"))), // :102-103
      (col("high") < greatest(col("open"), col("close")),
        concat(lit("High ($"), d2(col("high")), lit(") < Open/Close max"))), // :105-106
      (col("low") > least(col("open"), col("close")),
        concat(lit("Low ($"), d2(col("low")), lit(") > Open/Close min"))), // :108-109
      (abs(col("close") - col("open")) / col("open") > 0.5,
        concat(lit("Extreme price movement: "), pct1(changePct), lit("% in one day"))), // :112-114
      (col("volume") === 0 && col("symbol").isin(majorSymbols: _*),
        lit("Zero volume for major stock on trading day"))) // :117-118
  }

  /** [[withVerdict]] with the reference's interpolated message text
    * instead of slugs — same missing-field short-circuit (`Missing
    * Open`, capitalized per fetch_and_store.py:70-73).
    */
  def withMessages(df: DataFrame): DataFrame = {
    val missing = array_compact(array(requiredFields.map(f =>
      when(col(f).isNull, lit(s"Missing ${f.capitalize}"))): _*))
    val valueErrs = array_compact(array(messageRules.map { case (bad, msg) =>
      when(bad, msg)
    }: _*))
    df.withColumn("errors",
        when(size(missing) > 0, missing).otherwise(valueErrs))
      .withColumn("is_valid", size(col("errors")) === 0)
  }

  /** Q2: the valid stream (fetch_and_store.py:143-157). */
  def validRows(df: DataFrame): DataFrame =
    withVerdict(df).filter(col("is_valid")).drop("errors", "is_valid")

  /** Q2/S9: the reject side-output (fetch_and_store.py:46-58,153). */
  def rejects(df: DataFrame): DataFrame =
    withVerdict(df).filter(!col("is_valid"))

  /** Q3/A11: issue histogram, count desc (fetch_and_store.py:176-183). */
  def issueHistogram(df: DataFrame): DataFrame =
    withVerdict(df)
      .select(explode(col("errors")).as("issue"))
      .groupBy("issue").count()
      .orderBy(desc("count"), col("issue"))

  /** Q5/A12: per-symbol batch success rate (fetch_and_store.py:160-166). */
  def successRate(df: DataFrame): DataFrame =
    withVerdict(df)
      .groupBy("symbol")
      .agg(
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_rows"),
        count(lit(1)).as("total_rows"))
      .withColumn("success_rate_pct",
        round(col("valid_rows") * lit(100.0) / col("total_rows"), 4))
      .orderBy("symbol")

  /** Q6/P12: cross-batch price-continuity check
    * (fetch_and_store.py:285-294) — last stored close vs first new open;
    * ratio outside [0.5, 2.0] flags a discontinuity (split detection).
    * Implemented as two per-symbol order-safe aggregates joined on
    * symbol; both sides are tiny aggregate results so the join
    * broadcasts at any scale.
    */
  def continuity(oldBatch: DataFrame, newBatch: DataFrame): DataFrame = {
    val lastOld = oldBatch.groupBy("symbol")
      .agg(max_by(col("close"), col("date")).as("last_close"))
    val firstNew = newBatch.groupBy("symbol")
      .agg(min_by(col("open"), col("date")).as("first_open"))
    lastOld.join(firstNew, Seq("symbol"))
      .withColumn("ratio", round(col("first_open") / col("last_close"), 4))
      .withColumn("flag",
        when(col("ratio") < 0.5 || col("ratio") > 2.0, "discontinuity")
          .otherwise("ok"))
      .orderBy("symbol")
  }
}
