package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch operators over the events table (ts, user_id, event_type,
  * value, props JSON) — the incremental/streaming-adjacent surface
  * (SURVEY.md §2.7). The hourly aggregate is the batch twin of the
  * Structured Streaming pipeline in graft.streaming.EventStream; both
  * share the same windowed semantics so the streaming output can be
  * verified against this query.
  */
object EventsOps {

  /** Exact interpolated percentiles of `value` per event_type — Spark's
    * `percentile` (NOT percentile_approx: the sketch is
    * merge-order-dependent and engine-specific). Exact percentile is
    * selection + one linear interpolation at rank p·(n-1) — the same
    * definition as DuckDB `quantile_cont`/SQL `percentile_cont`, and
    * deterministic: no summation, so no fold-order ulp at all.
    *
    * Scale note: exact percentile materializes each group's values on
    * the executor computing it (here: 5 groups × ~20k doubles). For
    * groups that dwarf executor memory the engine choice is
    * percentile_approx with a fixed accuracy — deliberately NOT used on
    * the oracle surface because two engines' sketches never bit-match.
    */
  def valuePercentiles(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val arr = ps.mkString("array(", ", ", ")")
    val named = ps.zipWithIndex.map { case (p, i) =>
      round(element_at(col("__ps"), i + 1), 6)
        .as("p" + math.round(p * 100).toInt)
    }
    events.groupBy("event_type")
      .agg(expr(s"percentile(value, $arr)").as("__ps"),
        count(col("value")).as("n_values"))
      .select(col("event_type") +: named :+ col("n_values"): _*)
      .orderBy("event_type")
  }

  /** Tumbling-hour aggregate per event_type. Money-style exact sum via
    * decimal; distinct users exact.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Relational.moneySum(col("value")).as("value_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  /** Growth accounting: classify each user's active days as new (first
    * ever), resurrected (returns after > gapDays inactive), or
    * returning, and count per day — the standard DAU decomposition.
    * One distinct on (user, day), one user-keyed lag, one hash
    * aggregate; all-integer logic.
    */
  def growthAccounting(events: DataFrame, gapDays: Int = 7): DataFrame = {
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("prev_day", lag(col("day"), 1).over(wU))
      .withColumn("status",
        when(col("prev_day").isNull, "new")
          .when(datediff(col("day"), col("prev_day")) > gapDays, "resurrected")
          .otherwise("returning"))
      .groupBy("day", "status").agg(count(lit(1)).as("n_users"))
      .orderBy("day", "status")
  }

  /** Top-k event types per hour by count (ties → event_type order) —
    * the trending view over [[hourly]]. The rank window partitions on
    * hour over an already-aggregated frame; all-integer ordering.
    */
  def hourlyTopTypes(events: DataFrame, k: Int = 3): DataFrame = {
    val counts = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hour").orderBy(desc("n"), col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("hour", "rnk", "event_type", "n")
      .orderBy("hour", "rnk")
  }

  /** Sliding event-time windows (2 h window, 1 h slide) per event_type —
    * the overlapping-window shape of Structured Streaming's
    * `window(ts, "2 hours", "1 hour")`, expressed in batch. Spark's
    * implementation assigns each event to window/slide = 2 windows; the
    * oracle mirrors that by unioning the two candidate starts
    * (floor(ts, 1h) and floor(ts, 1h) - 1h). Same exact-decimal sum as
    * [[hourly]]; the window bounds are Spark's struct split into
    * explicit start/end columns so the oracle can name them.
    */
  def slidingValue(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Relational.moneySum(col("value")).as("value_sum"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("value_sum"))
      .orderBy("window_start", "event_type")

  /** Hourly volume anomalies per event_type — the ops/monitoring view:
    * z-score of each hour's exact value sum against the type's
    * distribution over the whole horizon, |z| > zThresh flags.
    *
    * Determinism: hourly sums are exact (decimal); the mean/stddev fold
    * noise (~1e-12 across ~10³ exact values) is absorbed by rounding z
    * to 4 before comparing (the threshold_classify precedent). A
    * zero-variance type yields null z / no flag on both engines (the
    * guard avoids engine-specific x/0 semantics).
    *
    * Shape: the hourly aggregate shuffles on (hour, type) with map-side
    * combine over raw events; the z pass windows over event_type ROWS
    * of hourly totals — hours-per-horizon rows per type, never raw
    * events, so the single-key window is a non-issue at any scale.
    */
  def hourlyAnomaly(events: DataFrame, zThresh: Double = 3.0): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    hourly(events)
      .withColumn("__m", avg(col("value_sum")).over(byType))
      .withColumn("__sd", stddev_samp(col("value_sum")).over(byType))
      .withColumn("z",
        when(col("__sd") > 0,
          round((col("value_sum") - col("__m")) / col("__sd"), 4)))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > zThresh, lit(false)))
      .select("hour", "event_type", "n_events", "value_sum", "z", "is_anomaly")
      .orderBy("hour", "event_type")
  }

  /** CUSUM burst detection over hourly event counts — the sequential
    * changepoint monitor ([[graft.functions.Cusum]]): per type,
    * s_t = max(0, s_{t-1} + (n_t − k)) with reference
    * k = ⌈mean hourly count⌉ + 2 (exact integer division), alarm when
    * s ≥ 3k. A sustained rate shift accumulates across hours and
    * alarms long before any single hour would z-flag — the
    * complementary detector to [[hourlyAnomaly]]'s pointwise z-score.
    *
    * All arithmetic is exact LongType (no rounding contract at all);
    * the per-type k folds into the aggregate's CHILD (x − k with
    * reference 0), so one Cusum instance serves every type. The
    * recursion runs over OBSERVED hours only (absent hours neither
    * accumulate nor reset); a production monitor would calendar-
    * reindex first — the [[Resample.ffillCalendar]] shape. Window
    * input is hours-per-horizon rows per type, never raw events.
    */
  def cusumBursts(events: DataFrame): DataFrame = {
    val hourlyCounts = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val kTab = hourlyCounts.groupBy("event_type")
      .agg(expr("(sum(n_events) + count(*) - 1) div count(*)").as("kbase"))
      .select(col("event_type"), (col("kbase") + lit(2L)).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
    hourlyCounts.join(broadcast(kTab), "event_type")
      .withColumn("cusum",
        graft.functions.Cusum.cusum(col("n_events") - col("k"), 0L).over(w))
      .withColumn("alarm", col("cusum") >= lit(3L) * col("k"))
      .select("event_type", "hour", "n_events", "k", "cusum", "alarm")
      .orderBy("event_type", "hour")
  }

  /** DAU / trailing-7-day WAU / stickiness. WAU is computed EXACTLY by
    * exploding each (user, active-day) into its 7 contribution days and
    * re-distincting — linear in active-user-days × 7, no distinct-over-
    * window (which Spark cannot do) and no self-join. At 100 TB the
    * same query runs on HLL sketches; this is the exact twin that
    * validates them.
    */
  def activeUsers(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("day2", explode(sequence(col("day"), date_add(col("day"), 6))))
      .select(col("user_id"), col("day2").as("day")).distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", round(col("dau") / col("wau"), 4))
      .orderBy("day")
  }

  /** Event-type transition matrix (first-order Markov view of user
    * journeys): consecutive event pairs per user with per-source-type
    * transition probabilities. One user-keyed window + one small hash
    * aggregate; the probability divides two exact longs.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(byFrom), 4))
      .orderBy("from_type", "to_type")
  }

  /** Inter-arrival-time distribution per event type: microsecond gaps
    * between each user's consecutive events (total order (ts,
    * event_id)), attributed to the LATER event's type, summarized as
    * exact-long mean and exact interpolating percentiles in seconds.
    * One user-keyed window pass + one hash aggregate.
    */
  def interArrival(events: DataFrame, scale: Int = 6): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("gap_us", unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        round(sum("gap_us") / count(lit(1)) / lit(1000000.0), scale).as("mean_s"),
        round(expr("percentile(gap_us, 0.5)") / lit(1000000.0), scale).as("p50_s"),
        round(expr("percentile(gap_us, 0.9)") / lit(1000000.0), scale).as("p90_s"))
      .orderBy("event_type")
  }

  /** Ordered funnel analysis over event stages: stage i counts users
    * whose earliest stage-i event occurs at-or-after their
    * funnel-entry time through stage i-1 (the classic
    * first-touch-ordered funnel). Per stage: one filtered aggregate
    * keyed on user_id + one broadcastable join against the previous
    * stage's (user, ts) frame — events shuffle once per stage on
    * user_id, and the final 3-row frame computes conversion ratios in
    * a trivial single-partition window.
    */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    var prev: DataFrame = null
    val counts = stages.zipWithIndex.map { case (stage, i) =>
      val base = events.filter(col("event_type") === stage)
        .select(col("user_id"), col("ts"))
      val reached =
        if (i == 0) base.groupBy("user_id").agg(min("ts").as("t"))
        else base.join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
          .filter(col("ts") >= col("t_prev"))
          .groupBy("user_id").agg(min("ts").as("t"))
      prev = reached
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"), col("n_users"))
    }
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
    counts.reduce(_ unionByName _)
      .withColumn("conv_from_prev",
        round(col("n_users") / lag(col("n_users"), 1).over(w), 4))
      .withColumn("conv_from_first",
        round(col("n_users") / first(col("n_users")).over(
          w.rowsBetween(Long.MinValue, 0)), 4))
      .orderBy("stage")
  }

  /** Cohort retention, long format: cohort = each user's first active
    * day; a (cohort_day, day_offset) cell counts the cohort's users
    * active that many days later, with the retention ratio against the
    * cohort size. Exact integer/date arithmetic throughout — two hash
    * aggregates (user firsts, distinct active days) plus one
    * cohort-keyed join.
    */
  def retention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohortSize = firstDay.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    active.join(firstDay, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .join(cohortSize, "cohort_day")
      .withColumn("retention", round(col("n_users") / col("cohort_size"), 4))
      .select("cohort_day", "day_offset", "n_users", "cohort_size", "retention")
      .orderBy("cohort_day", "day_offset")
  }

  /** JSON property extraction (props = {"k": int}) + per-type stats.
    * regexp-based so the oracle needs no JSON extension.
    */
  def propStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("k_sum"),
        round(avg("k"), 4).as("k_avg"),
        min("k").as("k_min"),
        max("k").as("k_max"))
      .orderBy("event_type")

  /** Sessionization: gap-based sessions per user (30-minute timeout) —
    * the classic incremental/stateful pattern expressed as windows:
    * session start = event whose gap from the previous event exceeds
    * the timeout; session id = running count of session starts.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_start")).over(byUser.rowsBetween(Long.MinValue, 0)))
    withGap.groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        Relational.moneySum(col("value")).as("value_sum"))
      .orderBy("user_id", "session_seq")
  }

  /** Top-k session paths: the first `depth` event types of every
    * session (the [[sessionize]] gap rule) joined into a path string,
    * ranked by session count — the "how do sessions start" view behind
    * funnel design. Ties rank by path text, so the top-k is total-
    * ordered. The path builds from conditional aggregates over the
    * first `depth` ranked rows (no collect_list — its array order is
    * not an engine contract); concat_ws skips the nulls of short
    * sessions in both engines.
    *
    * Shape: the session window is the sessionize shuffle; the path
    * aggregate partial-combines; the final top-k is a count-sized
    * sort + limit.
    */
  def topSessionPaths(events: DataFrame, depth: Int = 3, k: Int = 10,
      gapMinutes: Int = 30): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_start")).over(byUser.rowsBetween(Long.MinValue, 0)))
    val bySess = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    val steps = (1 to depth).map(i =>
      max(when(col("rn") === i, col("event_type"))))
    sess.withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= depth)
      .groupBy("user_id", "session_seq")
      .agg(concat_ws(" > ", steps: _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(k)
  }

  /** Cohort LTV curves: users cohorted by the ISO week of their first
    * event; for each (cohort_week, age_week) cell, the active-user
    * count, the value booked that week, and the running value per
    * cohort member — the lifetime-value curve growth teams overlay per
    * cohort. Value sums accumulate in DECIMAL(18,4) (exact in any fold
    * order) including the running sum, which divides by the cohort size
    * once at the end.
    *
    * Shape: the first-seen aggregate and the cell aggregate both
    * partial-combine map-side; the cumulative window partitions by
    * cohort (cells per cohort = weeks of history — tiny), and the
    * cohort-size join broadcasts (one row per cohort week).
    */
  def cohortLtv(events: DataFrame, scale: Int = 4): DataFrame = {
    val e = events.select(col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("week"), col("value"))
    val firstSeen = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = firstSeen.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_users"))
    val cells = e.join(firstSeen, "user_id")
      .withColumn("age_week",
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("long"))
      .groupBy("cohort_week", "age_week")
      .agg(
        countDistinct("user_id").as("n_active"),
        sum(col("value").cast("decimal(18,4)")).as("v"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_week").orderBy("age_week")
    cells.join(broadcast(sizes), "cohort_week")
      .withColumn("cum_v", sum(col("v")).over(wc))
      .select(
        col("cohort_week"), col("age_week"), col("cohort_users"), col("n_active"),
        col("v").cast("double").as("value_sum"),
        round(col("cum_v").cast("double") / col("cohort_users"), scale)
          .as("ltv_per_user"))
      .orderBy("cohort_week", "age_week")
  }

  /** L-N engagement histogram: over the trailing n-day window ending at
    * the corpus's last event day, count each user's active days, then
    * histogram users by that count — the power-user curve (L28 smile)
    * growth teams read weekly. All-integer logic: a distinct on
    * (user, day) inside the window, two hash aggregates; the window
    * bound broadcasts as a scalar subquery (no driver collect).
    */
  def activityHistogram(events: DataFrame, n: Int = 28): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day"))
    val maxDay = days.agg(max("day").as("max_day"))
    val inWindow = days.join(broadcast(maxDay),
        col("day") > date_sub(col("max_day"), n), "inner")
      .select("user_id", "day").distinct()
    inWindow.groupBy("user_id").agg(count(lit(1)).as("days_active"))
      .groupBy("days_active").agg(count(lit(1)).as("n_users"))
      .orderBy("days_active")
  }
}
