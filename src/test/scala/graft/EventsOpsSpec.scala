package graft

import org.apache.spark.sql.functions._
import graft.operators.EventsOps

/** Exact percentile semantics: rank p·(n-1) with linear interpolation
  * (the quantile_cont definition the DuckDB oracle uses).
  */
class EventsOpsSpec extends SparkSpec {

  test("hourlyTopTypes ranks within each hour with type tiebreak") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      ("view", "2024-01-01 10:05:00"), ("view", "2024-01-01 10:10:00"),
      ("click", "2024-01-01 10:20:00"), ("buy", "2024-01-01 10:21:00"),
      ("view", "2024-01-01 11:00:00"))
      .zipWithIndex.map { case ((et, ts), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(ts), 1L, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventsOps.hourlyTopTypes(rows, k = 2).collect()
      .map(x => (x.getAs[Int]("rnk"), x.getAs[String]("event_type")))
    // hour 10: view (2) then buy/click tie at 1 → 'buy' wins the tiebreak
    assert(r.toSeq == Seq((1, "view"), (2, "buy"), (1, "view")))
  }

  test("interArrival attributes each gap to the later event's type") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:40"), 1L, "view", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventsOps.interArrival(df).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    // user 1: 10s gap → click, 30s gap → view; user 2 has no gap
    assert(r("click").getAs[Long]("n_gaps") == 1L)
    assert(r("click").getAs[Double]("mean_s") == 10.0)
    assert(r("view").getAs[Long]("n_gaps") == 1L)
    assert(r("view").getAs[Double]("p50_s") == 30.0)
  }

  test("valuePercentiles interpolates at rank p·(n-1) and ignores nulls") {
    val spark2 = spark
    import spark2.implicits._
    // values 10,20,30,40 (n=4): p50 → rank 1.5 → 25.0; p90 → rank 2.7
    // → 30 + 0.7·10 = 37.0; a null must not count toward n
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("a", Some(40.0)), ("a", None),
      ("b", Some(5.0)))
      .toDF("event_type", "value")
    val r = EventsOps.valuePercentiles(df, Seq(0.5, 0.9)).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("a").getDouble(1) == 25.0)
    assert(math.abs(r("a").getDouble(2) - 37.0) < 1e-12)
    assert(r("a").getLong(3) == 4L)
    // single value: every percentile is that value
    assert(r("b").getDouble(1) == 5.0 && r("b").getDouble(2) == 5.0)
  }

  test("hourlyAnomaly: spike hour flags, steady hours do not, zero-variance type null") {
    val spark2 = spark
    import spark2.implicits._
    // 11 near-steady hours (1.00..1.10) + one 100.0 spike → spike z ≈ 3.18
    val steady = (0 until 11).map { h =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"), "click", 1.0 + h * 0.01, h.toLong)
    }
    val spike = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "click", 100.0, 99L))
    val flat = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), "flat", 5.0, 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 01:30:00"), "flat", 5.0, 2L))
    val df = (steady ++ spike ++ flat).toDF("ts", "event_type", "value", "user_id")
    val r = EventsOps.hourlyAnomaly(df, 3.0).collect()
    val click = r.filter(_.getString(1) == "click")
    assert(click.length == 12)
    val flagged = click.filter(_.getBoolean(5))
    assert(flagged.length == 1 && flagged.head.getDouble(3) == 100.0)
    // constant sums → sd = 0 → null z, never flagged
    val flatRows = r.filter(_.getString(1) == "flat")
    assert(flatRows.length == 2)
    assert(flatRows.forall(x => x.isNullAt(4) && !x.getBoolean(5)))
  }

  test("growthAccounting classifies new / returning / resurrected days") {
    val spark2 = spark
    import spark2.implicits._
    // user 1: day1 (new), day2 (returning), day12 (gap 10 > 7 → resurrected)
    // user 2: day2 (new); duplicate events on one day collapse to one status
    val df = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 15:00:00"),
      (1L, "2024-01-02 09:00:00"), (1L, "2024-01-12 09:00:00"),
      (2L, "2024-01-02 09:00:00"))
      .map { case (u, ts) => (u, java.sql.Timestamp.valueOf(ts)) }
      .toDF("user_id", "ts")
    val r = EventsOps.growthAccounting(df).collect()
      .map(x => (x.getDate(0).toString, x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      ("2024-01-01", "new") -> 1L,
      ("2024-01-02", "new") -> 1L,
      ("2024-01-02", "returning") -> 1L,
      ("2024-01-12", "resurrected") -> 1L))
  }

  test("slidingValue: every event lands in exactly two 2h/1h windows") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val r = EventsOps.slidingValue(df).collect()
      .map(x => x.getTimestamp(0).toString -> (x.getLong(3), x.getDouble(4))).toMap
    // windows: 09-11 sees the two 10:xx events; 10-12 sees all three;
    // 11-13 sees only the 11:05 event — 3 events x 2 windows = 6 slots
    assert(r("2024-01-01 09:00:00.0") == (2L, 3.0))
    assert(r("2024-01-01 10:00:00.0") == (3L, 7.0))
    assert(r("2024-01-01 11:00:00.0") == (1L, 4.0))
    assert(r.values.map(_._1).sum == 6L)
  }

  test("topSessionPaths: first-3 path per session, counted across users") {
    val spark2 = spark
    import spark2.implicits._
    def e(id: Long, user: Long, t: String, et: String) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-01 $t"), user, et, 1.0, "{}")
    val df = Seq(
      // user 1 session 1: 4 events → path is the first three
      e(0, 1, "10:00:00", "view"), e(1, 1, "10:01:00", "click"),
      e(2, 1, "10:02:00", "buy"), e(3, 1, "10:03:00", "view"),
      // user 1 session 2 (gap > 30 min): 2 events → short path
      e(4, 1, "12:00:00", "view"), e(5, 1, "12:05:00", "click"),
      // user 2: same opening as user 1's session 1
      e(6, 2, "09:00:00", "view"), e(7, 2, "09:01:00", "click"),
      e(8, 2, "09:02:00", "buy"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventsOps.topSessionPaths(df).collect()
      .map(x => x.getAs[String]("path") -> x.getAs[Long]("n_sessions"))
    assert(r.toSeq == Seq("view > click > buy" -> 2L, "view > click" -> 1L))
  }

  test("cohortLtv: weekly cohorts, running value per cohort member") {
    val spark2 = spark
    import spark2.implicits._
    def e(id: Long, user: Long, day: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-$day 10:00:00"), user, "buy", v, "{}")
    // weeks are Mon-anchored: Jan 1 2024 is a Monday; users 1,2 start
    // week 1, user 3 starts week 2; user 1 returns in week 2
    val df = Seq(
      e(0, 1, "02", 10.0), e(1, 2, "03", 30.0),
      e(2, 1, "09", 20.0), e(3, 3, "10", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventsOps.cohortLtv(df).collect()
      .map(x => (x.getAs[java.sql.Date]("cohort_week").toString, x.getAs[Long]("age_week")) ->
        (x.getAs[Long]("cohort_users"), x.getAs[Long]("n_active"),
          x.getAs[Double]("value_sum"), x.getAs[Double]("ltv_per_user")))
    assert(r.toSeq == Seq(
      ("2024-01-01", 0L) -> (2L, 2L, 40.0, 20.0),
      ("2024-01-01", 1L) -> (2L, 1L, 20.0, 30.0),
      ("2024-01-08", 0L) -> (1L, 1L, 40.0, 40.0)))
  }

  test("activityHistogram counts distinct active days in the trailing window only") {
    val spark2 = spark
    import spark2.implicits._
    def e(id: Long, user: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), user, "view", 1.0, "{}")
    // max day = Jan 28; n=3 → window {26,27,28}. user 1 active 3 days
    // (two events on the 28th must count once); user 2 active 1 day;
    // user 3 only outside the window
    val df = Seq(
      e(0, 1, 26), e(1, 1, 27), e(2, 1, 28), e(3, 1, 28),
      e(4, 2, 28), e(5, 3, 20))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventsOps.activityHistogram(df, n = 3).collect()
      .map(x => x.getAs[Long]("days_active") -> x.getAs[Long]("n_users"))
    assert(r.toSeq == Seq(1L -> 1L, 3L -> 1L))
  }
}
