package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import graft.operators.{EventsOps, Resample}

/** Goldens for weekly resampling, calendar forward-fill, funnel
  * ordering semantics, and cohort retention.
  */
class ResampleFunnelSpec extends SparkSpec {

  private def ev(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.zipWithIndex.map { case ((uid, ts, et), i) =>
      (i.toLong, Timestamp.valueOf(ts), uid, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("monthly bars: calendar months, exact volume sums, MoM return") {
    // 35 consecutive days from 2020-01-01: 31 in Jan, 4 in Feb
    val r = Resample.monthly(bars("A", (1 to 35).map(_.toDouble)))
      .collect()
    assert(r.length == 2)
    val jan = r(0); val feb = r(1)
    assert(jan.getAs[java.sql.Date]("month").toString == "2020-01-01")
    assert(jan.getAs[Long]("n_days") == 31L && feb.getAs[Long]("n_days") == 4L)
    assert(jan.getAs[Double]("open") == 0.5 && jan.getAs[Double]("close") == 31.0)
    assert(feb.getAs[Double]("open") == 31.5 && feb.getAs[Double]("close") == 35.0)
    assert(jan.getAs[Long]("volume") == (100L to 130L).sum)
    assert(feb.getAs[Long]("volume") == (131L to 134L).sum)
    assert(jan.isNullAt(jan.fieldIndex("mom_return")))
    assert(feb.getAs[Double]("mom_return") == 12.9032) // (35/31-1)*100
  }

  test("weekly bars: ISO Monday weeks, first open / last close selection") {
    // 2020-01-01 is a Wednesday → week of Mon 2019-12-30; the 6th
    // close lands in the next week (Mon 2020-01-06)
    val r = Resample.weekly(bars("A", Seq(10.0, 11.0, 9.0, 12.0, 13.0, 14.0)))
      .collect()
    assert(r.length == 2)
    val w1 = r(0)
    assert(w1.getAs[Date]("week").toString == "2019-12-30")
    assert(w1.getAs[Double]("open") == 9.5) // open = close - 0.5 of day 1
    assert(w1.getAs[Double]("close") == 13.0) // last close of the week (Sun 01-05)
    assert(w1.getAs[Double]("high") == 14.0) // max(high) = 13 + 1
    assert(w1.getAs[Long]("n_days") == 5L)
    assert(r(1).getAs[Date]("week").toString == "2020-01-06")
    assert(r(1).getAs[Long]("n_days") == 1L)
  }

  test("ffillCalendar fills gaps from the last close and flags them") {
    val withGap = bars("A", Seq(10.0, 11.0, 12.0, 13.0))
      .filter(org.apache.spark.sql.functions.col("close") =!= 12.0)
    val r = Resample.ffillCalendar(withGap).collect()
    assert(r.length == 4) // full calendar 01-01..01-04 despite the hole
    assert(r.map(_.getAs[Double]("close_ffill")).toSeq == Seq(10.0, 11.0, 11.0, 13.0))
    assert(r.map(_.getAs[Boolean]("is_gap")).toSeq == Seq(false, false, true, false))
  }

  test("funnel counts only stage events at-or-after the previous stage") {
    val d = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      (2L, "2024-01-01 11:00:00", "view"),
      (2L, "2024-01-01 11:30:00", "purchase"), // no click → can't convert
      (3L, "2024-01-01 12:00:00", "click"), // never viewed → not in funnel
      (4L, "2024-01-01 13:05:00", "click"), // click BEFORE view → doesn't count
      (4L, "2024-01-01 13:10:00", "view"))
    val r = EventsOps.funnel(d).collect()
    assert(r.map(x => (x.getAs[Int]("stage"), x.getAs[Long]("n_users"))).toSeq ==
      Seq((1, 3L), (2, 1L), (3, 1L)))
    assert(r(0).isNullAt(r(0).fieldIndex("conv_from_prev")))
    assert(r(1).getAs[Double]("conv_from_prev") == 0.3333)
    assert(r(2).getAs[Double]("conv_from_first") == 0.3333)
  }

  test("retention cells count distinct active users per day offset") {
    val d = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 15:00:00", "click"), // same day: still one active day
      (1L, "2024-01-03 10:00:00", "view"), // offset 2
      (2L, "2024-01-01 10:00:00", "view"), // same cohort, only day 0
      (3L, "2024-01-02 10:00:00", "view")) // later cohort
    val r = EventsOps.retention(d).collect()
      .map(x => (x.getAs[Date]("cohort_day").toString, x.getAs[Long]("day_offset")) ->
        (x.getAs[Long]("n_users"), x.getAs[Double]("retention"))).toMap
    assert(r == Map(
      ("2024-01-01", 0L) -> (2L, 1.0),
      ("2024-01-01", 2L) -> (1L, 0.5),
      ("2024-01-02", 0L) -> (1L, 1.0)))
  }

  test("DAU/WAU: trailing-7-day distinct users via contribution explode") {
    val d = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 11:00:00", "view"),
      (2L, "2024-01-04 11:00:00", "view"), // day 3: dau 1, wau 2 (user 1 still in window)
      (1L, "2024-01-09 10:00:00", "view")) // day 8: user 2's day-3 activity still in window
    val r = EventsOps.activeUsers(d).collect()
      .map(x => x.getAs[java.sql.Date]("day").toString ->
        (x.getAs[Long]("dau"), x.getAs[Long]("wau"), x.getAs[Double]("stickiness")))
    assert(r.toSeq == Seq(
      "2024-01-01" -> (2L, 2L, 1.0),
      "2024-01-04" -> (1L, 2L, 0.5),
      "2024-01-09" -> (1L, 2L, 0.5)))
  }

  test("open-order sweep line: pre-aggregated deltas, exact running total") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-backlog").toString
    // orders 1:[d1,d3] 2:[d1,d2] 3:[d2,d4] → open: d1=2, d2=2, d3=1, d4=0
    Seq((1L, "1995-01-01"), (2L, "1995-01-01"), (3L, "1995-01-02"))
      .toDF("o_orderkey", "ods")
      .selectExpr("o_orderkey", "CAST(ods AS TIMESTAMP) AS o_orderdate")
      .write.parquet(dir + "/orders.parquet")
    Seq((1L, "1995-01-03"), (2L, "1995-01-02"), (3L, "1995-01-04"), (3L, "1995-01-02"))
      .toDF("l_orderkey", "lds")
      .selectExpr("l_orderkey", "CAST(lds AS TIMESTAMP) AS l_shipdate")
      .write.parquet(dir + "/lineitem.parquet")
    val r = graft.operators.Relational.openOrdersOverTime(spark, dir).collect()
      .map(x => x.getAs[java.sql.Date]("date").toString -> x.getAs[Long]("open_orders"))
    assert(r.toSeq == Seq(
      "1995-01-01" -> 2L, "1995-01-02" -> 2L, "1995-01-03" -> 1L, "1995-01-04" -> 0L))
  }

  test("promo revenue share: DECIMAL sums per ship month, share of promo parts") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-promo").toString
    Seq((1L, "PROMO"), (2L, "ECONOMY")).toDF("p_partkey", "p_type")
      .write.parquet(dir + "/part.parquet")
    // Jan: promo 100·(1−0.1)=90, other 200·(1−0.25)=150 → 37.5%
    // Feb: only the non-promo part ships → 0%
    Seq(
      (1L, 100.0, 0.10, "1995-01-05"),
      (2L, 200.0, 0.25, "1995-01-20"),
      (2L, 50.0, 0.00, "1995-02-01"))
      .toDF("l_partkey", "l_extendedprice", "l_discount", "lds")
      .selectExpr("l_partkey", "l_extendedprice", "l_discount",
        "CAST(lds AS TIMESTAMP) AS l_shipdate")
      .write.parquet(dir + "/lineitem.parquet")
    val r = graft.operators.Relational.promoRevenueShare(spark, dir).collect()
      .map(x => x.getAs[String]("ship_month") ->
        (x.getAs[Double]("promo_revenue"), x.getAs[Double]("total_revenue"),
          x.getAs[Double]("promo_share_pct")))
    assert(r.toSeq == Seq(
      "1995-01" -> (90.0, 240.0, 37.5),
      "1995-02" -> (0.0, 50.0, 0.0)))
  }

  test("Q13 custdist includes the zero-order bucket via the left outer join") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q13").toString
    Seq((1L, 50.0, 0L), (2L, 60.0, 0L), (3L, 70.0, 0L))
      .toDF("c_custkey", "c_acctbal", "c_nationkey").write.parquet(dir + "/customer.parquet")
    // cust 1 has two orders, cust 2 one, cust 3 none
    Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(dir + "/orders.parquet")
    val r = graft.operators.Relational.customerOrderDistribution(spark, dir).collect()
      .map(x => x.getAs[Long]("c_count") -> x.getAs[Long]("custdist"))
    // equal custdist ties order by c_count desc
    assert(r.toSeq == Seq(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("Q22 idle-rich: above-mean balance, no recent order, negative bal excluded from mean") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q22").toString
    // positive balances 100/300/200 → mean 200; strict > keeps only cust 2;
    // the -50 row must not drag the mean down
    Seq((1L, 100.0, 0L), (2L, 300.0, 0L), (3L, -50.0, 1L), (4L, 200.0, 1L))
      .toDF("c_custkey", "c_acctbal", "c_nationkey").write.parquet(dir + "/customer.parquet")
    // max day 2001-01-01; cust 2's only order is >365d older → idle
    Seq((10L, 1L, "2001-01-01"), (11L, 2L, "1999-06-01"))
      .toDF("o_orderkey", "o_custkey", "ods")
      .selectExpr("o_orderkey", "o_custkey", "CAST(ods AS TIMESTAMP) AS o_orderdate")
      .write.parquet(dir + "/orders.parquet")
    Seq((0L, "ALPHA"), (1L, "BETA")).toDF("n_nationkey", "n_name")
      .write.parquet(dir + "/nation.parquet")
    val r = graft.operators.Relational.idleRichCustomers(spark, dir).collect()
      .map(x => (x.getAs[String]("n_name"), x.getAs[Long]("numcust"), x.getAs[Double]("totacctbal")))
    assert(r.toSeq == Seq(("ALPHA", 1L, 300.0)))
  }

  test("Q18 large-volume orders: decimal quantity sum gates strictly above the threshold") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q18").toString
    // order 10 sums to 7 (> 5), order 11 to exactly 5 (excluded: strict >)
    Seq((10L, 3.0), (10L, 4.0), (11L, 5.0)).toDF("l_orderkey", "l_quantity")
      .write.parquet(dir + "/lineitem.parquet")
    Seq((10L, 1L, 500.0, "1995-03-01"), (11L, 1L, 900.0, "1995-04-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "ods")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice", "CAST(ods AS TIMESTAMP) AS o_orderdate")
      .write.parquet(dir + "/orders.parquet")
    Seq((1L, "Customer#1")).toDF("c_custkey", "c_name")
      .write.parquet(dir + "/customer.parquet")
    val r = graft.operators.Relational.largeVolumeOrders(spark, dir, minQty = 5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("o_orderkey") == 10L)
    assert(r(0).getAs[String]("c_name") == "Customer#1")
    assert(r(0).getAs[Double]("sum_qty") == 7.0)
  }
}
