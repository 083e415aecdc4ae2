package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cusum

/** CUSUM running-window aggregate: exact recursion, reset-at-zero,
  * null handling, and the merge-misuse guard.
  */
class CusumSpec extends SparkSpec {

  test("cusum realizes max(0, s + x - k) in frame order") {
    val spark2 = spark
    import spark2.implicits._
    // x = [5, 5, 9, 9, 5], k = 6 → s = [0, 0, 3, 6, 5]
    val d = Seq(5L, 5L, 9L, 9L, 5L).zipWithIndex
      .map { case (x, t) => ("a", t, x) }.toDF("g", "t", "x")
    val w = Window.partitionBy("g").orderBy("t")
    val s = d.withColumn("s", Cusum.cusum(col("x") - lit(6L), 0L).over(w))
      .orderBy("t").collect().map(_.getAs[Long]("s")).toSeq
    assert(s == Seq(0L, 0L, 3L, 6L, 5L))
  }

  test("nulls neither accumulate nor reset") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(("a", 0, Some(9L)), ("a", 1, None), ("a", 2, Some(9L)))
      .toDF("g", "t", "x")
    val w = Window.partitionBy("g").orderBy("t")
    val s = d.withColumn("s", Cusum.cusum(col("x") - lit(6L), 0L).over(w))
      .orderBy("t").collect().map(_.getAs[Long]("s")).toSeq
    assert(s == Seq(3L, 3L, 6L)) // the null row carries state through
  }

  test("grouping misuse (unordered merge) fails loudly") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(("a", 1L), ("a", 2L)).toDF("g", "x")
    val e = intercept[Exception] {
      d.groupBy("g").agg(Cusum.cusum(col("x"), 0L).as("s")).collect()
    }
    assert(e.getMessage.contains("order-sensitive") ||
      e.getCause != null && e.getCause.getMessage.contains("order-sensitive"))
  }

  test("streaming replay carries per-type state across drops ≡ batch") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 10).flatMap(h => Seq.fill(10)(h)) ++
      (10 until 16).flatMap(h => Seq.fill(40)(h))
    val ev = rows.zipWithIndex.map { case (h, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"),
        1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("cusum_stream").toString
    // hour-aligned cut: the burst run starts mid-stream in drop b
    ev.filter(hour(col("ts")) < 8).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch=a")
    ev.filter(hour(col("ts")) >= 8).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch=b")
    graft.streaming.IndicatorStream.stampDropOrder(dir, Seq("a", "b"))
    val streamed = graft.streaming.CusumStream.runReplay(spark, dir + "/batch=*",
      graft.streaming.CusumStream.calibrateK(ev), "cusum_stream_spec")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.EventsOps.cusumBursts(ev)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("cusumBursts alarms on a sustained shift, not a single spike") {
    val spark2 = spark
    import spark2.implicits._
    // 10 calm hours at 10 events, then 6 hours at 40: k = ceil(21.25)+2
    // = 24 → calm hours keep s = 0; the burst accumulates 16/hour and
    // alarms once s >= 72 (hour 5 of the burst).
    val rows = (0 until 10).flatMap(h => Seq.fill(10)(h)) ++
      (10 until 16).flatMap(h => Seq.fill(40)(h))
    val ev = rows.zipWithIndex.map { case (h, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"),
        1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.EventsOps.cusumBursts(ev).collect()
    assert(r.length == 16)
    assert(r.forall(_.getAs[Long]("k") == 24L))
    val alarms = r.filter(_.getAs[Boolean]("alarm"))
      .map(_.getAs[java.sql.Timestamp]("hour").toString).sorted
    assert(alarms.nonEmpty)
    assert(alarms.head.startsWith("2024-01-01 14")) // 5th burst hour
    val calm = r.take(10)
    assert(calm.forall(_.getAs[Long]("cusum") == 0L))
  }
}
