package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Quality, Sink}

/** Parquet sink layout: partition pruning, sorted files, snapshot
  * upsert round-trips.
  */
class SinkSpec extends SparkSpec {

  test("writeStocks partitions by symbol and prunes on read") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/stocks"
    val df = bars("AA", Seq(10.0, 11.0, 12.0))
      .unionByName(bars("BB", Seq(20.0, 21.0)))
    Sink.writeStocks(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5)
    val pruned = back.filter(col("symbol") === "AA")
    assert(pruned.count() == 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("symbol"), s"expected partition pruning in:\n$plan")
  }

  test("upsertInto: create, then last-wins merge, idempotent") {
    val dir = Files.createTempDirectory("graft-upsert").toString + "/stocks"
    val v1 = bars("AA", Seq(10.0, 11.0))
    Sink.upsertInto(spark, dir, v1)
    assert(spark.read.parquet(dir).count() == 2)
    // overlapping update: second day revised + a third day appended
    val v2 = bars("AA", Seq(10.0, 99.0, 12.0))
      .filter(col("date") >= lit("2020-01-02").cast("date"))
    Sink.upsertInto(spark, dir, v2)
    val after = spark.read.parquet(dir).orderBy("date").collect()
    assert(after.length == 3)
    assert(after(1).getAs[Double]("close") == 99.0)
    // idempotent re-apply
    Sink.upsertInto(spark, dir, v2)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("CSV export round-trips (S7: the reference's S3/CSV export path)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/export"
    val df = bars("AA", Seq(10.0, 11.5, 12.25))
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(df.schema).csv(dir)
    assert(back.count() == 3)
    assert(back.orderBy("date").select("close").collect().map(_.getDouble(0)).toSeq ==
      Seq(10.0, 11.5, 12.25))
  }

  test("bucketed stocks table: symbol window and join plan with NO exchange") {
    import org.apache.spark.sql.expressions.Window
    val df = bars("AA", Seq(10.0, 11.0, 12.0))
      .unionByName(bars("BB", Seq(20.0, 21.0)))
    Sink.writeStocksBucketed(df, "graft_bucketed_spec", buckets = 4)
    val back = spark.table("graft_bucketed_spec")

    val w = Window.partitionBy("symbol").orderBy("date").rowsBetween(-1, 0)
    val windowed = back.withColumn("m", avg("close").over(w))
    windowed.write.format("noop").mode("overwrite").save()
    val windowPlan = windowed.queryExecution.executedPlan.toString
    assert(!windowPlan.contains("Exchange"), windowPlan)
    assert(windowed.count() == 5)

    // symbol-keyed aggregate: partial+final collapse onto the bucket
    // distribution, no shuffle
    val agg = back.groupBy("symbol").agg(max("close"))
    agg.write.format("noop").mode("overwrite").save()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), aggPlan)

    spark.sql("DROP TABLE IF EXISTS graft_bucketed_spec")
  }

  test("writeRejects lands the quality side-output") {
    val dir = Files.createTempDirectory("graft-rej").toString + "/rejects"
    val bad = bars("AA", Seq(10.0)).withColumn("close", lit(-1.0))
    Sink.writeRejects(Quality.rejects(bad), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1)
    assert(back.head.getAs[String]("errors").contains("invalid_close"))
  }
}
