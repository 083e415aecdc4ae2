package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Sketch

/** HDR-style log-bucketed quantile histogram: exact regime when buckets
  * are singletons, the 2^-subBits relative error bound, and sum-merge
  * invariance across group splits.
  */
class SketchHistSpec extends SparkSpec {

  private def li(rows: (String, Double)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("l_returnflag", "l_extendedprice")
  }

  test("singleton-bucket regime: estimates are the exact type-1 quantiles") {
    // cents 1..20 all have bit length <= 5 -> sh=0, one value per
    // bucket; ranks ceil(p*20) = 10, 18, 20, 20.
    val d = li((1 to 20).map(i => ("A", i / 100.0)): _*)
    val rows = Sketch.logHistQuantiles(d).collect()
    assert(rows.map(_.getAs[Long]("target_rank")).toSeq == Seq(10L, 18L, 20L, 20L))
    assert(rows.map(_.getAs[Double]("est_price")).toSeq == Seq(0.1, 0.18, 0.2, 0.2))
    assert(rows.forall(_.getAs[Long]("bucket_width_cents") == 1L))
  }

  test("relative error stays under one bucket width on smooth data") {
    // 10k smooth prices -> lg=13, sh=9: bucket width 512 cents over
    // values >= 10000 cents, so est <= true < est*(1+2^-4).
    val d = li((0 until 10000).map(i => ("A", 100.0 + i / 100.0)): _*)
    val rows = Sketch.logHistQuantilesRelErr(d).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err >= 0.0 && err <= 0.0625 + 0.005, s"rel_err $err out of bound")
      assert(r.getAs[Long]("bucket_lo_cents") % r.getAs[Long]("bucket_width_cents") == 0L)
    }
  }

  test("grouped sketch: independent register files per event_type") {
    val spark2 = spark
    import spark2.implicits._
    val ev = ((1 to 20).map(i => ("A", i / 100.0)) ++
        (1 to 10).map(i => ("B", i / 100.0)))
      .toDF("event_type", "value")
    val r = Sketch.logHistQuantilesByGroup(ev).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("target_rank")) ->
        x.getAs[Double]("est_value")).toMap
    // singleton-bucket regime: exact type-1 quantiles per group
    assert(r(("A", 10L)) == 0.10) // p50 of 20
    assert(r(("A", 18L)) == 0.18) // p90
    assert(r(("B", 5L)) == 0.05) // p50 of 10
    assert(r(("B", 9L)) == 0.09) // p90
  }

  test("streamed registers across micro-batches equal the batch histogram") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("hist_stream").toString
    val li = (0 until 500).map(i =>
        (i.toLong, 100.0 + (i * 97 % 4001) / 100.0, Seq("A", "N", "R")(i % 3)))
      .toDF("l_orderkey", "l_extendedprice", "l_returnflag")
    Seq(0, 1, 2).foreach { r =>
      li.filter(col("l_orderkey") % 3 === r)
        .select("l_extendedprice", "l_returnflag")
        .coalesce(1).write.mode("overwrite").parquet(dir + s"/drop=$r")
    }
    val name = graft.streaming.SketchStream.runBounded(
      spark, dir + "/drop=*", "hist_stream_spec")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("lo"), r.getAs[Int]("sh"), r.getAs[Long]("cnt"))
    val streamed = spark.table(name).collect().map(key).toSet
    val batch = graft.operators.Sketch
      .bucketize(graft.operators.Sketch.centsBase(
        li.select("l_extendedprice", "l_returnflag")))
      .groupBy("lo", "sh").agg(count(lit(1)).as("cnt"))
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("per-group streamed registers across micro-batches equal the batch build") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("hist_stream_grp").toString
    val ev = (0 until 600).map(i =>
        (i.toLong, Seq("click", "view", "buy")(i % 3), 10.0 + (i * 53 % 997) / 10.0))
      .toDF("event_id", "event_type", "value")
    Seq(0, 1, 2).foreach { r =>
      ev.filter(col("event_id") % 3 === r)
        .select("event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(dir + s"/drop=$r")
    }
    val name = graft.streaming.SketchStream.runBoundedByType(
      spark, dir + "/drop=*", "hist_stream_grp_spec")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("lo"),
        r.getAs[Int]("sh"), r.getAs[Long]("cnt"))
    val streamed = spark.table(name).collect().map(key).toSet
    val batch = graft.operators.Sketch
      .groupRegisters(ev.select("event_type", "value"))
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // one register file per group, each independent
    assert(streamed.map(_._1) == Set("click", "view", "buy"))
  }

  test("group split does not change the merged sketch (sum-merge invariance)") {
    // Same values, one run all in a single flag, one scattered across
    // three flags: partial sketches merge to the identical register
    // file, so every output row matches.
    val vals = (0 until 3000).map(i => 50.0 + (i * 37 % 997) / 10.0)
    val one = li(vals.map(v => ("A", v)): _*)
    val split = li(vals.zipWithIndex.map { case (v, i) =>
      (Seq("A", "N", "R")(i % 3), v) }: _*)
    val a = Sketch.logHistQuantiles(one).collect().map(_.toSeq)
    val b = Sketch.logHistQuantiles(split).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
