package graft

import org.apache.spark.sql.functions._
import graft.operators.{Basket, Layout}

/** Z-order interleave goldens + range-clustering properties, and the
  * market-basket pair math.
  */
class LayoutBasketSpec extends SparkSpec {

  test("zValue interleaves bits: x even positions, y odd") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
    val zs = df.collect().map(_.getAs[Long]("z")).toSeq
    assert(zs == Seq(1L, 2L, 15L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("z-order is quadrant-monotone: lower quadrants precede upper") {
    val spark2 = spark
    import spark2.implicits._
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
    def quad(qx: Int, qy: Int) = grid.filter(
      col("x") >= qx * 16 && col("x") < (qx + 1) * 16 &&
        col("y") >= qy * 16 && col("y") < (qy + 1) * 16)
    val maxLL = quad(0, 0).agg(max("z")).head().getLong(0)
    val minLR = quad(1, 0).agg(min("z")).head().getLong(0)
    val minUL = quad(0, 1).agg(min("z")).head().getLong(0)
    val minUR = quad(1, 1).agg(min("z")).head().getLong(0)
    assert(maxLL < minLR && maxLL < minUL && math.max(minLR, minUL) < minUR)
  }

  test("clusterByZ range-partitions into contiguous z-intervals, sorted within") {
    val spark2 = spark
    import spark2.implicits._
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val parts = Layout.clusterByZ(grid, col("x"), col("y"), 4)
      .select(spark_partition_id().as("pid"), col("z"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("pid").collect()
    assert(parts.length == 4)
    assert(parts.map(_.getAs[Long]("n")).sum == 1024)
    // contiguous, non-overlapping z ranges
    parts.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
    }
  }

  test("basket pair counts, support and lift on a tiny incidence") {
    val spark2 = spark
    import spark2.implicits._
    // orders: 1 -> {1,2,3}, 2 -> {1,2}, 3 -> {1}; a duplicate line must
    // not double-count the incidence
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (3L, 1L), (1L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val r = Basket.pairCounts(li, 10).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val ab = r(0)
    assert(ab.getAs[Double]("support") == 0.666667) // 2/3
    assert(ab.getAs[Double]("lift") == 1.0) // 2*3/(3*2)
  }
}
