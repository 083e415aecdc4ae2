package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: result equivalence with the plain equi-join. */
class SkewSpec extends SparkSpec {

  test("keySkewStats: heavy keys, register-file quantiles, salt = ceil(cnt/p50)") {
    val spark2 = spark
    import spark2.implicits._
    // user 1 → 100 rows, users 2..21 → 4 rows each, user 22 → 1 row:
    // 22 keys, 181 rows. p50 rank (22+1)//2 = 11 → count 4 (singleton
    // bucket); p99 rank 22 → count 100, bucket lo (100>>2)<<2 = 100.
    val ev = (Seq.fill(100)(1L) ++
        (2L to 21L).flatMap(u => Seq.fill(4)(u)) ++ Seq(22L))
      .toDF("user_id")
    val rows = Skew.keySkewStats(ev, k = 5).collect()
    assert(rows.length == 5)
    val top = rows.head
    assert(top.getAs[Long]("user_id") == 1L)
    assert(top.getAs[Long]("cnt") == 100L)
    assert(top.getAs[Long]("p50_cnt") == 4L)
    assert(top.getAs[Long]("p99_cnt") == 100L)
    assert(top.getAs[Long]("suggested_salt") == 25L)
    assert(top.getAs[Double]("mean_cnt") == 8.23)
    assert(rows.tail.map(_.getAs[Long]("user_id")).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(rows.tail.forall(_.getAs[Long]("suggested_salt") == 1L))
  }

  test("saltedJoin ≡ plain join on a hot-key fixture") {
    val spark2 = spark
    import spark2.implicits._
    // hot key: 90 of 100 probe rows share one key
    val probe = (1 to 100).map(i => (if (i <= 90) "HOT" else s"k$i", i))
      .toDF("key", "pv")
    val build = Seq(("HOT", 1.0), ("k91", 2.0), ("k95", 3.0)).toDF("key", "bv")
    val plain = probe.join(build, Seq("key"))
      .select("key", "pv", "bv").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(
        probe, build, "key", pmod(hash(col("pv")), lit(8)), buckets = 8)
      .select("key", "pv", "bv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 92)
  }
}
