package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: result equivalence with the plain equi-join. */
class SkewSpec extends SparkSpec {

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
