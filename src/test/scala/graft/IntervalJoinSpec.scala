package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** The binned interval join must equal the naive range-predicate join
  * for any bin width — binning changes the plan shape (equi-join +
  * filter instead of a per-key cross product), never the result.
  */
class IntervalJoinSpec extends SparkSpec {

  private def t(sec: Long) = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))

  test("joinBinned ≡ naive BETWEEN join across bin widths, boundaries inclusive") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic pseudo-random probe times over 3 keys, plus exact
    // boundary hits (137·k and 2911·j collide at multiples of both)
    val probe = (1 to 400).map(i =>
      (i.toLong, "k" + (i % 3), t(i * 137L % 86400))).toDF("id", "key", "ts")
    val iv = (1 to 30).map(j =>
        (j.toLong, "k" + (j % 3), t(j * 2911L % 80000), t(j * 2911L % 80000 + 3600)))
      .toDF("iid", "ikey", "s", "e")
    val naive = probe.join(iv,
        col("key") === col("ikey") && col("ts").between(col("s"), col("e")))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (width <- Seq(600L, 3600L, 7200L, 100000L)) {
      val binned = IntervalJoin.joinBinned(probe,
          iv.withColumnRenamed("ikey", "key"), Seq("key"), "ts", "s", "e", width)
        .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidth=$width")
    }
    // an exact boundary probe is included (BETWEEN is inclusive)
    val edgeProbe = Seq((999L, "k1", t(2911L)), (998L, "k1", t(2911L + 3600))).toDF("id", "key", "ts")
    val edgeIv = Seq((1L, "k1", t(2911L), t(2911L + 3600))).toDF("iid", "key", "s", "e")
    val hits = IntervalJoin.joinBinned(edgeProbe, edgeIv, Seq("key"), "ts", "s", "e", 600L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(999L, 998L))
  }
}
