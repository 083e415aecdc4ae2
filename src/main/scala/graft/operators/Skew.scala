package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback for joins whose
  * key distribution is too pathological for AQE's skew-join splitting
  * (SURVEY.md §4; the 6-symbol stocks table is a stand-in for hot keys).
  *
  * Technique: explode the build side B times (one replica per salt
  * bucket), salt the probe side with a deterministic per-row bucket in
  * [0, B), and join on (key, salt). Each hot key's probe rows spread
  * over B tasks instead of one. The salt is a hash of stable row
  * identity — deterministic, so results are reproducible.
  *
  * Cost: build side inflates ×B (fine for dimension-sized build sides —
  * if the build side is huge, salting is the wrong tool; repartition or
  * AQE handles it). Probe side gains one narrow projection.
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `key`, salted into `buckets` buckets.
    * `probeSaltExpr` must be a deterministic expression over probe
    * columns (e.g. `pmod(hash(col("date")), lit(buckets))`).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltExpr: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(probeSaltExpr, lit(buckets)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnosis — the pre-flight a 100 TB job runs BEFORE
    * choosing [[saltedJoin]]'s bucket count: per-key row counts, the
    * count distribution's p50/p99 read from a log-bucketed register
    * file (the [[Sketch.logHistQuantiles]] construction — a bounded
    * cumulative walk, never a window over the key frame), and for the
    * top-k heavy keys a suggested salt = ⌈cnt / p50⌉ that splits each
    * hot key into median-sized slices.
    *
    * All quantile estimates are bucket lower bounds (exact integers,
    * ≤ 2⁻⁴ relative error); the salt division is exact integer math.
    * Shape: one groupBy(key) with map-side combine, a ≤ 64·16-cell
    * register aggregate, and a top-k via orderBy+limit. Nothing
    * scales past the key-count frame, and that frame is touched only
    * by hash aggregation — no global sort, no window.
    */
  def keySkewStats(events: DataFrame, k: Int = 5, subBits: Int = 4): DataFrame = {
    val kc = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
    // registers carry per-bucket row mass too, so the totals read from
    // the register FILE; the kc aggregation behind hist/top is deduped
    // by ReuseExchange within the single job (no barrier needed)
    val hist = kc
      .withColumn("sh",
        greatest(length(expr("bin(cnt)")).cast("int") - 1 - subBits, lit(0)))
      .withColumn("lo", expr("shiftleft(shiftright(cnt, sh), sh)"))
      .groupBy("lo").agg(count(lit(1)).as("nk"), sum("cnt").as("bucket_rows"))
    val tot = hist.agg(sum("nk").as("n_keys"), sum("bucket_rows").as("n_rows"))
    val wcum = org.apache.spark.sql.expressions.Window.orderBy("lo") // register file only
    val cum = hist.withColumn("cum", sum("nk").over(wcum))
      .crossJoin(broadcast(tot))
    def qEst(num: Int, den: Int) = cum
      .filter(col("cum") >= expr(s"($num * n_keys + ${den - 1}) div $den") &&
        col("cum") - col("nk") < expr(s"($num * n_keys + ${den - 1}) div $den"))
      .select(col("lo"))
    val p50 = qEst(1, 2).select(col("lo").as("p50_cnt"))
    val p99 = qEst(99, 100).select(col("lo").as("p99_cnt"))
    val top = kc.orderBy(col("cnt").desc, col("user_id")).limit(k)
    top
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(p50))
      .crossJoin(broadcast(p99))
      .withColumn("share", round(col("cnt") / col("n_rows"), 6))
      .withColumn("mean_cnt", round(col("n_rows") / col("n_keys"), 2))
      .withColumn("suggested_salt",
        expr("(cnt + p50_cnt - 1) div p50_cnt"))
      .select("user_id", "cnt", "share", "n_keys", "mean_cnt",
        "p50_cnt", "p99_cnt", "suggested_salt")
      .orderBy(col("cnt").desc, col("user_id"))
  }
}
