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
}
