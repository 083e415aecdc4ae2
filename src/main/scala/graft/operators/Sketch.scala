package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for corpus statistics. At corpus
  * scale, "how many distinct n-grams / tokens / urls per source" is a
  * sketch question — the exact answer needs a full distinct shuffle of
  * the gram stream, while a bottom-k (KMV) sketch ships k 64-bit values
  * per group. Everything here is hash-deterministic (md5 polynomial —
  * the [[Dedup]]/[[Sampling]] construction): the same corpus gives the
  * same sketch on any engine, any partitioning, any retry — which is
  * what makes the estimate ORACLE-CHECKABLE, unlike RNG-seeded or
  * engine-native sketches (HLL implementations differ per engine).
  */
object Sketch {

  /** 56-bit uniform hash of a string: the first 14 hex digits of its
    * md5, decoded to nibbles and assembled base-16 — EXACTLY the
    * leading 56 bits of the digest, so the value is uniform on
    * [0, 2⁵⁶). (The [[Dedup]] ascii polynomial is NOT usable here: hex
    * chars occupy only 16 ascii codes in [48, 102], so its raw value is
    * lumpy — fine under a modulus, fatal for an order statistic whose
    * estimator assumes uniformity.) All arithmetic is exact BIGINT,
    * mirrored verbatim in the DuckDB oracle.
    */
  private[graft] def rawHash56(s: Column): Column = {
    val m = md5(s)
    def nib(i: Int): Column = {
      val a = ascii(m.substr(i, 1))
      (a - when(a >= 97, 87).otherwise(48)).cast("long")
    }
    (1 to 14).map(i => nib(i) * lit(1L << (4 * (14 - i)))).reduce(_ + _)
  }

  /** Bottom-k (KMV) distinct-count estimate of word n-grams per source,
    * with the exact count alongside as the verification twin.
    *
    * Estimator: with k distinct uniform hashes in [0, 2⁵⁶), the k-th
    * smallest value h_k estimates the density — n̂ = (k−1)·2⁵⁶ / h_k
    * (the classic KMV/bottom-k estimator; ±1/√k relative error). When a
    * source has fewer than k distinct hashes the sketch IS the exact
    * set and n̂ = k_eff.
    *
    * Scale shape: the row_number ≤ k filter is recognized by Spark's
    * WindowGroupLimit rule — each input partition keeps only its local
    * bottom-k per source BEFORE the exchange, so the shuffle carries
    * ≤ k·sources·partitions rows, not the gram stream. The `exact`
    * branch (a full distinct) exists for verification; a 100 TB caller
    * uses [[kmvSketchOnly]].
    */
  def kmvDistinctNgrams(docs: DataFrame, n: Int = 3, k: Int = 128): DataFrame = {
    val sk = kmvSketchOnly(docs, n, k)
    val exact = grams(docs, n).distinct()
      .groupBy("source").agg(count(lit(1)).as("exact_distinct"))
    val twoFiftySix = lit(math.pow(2.0, 56)) // 128⁸, exact as a double
    sk.join(exact, "source")
      .withColumn("est_distinct",
        round(when(col("k_eff") < k, col("k_eff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * twoFiftySix / col("h_k").cast("double")), 2))
      .withColumn("rel_err",
        round((col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"), 4))
      .select("source", "exact_distinct", "k_eff", "h_k", "est_distinct", "rel_err")
      .orderBy("source")
  }

  /** The sketch half of [[kmvDistinctNgrams]]: (source, h_k, k_eff) —
    * the only piece a petabyte corpus computes.
    */
  def kmvSketchOnly(docs: DataFrame, n: Int = 3, k: Int = 128): DataFrame = {
    val hs = grams(docs, n)
      .select(col("source"), rawHash56(col("s")).as("h")).distinct()
    val w = Window.partitionBy("source").orderBy("h")
    hs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("source").agg(max("h").as("h_k"), count(lit(1)).as("k_eff"))
  }

  /** (source, gram) stream — the [[Dedup.shingles]] construction with
    * the grouping column carried.
    */
  private def grams(docs: DataFrame, n: Int): DataFrame = {
    val gramExpr = expr(
      s"""transform(sequence(1, size(w) - ${n - 1}),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")}))""".stripMargin)
    docs.select(col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("source"), explode(gramExpr).as("s"))
  }
}
