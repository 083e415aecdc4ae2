package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over the documents table — the
  * training-data-pipeline surface (driver north star; SURVEY.md §7.4):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Determinism: every similarity primitive is built from md5 hex
  * strings (identical in Spark and DuckDB) and exact integer set
  * arithmetic; the only floats are single divisions (Jaccard), rounded
  * to 4 on both sides.
  *
  * Scale notes (100 TB): exact dedup is a hash-partition groupBy on the
  * fingerprint — embarrassingly parallel. The pairwise n-gram join is
  * the quadratic baseline and stays for verification only; the scale
  * path is MinHash+LSH, whose cost is rows × seeds for signatures plus
  * a bucket-join whose fan-out is bounded by band-collision rate —
  * near-linear, and the band join key (band index, band value) hash
  * partitions evenly since md5 minima are uniform. SimHash gives a
  * constant-width signature per doc; banding its 16-bit chunks bounds
  * the Hamming search the same way.
  */
object Dedup {

  private val w3 = "w3"

  /** Distinct word-3-gram shingles per doc: (doc_id, s). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val words = split(col("text"), " ")
    val grams = expr(
      s"""transform(sequence(1, size(w) - ${n - 1}),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")}))""".stripMargin)
    docs.select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(grams).as("s"))
      .distinct()
  }

  /** Exact dedup by content hash: keeper = min doc_id per fingerprint. */
  def exact(docs: DataFrame): DataFrame = {
    val byFp = Window.partitionBy("fp")
    docs.withColumn("fp", md5(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(byFp))
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("is_dup", col("doc_id") =!= col("keeper"))
      .select("doc_id", "fp", "keeper", "n_copies", "is_dup")
      .orderBy("doc_id")
  }

  /** Pairwise n-gram Jaccard near-dup pairs (quadratic baseline):
    * join docs on shared shingles, jaccard = |∩| / (|A|+|B|-|∩|).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "na", "nb", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val minhashSeeds = 12
  val minhashBandSize = 3 // 4 bands of 3 → catches jaccard ≳ 0.5 pairs

  /** MinHash signatures: sig_k = min over shingles of md5("k:" ++ s).
    * String-min over uniform md5 hex values is a valid min-hash (any
    * total order works), and is bit-identical across engines.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(shingles(docs))

  private def minhashSignaturesFrom(sh: DataFrame): DataFrame = {
    val aggs = (0 until minhashSeeds).map(k =>
      min(md5(concat(lit(s"$k:"), col("s")))).as(s"h$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs (same band value in any band) verified with
    * exact Jaccard; output = verified near-dup pairs.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // one shingle pass shared by signatures and verification
    val sh = shingles(docs).cache()
    val sig = minhashSignaturesFrom(sh)
    val bands = (0 until minhashSeeds / minhashBandSize).map { b =>
      val cols = (0 until minhashBandSize).map(j => col(s"h${b * minhashBandSize + j}"))
      sig.select(col("doc_id"), lit(b).as("band"), concat(cols: _*).as("bv"))
    }.reduce(_ unionByName _)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact jaccard: shared shingles per pair
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cands
      .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over distinct words, emitted as a 64-char bit
    * string (MSB-first nibble order of the word md5's first 16 hex
    * chars). sum ≥ 0 → '1'.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .withColumn("h", md5(col("word")))
    val bits = words
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("nib", conv(col("h").substr((col("b") / 4).cast("int") + 1, lit(1)), 16, 10).cast("int"))
      .withColumn("bit", expr("shiftright(nib, 3 - (b % 4)) & 1"))
      .withColumn("wt", col("bit") * 2 - 1)
    bits.groupBy("doc_id", "b").agg(sum(col("wt")).as("s"))
      .withColumn("ch", when(col("s") >= 0, "1").otherwise("0"))
      .groupBy("doc_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(b, ch))), x -> x.ch)"), "").as("simhash"))
      .orderBy("doc_id")
  }
}
