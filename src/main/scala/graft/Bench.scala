package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries are materialized through the noop sink —
  * count() would let Catalyst prune every computed column (a window
  * query would degenerate to a row count), noop forces full evaluation
  * of the projected output while writing nothing.
  */
object Bench {
  /** Headline queries: one per operator family, heaviest variants. */
  val headline: Seq[String] = Seq(
    "stocks_derive", "sma", "ma_gated", "bollinger", "rsi", "volatility",
    "ema_macd", "quality_flags", "merge_upsert", "perf_summary",
    "compare_pivot")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (scheduler, parquet reader, codegen) so JVM
    // init is not billed to the first query.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val qs = SparkEntry.queries
    val names = headline.filter(qs.contains) ++
      (if (sys.env.contains("SPARK_GRAFT_BENCH_ALL")) qs.keys.toSeq.sorted.diff(headline) else Nil)
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qj = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
