package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Spread

/** The spread guard: narrow file scans widen to cluster parallelism;
  * in-memory frames and already-wide inputs pass through untouched —
  * the 100 TB case where round-robin-shuffling the text payload would
  * be the pipeline's biggest exchange for zero gain.
  */
class SpreadSpec extends SparkSpec {

  test("one-file scan widens; in-memory frame passes through") {
    val spark2 = spark
    import spark2.implicits._
    val np = spark.sparkContext.defaultParallelism
    val dir = Files.createTempDirectory("graft-spread").toString
    (0L until 64L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.inputFiles.length == 1)
    assert(Spread.spread(scan).rdd.getNumPartitions == np, "narrow scan must widen")
    // in-memory frame: no file source → returned as-is (same plan object)
    val mem = (0L until 8L).map(i => (i, "t")).toDF("doc_id", "text")
    assert(Spread.spread(mem) eq mem)
    // wide-enough scan: one file per row group ≥ np → untouched
    (0L until 64L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      .repartition(np + 1).write.mode("overwrite").parquet(dir + "_wide")
    val wide = spark.read.parquet(dir + "_wide")
    assert(wide.inputFiles.length >= np)
    assert(Spread.spread(wide) eq wide)
  }
}
