package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — match each probe row whose timestamp falls
  * inside [start, end] of an interval row with the same key. Spark has
  * no native interval join: a naive `ON key = key AND ts BETWEEN s AND
  * e` plans the range predicate as a post-filter on the key join, which
  * is fine when keys are selective but degenerates to a per-key cross
  * product when they are not (and to a full BroadcastNestedLoopJoin
  * with no key at all).
  *
  * The scale pattern is BINNING: both sides map time onto fixed-width
  * buckets — an interval explodes into every bucket it overlaps, the
  * probe row computes exactly one — the join runs on (key, bucket)
  * EQUALITY (hash-partitionable, AQE/skew-eligible like any equi-join),
  * and the exact BETWEEN filter removes bin-boundary false positives.
  * Pick `binWidthSec` near the typical interval length: fan-out is
  * ceil(interval/binWidth)+1 rows per interval (O(1) at the right
  * width), and a probe bucket only meets intervals overlapping its own
  * window.
  */
object IntervalJoin {

  private def bucket(c: Column, widthSec: Long): Column =
    floor(unix_micros(c) / lit(widthSec * 1000000L))

  /** Inner interval join: probe rows × containing intervals.
    * `intervals` must carry `keys`, `start`, `end`; `probe` carries
    * `keys` and `time`. Output: all probe columns + all non-key
    * interval columns, one row per (probe row, containing interval).
    */
  def joinBinned(probe: DataFrame, intervals: DataFrame, keys: Seq[String],
      time: String, start: String, end: String,
      binWidthSec: Long): DataFrame = {
    val iv = intervals.withColumn("__b",
      explode(sequence(bucket(col(start), binWidthSec),
        bucket(col(end), binWidthSec))))
    val pr = probe.withColumn("__b", bucket(col(time), binWidthSec))
    pr.join(iv, keys :+ "__b")
      .filter(col(time).between(col(start), col(end)))
      .drop("__b")
  }
}
