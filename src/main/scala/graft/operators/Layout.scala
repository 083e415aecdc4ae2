package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering
  * trick behind Delta/Iceberg OPTIMIZE ZORDER: interleaving the bits of
  * two key columns gives a 1-D sort key whose ranges are 2-D tiles, so
  * range-partitioned files stay narrow in BOTH dimensions and min/max
  * file statistics prune scans on either predicate. Everything here is
  * exact integer bit arithmetic composed from codegen'd primitives —
  * no UDF, no float.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of x (even positions) and
    * y (odd positions). Inputs must be non-negative; callers mask to
    * `bits` first.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The production layout operator: range-repartition on the z-value
    * (each output partition is a z-range = a bounded 2-D tile), sorted
    * within partitions so parquet row groups carry tight min/max on
    * both original columns.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, partitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(x.bitwiseAND(lit((1L << bits) - 1)),
      y.bitwiseAND(lit((1L << bits) - 1)), bits)
    df.withColumn("z", z)
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
  }
}
