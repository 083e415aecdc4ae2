package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-chunked window evaluation with boundary carry-in — the scale
  * path past the "window parallelism = key count" ceiling.
  *
  * A `PARTITION BY symbol ORDER BY date` window runs one task per
  * symbol: with 6 symbols, 6 tasks, forever, no matter how many
  * executors exist — and one hot key is one straggler task at 100 TB.
  * For a BOUNDED trailing frame (`ROWS BETWEEN n-1 PRECEDING AND
  * CURRENT ROW`), a row's result depends on at most the n-1 rows before
  * it, so the timeline can be cut into chunks (here: calendar years)
  * and evaluated as `PARTITION BY (symbol, chunk)` — parallelism
  * becomes keys × chunks — provided each chunk also sees the previous
  * chunk's last n-1 rows. Those carry-in rows are tagged, unioned in,
  * included in frames, and dropped from the output.
  *
  * Equality with the single-partition plan is exact, not approximate:
  * every output row sees the same frame rows in the same (time) order,
  * so the IEEE fold is bit-identical (WindowChunksSpec proves it on the
  * derived stocks table). Precondition: every chunk holds ≥ n-1 rows,
  * so a frame never reaches two chunks back — choose a chunk width ≫ n
  * rows (trading years ≈ 250 rows vs n ≤ 200 here). The carry
  * construction is itself a per-(key, chunk) window (row_number from
  * each chunk's end), so the whole plan stays at keys × chunks
  * parallelism — no single-key stage anywhere.
  */
object WindowChunks {

  /** SMA (min_periods=1) and gated MA over (key, time) with
    * year-chunked parallelism — chunked twins of [[Indicators.sma]] and
    * [[Indicators.maGated]], output columns `sma` / `ma_gated`.
    */
  def chunkedSmaGated(df: DataFrame, key: String, time: String,
      in: String, smaN: Int, gatedN: Int): DataFrame = {
    val chunkOf = year(col(time))
    val maxN = math.max(smaN, gatedN)
    // tail n-1 rows of each (key, chunk), re-tagged to feed the next chunk
    val tailRank = Window.partitionBy(col(key), chunkOf).orderBy(col(time).desc)
    val carries = df
      .withColumn("__rn", row_number().over(tailRank))
      .filter(col("__rn") < maxN)
      .drop("__rn")
      .withColumn("__chunk", chunkOf + 1)
      .withColumn("__carry", lit(true))
    val own = df.withColumn("__chunk", chunkOf).withColumn("__carry", lit(false))
    val w = Window.partitionBy(col(key), col("__chunk")).orderBy(col(time))
    def frame(n: Int) = w.rowsBetween(-(n - 1), 0)
    own.unionByName(carries)
      .withColumn("sma", avg(col(in)).over(frame(smaN)))
      .withColumn("ma_gated",
        when(count(col(in)).over(frame(gatedN)) === gatedN,
          avg(col(in)).over(frame(gatedN))))
      .filter(!col("__carry")).drop("__chunk", "__carry")
  }
}
