package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence over order lines: which part pairs ship
  * together, with support and lift. The pair generator is a self-join
  * keyed on the order — quadratic only in basket size (TPC-H baskets
  * are ≤ 7 lines; a real catalog's are similarly tiny), so the join
  * output is O(orders × basket²), linear in practice. `total` is one
  * driver-side scalar (the [[TextOps.tfidfTopTerms]] precedent); the
  * top-k is `ORDER BY count LIMIT k` — Spark's TakeOrderedAndProject,
  * a distributed partial top-k, never a single-partition window.
  */
object Basket {

  def pairCounts(lineitem: DataFrame, k: Int = 20): DataFrame = {
    // the incidence frame feeds BOTH pair-join sides, the part counts,
    // and the order total — materialize the distinct once or each use
    // re-runs the scan+shuffle (measured 12 s → 3 s at sf0.1/local[32])
    val items = graft.CheckpointPool.cached("basket-items")(
      lineitem
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .distinct())
    val totalOrders = items.select("okey").distinct().count()
    val nPart = items.groupBy("part").agg(count(lit(1)).as("n_part"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("part1"), col("b.part").as("part2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(nPart.select(col("part").as("part1"), col("n_part").as("n1")), "part1")
      .join(nPart.select(col("part").as("part2"), col("n_part").as("n2")), "part2")
      .withColumn("support", round(col("n_both") / lit(totalOrders.toDouble), 6))
      .withColumn("lift",
        round(col("n_both") * lit(totalOrders.toDouble) / (col("n1") * col("n2")), 4))
      .select("part1", "part2", "n_both", "n1", "n2", "support", "lift")
      .orderBy(desc("n_both"), col("part1"), col("part2"))
      .limit(k)
  }
}
