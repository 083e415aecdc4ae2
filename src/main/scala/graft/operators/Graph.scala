package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists the dedup family emits (Page &
  * Brin 1998 for the rank recursion). Spark-first: each iteration is
  * one co-partitioned join + one hash aggregate — no GraphX, no
  * driver-side adjacency.
  */
object Graph {

  /** PageRank over an undirected pair graph (damping d, uniform
    * teleport), run for a FIXED iteration count so the oracle can
    * unroll the same rounds as chained CTEs.
    *
    * Determinism: ranks live as 12dp-rounded doubles; each iteration's
    * contributions round(rank/deg, 12) are summed as exact
    * DECIMAL(20,12) (order-free), and the new rank is one fixed double
    * expression — teleport + d·Σ — re-rounded. Every engine pair
    * agreeing on iteration k therefore agrees on k+1.
    *
    * Scale: contributions shuffle on dst once per iteration (the
    * classic distributed PageRank shape); the rank frame is
    * localCheckpoint'd every few rounds so lineage stays flat when
    * iterations grow. Node count is one driver scalar, as in the
    * oracle's subquery.
    */
  def pageRank(pairs: DataFrame, iterations: Int = 10,
      damping: Double = 0.85, scale: Int = 12): DataFrame = {
    // materialize the (possibly expensive) pair chain exactly once —
    // degree, the n scalar, the rank seed, and the final join all read
    // these checkpoints instead of replaying the upstream dedup plan
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val edgesDeg = edges.join(deg, "src")
    val n = deg.count()
    val teleport = (1.0 - damping) / n
    var ranks = deg.select(col("src").as("node"),
      round(lit(1.0) / lit(n.toDouble), scale).as("rank"))
    for (i <- 1 to iterations) {
      ranks = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"),
          round(col("rank") / col("deg"), scale).cast("decimal(20,12)").as("c"))
        .groupBy("dst")
        .agg(round(lit(teleport) + lit(damping) * sum("c").cast("double"), scale)
          .as("rank"))
        .select(col("dst").as("node"), col("rank"))
      if (i % 4 == 0) ranks = ranks.localCheckpoint()
    }
    ranks.join(deg, ranks("node") === deg("src"))
      .select(col("node").as("doc_id"), col("deg").as("degree"), col("rank"))
      .orderBy("doc_id")
  }
}
