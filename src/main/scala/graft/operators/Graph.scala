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
    val edges = graft.CheckpointPool.cached("pagerank-edges")(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    val deg = graft.CheckpointPool.cached("pagerank-deg")(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
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

  /** Per-node triangle count and local clustering coefficient over an
    * undirected pair graph — the "how template-y is this doc's
    * neighborhood" diagnostic (a near-dup cluster is a near-clique:
    * clustering ≈ 1; a hub stitching unrelated docs: ≈ 0).
    *
    * Triangle enumeration uses the ordered orientation: pairs arrive
    * as doc_a < doc_b, so a triangle a<b<c is found EXACTLY once by
    * joining (a,b)⋈(b,c) into wedges and closing with (a,c). All-
    * integer logic; the clustering ratio is the only double and rounds
    * once.
    *
    * Scale: two equi-joins on edge keys — the wedge count is
    * Σ_v deg_low(v)², the quantity the low→high orientation minimizes
    * (every vertex forwards only to higher ids, so hub wedges split).
    * With the LSH bucket cap bounding degrees upstream, wedges stay
    * O(edges·cap). Co-partitioned by the join key; no driver state.
    */
  def triangleStats(pairs: DataFrame, scale: Int = 6): DataFrame = {
    val e = graft.CheckpointPool.cached("triangles-edges")(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val closing = e.select(col("a").as("ta"), col("b").as("tc"))
    val tri = wedges.join(closing,
      col("a") === col("ta") && col("c") === col("tc"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("a").as("doc_id"))
      .unionByName(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val t0 = coalesce(col("triangles"), lit(0L))
    val dd = col("degree").cast("double")
    deg.join(perNode, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("degree"), t0.as("triangles"),
        round(when(col("degree") >= 2,
          lit(2.0) * t0.cast("double") / (dd * (dd - lit(1.0))))
          .otherwise(lit(0.0)), scale).as("clustering"))
      .orderBy("doc_id")
  }
}
