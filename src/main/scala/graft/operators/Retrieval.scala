package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the step that combines a lexical ranking
  * (BM25) with a semantic one (embedding cosine) into a single list,
  * the standard shape of every modern RAG / data-curation retrieval
  * stack.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    * score(id) = Σ_lists 1/(c + rank_list(id)), summed over the lists
    * the id appears in. Rank-based, so the two input scores never need
    * calibrating against each other — the property that makes RRF the
    * default fusion baseline.
    *
    * Determinism: each reciprocal is a 8dp-rounded DECIMAL carrier and
    * the fused ordering runs on the exact DECIMAL sum with an id
    * tiebreak — ranking never touches a raw computed float (the BM25
    * pattern). Inputs are (id, rnk) frames, k-bounded by their
    * producers; everything here is top-k-sized.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int = 10,
      c: Int = 60): DataFrame = {
    val a = lex.select(col("id"), col("rnk").as("lex_rnk"))
    val b = sem.select(col("id"), col("rnk").as("sem_rnk"))
    def recip(r: org.apache.spark.sql.Column) =
      coalesce(round(lit(1.0) / (lit(c) + r), 8).cast("decimal(12,8)"),
        lit(0.0).cast("decimal(12,8)"))
    val fused = a.join(b, Seq("id"), "full_outer")
      .withColumn("rrf", recip(col("lex_rnk")) + recip(col("sem_rnk")))
    // the fused frame is ≤ |lex| + |sem| rows (top-k-bounded inputs):
    // the rank window runs over a candidate list, never the corpus
    val w = Window.orderBy(desc("rrf"), col("id"))
    fused.withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= k)
      .select(col("rrf_rank"), col("id"), col("lex_rnk"), col("sem_rnk"),
        col("rrf").cast("double").as("rrf_score"))
      .orderBy("rrf_rank")
  }

  /** Cosine ranking of the corpus against ONE stored query vector —
    * the semantic side of the hybrid: top-k by rounded cosine
    * (4dp, the embedTopk carrier) with vec_id tiebreak, as a
    * (id, rnk) frame ready for [[rrfFuse]].
    */
  /** IVF-backed semantic side — [[cosineRankForQuery]]'s 100 TB path:
    * candidates come from the query's `nprobe` nearest trained cells
    * (the session-cached quantizer — no retrain per query) instead of
    * an exact corpus scan, so serve cost is nprobe/cells of the corpus
    * per query. The exact scan remains the recall ceiling
    * (RetrievalSpec gates the fused overlap against it). Query = the
    * stored vector with vec_id 0, the single-stored-query convention
    * the fixture uses.
    */
  def cosineRankForQueryIvf(emb: DataFrame, k: Int = 20, cells: Int = 8,
      iters: Int = 2, nprobe: Int = 2,
      corpusKey: Option[String] = None): DataFrame =
    Similarity.ivfMultiProbeTopK(emb, nQueries = 1, k = k, cells = cells,
        iters = iters, nprobe = nprobe, corpusKey = corpusKey)
      .select(col("vec_id").as("id"), col("rnk"), col("cos"))

  def cosineRankForQuery(emb: DataFrame, queryVecId: Long,
      k: Int = 20): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    val scored = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos", Similarity.cosine(col("qe"), col("embedding")))
      .orderBy(desc("cos"), col("vec_id")).limit(k)
    scored
      .withColumn("rnk",
        row_number().over(Window.orderBy(desc("cos"), col("vec_id"))))
      .select(col("vec_id").as("id"), col("rnk"), col("cos"))
  }
}
