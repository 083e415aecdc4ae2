package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned corpus classifiers that train by aggregation — the
  * fastText/CLD-shape language and quality filters every training-data
  * pipeline runs before mixing, reduced to a multinomial Naive Bayes
  * over word unigrams so both engines can replay the math exactly.
  *
  * Training IS a groupBy: class priors are document counts per label,
  * the conditional table is one (label, word) hash aggregate over the
  * exploded corpus — a single token-keyed shuffle, partial-aggregated
  * map-side. The "model" is a DataFrame; applying it is a word-keyed
  * join against the exploded corpus followed by a per-(doc, label)
  * sum. At 100 TB the conditional table is vocab × labels — orders of
  * magnitude below the corpus — so AQE broadcasts it when it fits and
  * falls back to a shuffle join keyed on the same word column when it
  * does not; nothing in the plan depends on which happens.
  *
  * Determinism (the [[TextOps.lmScore]] contract): every log input is
  * a ratio of exact integers, each log term rounds to 6dp and is
  * carried as DECIMAL(18,6), so per-(doc, label) scores are exact,
  * fold-order free, and the argmax (score desc, label asc) is a total
  * order identical in Spark and DuckDB.
  *
  * Reference anchor: the reference's closest surface is the validation
  * battery (fetch_and_store.py:60-160) — rule-based accept/reject;
  * this is the learned generalization the north-star extensions ask
  * for (repo:SURVEY.md §7.4 language ID row).
  */
object Classify {

  private def spread(docs: DataFrame): DataFrame = Spread.spread(docs)

  /** Train a multinomial NB on the corpus' own `lang` labels and score
    * every document: per (doc, label),
    *   score = ln P(label) + Σ_tokens ln P(word | label)
    * with add-one smoothing P(w|l) = (c(w,l)+1) / (t_l + V) over the
    * corpus-wide vocabulary V. Output keeps the declared label beside
    * the prediction and the (best − runner-up) margin — the confidence
    * gate a pipeline thresholds on before trusting the label.
    *
    * Self-training on the labeled corpus is the honest reduction of
    * "apply a pretrained classifier": a deployment trains the counts
    * on a held-out labeled set — same plan, different input.
    */
  def nbLangScores(docs: DataFrame): DataFrame = {
    // ONE corpus explode, collapsed immediately to per-(doc, word)
    // multiplicities: every downstream consumer — the conditional
    // table, the per-(doc, label) score fold, the token counts — is a
    // weighted sum over these counts, and integer/DECIMAL sums are
    // fold-order free, so Σ_tokens lp ≡ Σ_(distinct w) cnt·lp exactly.
    // Before this the corpus was exploded TWICE (train + apply) and
    // every token row crossed the label-scoring shuffle individually;
    // now the explode runs once and the shuffle carries one row per
    // distinct (doc, word) (guide §2.3: aggregate before you shuffle).
    val wc = spread(docs)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "lang", "w")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // Σ distinct (doc, word) — materialized once

    // ---- train: the (label, word) conditional table folds the
    // per-doc multiplicities; class totals and the vocabulary size
    // derive from that model-sized frame, so training touches the
    // corpus exactly once
    val condCounts = wc.groupBy(col("lang").as("clabel"), col("w"))
      .agg(sum("cnt").as("cwl"))
      .localCheckpoint() // vocab × labels — model-sized
    val vocab = condCounts.select("w").distinct().count()
    // nDocs = Σ per-label doc counts (every doc carries exactly one
    // label row in the groupBy), folded in as a label-frame window sum
    // instead of a separate driver-side docs.count() action — one
    // fewer corpus scan per invocation (guide §5: the driver does no
    // data work it doesn't need). nd / sum(nd) divides the same two
    // doubles the old nd / nDocs did, so log_prior is bit-identical.
    val priors = docs.groupBy(col("lang").as("clabel"))
      .agg(count(lit(1)).as("nd"))
      .withColumn("log_prior",
        round(log(col("nd") /
          sum(col("nd")).over(Window.partitionBy())), 6).cast("decimal(18,6)"))
    val classTokens = condCounts.groupBy(col("clabel"))
      .agg(sum("cwl").as("tl"))
    val model = condCounts.join(classTokens, "clabel")
      .withColumn("log_cond",
        round(log((col("cwl") + lit(1)) / (col("tl") + lit(vocab))), 6)
          .cast("decimal(18,6)"))
      .select("clabel", "w", "log_cond")
    // unseen-word mass per class: ln(1 / (t_l + V)) — labels × 1 rows
    val unseen = classTokens
      .withColumn("log_unseen",
        round(log(lit(1.0) / (col("tl") + lit(vocab))), 6).cast("decimal(18,6)"))
      .select("clabel", "log_unseen")

    // ---- apply: distinct (doc, word) rows × labels, sparse-join the
    // conditional table; each row's log-prob is weighted by its token
    // multiplicity (cnt · DECIMAL(18,6) is exact, so the weighted fold
    // equals the per-token fold bit-for-bit). The label fan-out, the
    // unseen-mass lookup, and the prior all ride ONE broadcast label
    // frame (labels × 3 columns) instead of three separate broadcast
    // exchanges; log_prior is constant per label, so carrying it
    // through the group keys leaves the groups unchanged.
    val labelSide = priors.select("clabel", "log_prior").join(unseen, "clabel")
    val scored = wc.select("doc_id", "w", "cnt")
      .crossJoin(broadcast(labelSide))
      .join(model, Seq("clabel", "w"), "left")
      .withColumn("lp", coalesce(col("log_cond"), col("log_unseen")))
      .groupBy("doc_id", "clabel", "log_prior")
      .agg(sum(col("lp") * col("cnt")).as("sum_lp"),
        sum("cnt").as("n_tokens"))
      .withColumn("score", col("log_prior") + col("sum_lp"))

    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("clabel"))
    val ranked = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("runner_up", lead(col("score"), 1).over(w))
      .filter(col("rn") === 1)
    docs.select("doc_id", "lang").join(ranked, "doc_id")
      .select(col("doc_id"), col("lang"), col("clabel").as("nb_pred"),
        col("n_tokens"),
        round(col("score").cast("double"), 4).as("nb_logp"),
        round((col("score") - col("runner_up")).cast("double"), 4).as("margin"),
        (col("clabel") === col("lang")).as("is_match"))
      .orderBy("doc_id")
  }

  /** Per-(declared, predicted) confusion over [[nbLangScores]] with the
    * mean decision margin — the drift diagnostic for the learned
    * classifier (the [[TextOps.langConfusion]] twin). Grouped frame is
    * labels², so the window is bounded-cardinality.
    */
  def nbConfusion(docs: DataFrame, topK: Int = 10): DataFrame = {
    val wl = Window.partitionBy("lang")
    // the matrix surface is labels × labels: cap each true-label row
    // to its topK most-frequent predictions so the output stays
    // bounded when the label set is unbounded (row_frac still uses the
    // FULL row total, so capped rows keep honest shares)
    val wk = Window.partitionBy("lang").orderBy(desc("n"), col("nb_pred"))
    nbLangScores(docs)
      .withColumn("m6", round(col("margin"), 6).cast("decimal(18,6)"))
      .groupBy("lang", "nb_pred")
      .agg(count(lit(1)).as("n"),
        round(sum(col("m6")).cast("double") / count(lit(1)), 4).as("avg_margin"))
      .withColumn("row_frac", round(col("n") / sum("n").over(wl), 4))
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= topK)
      .select("lang", "nb_pred", "n", "row_frac", "avg_margin")
      .orderBy("lang", "nb_pred")
  }
}
