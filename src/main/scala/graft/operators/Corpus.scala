package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning: the composition a training-data pipeline
  * actually runs — exact-dup keeper selection ([[Dedup.exact]]),
  * length gate, and the Gopher-style repetition filter
  * ([[TextOps.repetitionStats]]) — collapsed into one keep/drop verdict
  * per document with machine-readable reasons.
  *
  * Shape: three independent per-doc signals (a fingerprint window, two
  * n-gram aggregations) joined on doc_id — each linear, each
  * hash-partitioned, no stage depends on another's completion until the
  * final join, so the whole verdict is three parallel passes over the
  * corpus plus one co-partitioned join.
  */
object Corpus {

  /** Per-source distribution drift via the Population Stability Index
    * over log2 token-length buckets: each source's length distribution
    * against the pooled rest of the corpus,
    * PSI = Σ_b (p_src − p_rest)·ln(p_src/p_rest), Laplace-smoothed so
    * empty buckets stay finite. The monitoring gate a multi-source
    * training pipeline runs per ingest batch — a source whose PSI
    * jumps is shifting shape. Exact integer bucketing
    * (`length(bin(n))−1` = ⌊log2 n⌋), per-term 8dp rounding with a
    * DECIMAL sum (fold-order free), two small hash aggregates over one
    * corpus scan.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val bucketed = docs
      .withColumn("bucket",
        (length(bin(size(split(col("text"), " ")).cast("long"))) - 1).cast("int"))
    val bySrc = bucketed.groupBy("source", "bucket").agg(count(lit(1)).as("c"))
    val byBucket = bucketed.groupBy("bucket").agg(count(lit(1)).as("ct"))
    val srcTotals = bySrc.groupBy("source").agg(sum("c").as("n_src"))
    val total = docs.count()
    // every (source, bucket) cell, zero counts included
    val grid = srcTotals.select("source", "n_src").crossJoin(byBucket)
    val cells = grid.join(bySrc, Seq("source", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val nb = byBucket.count()
    val pa = (col("c") + lit(1)) / (col("n_src") + lit(nb))
    val pb = (col("ct") - col("c") + lit(1)) / (lit(total) - col("n_src") + lit(nb))
    cells
      .withColumn("term", round((pa - pb) * log(pa / pb), 8).cast("decimal(18,8)"))
      .groupBy("source")
      .agg(
        max(col("n_src")).as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy("source")
  }

  /** Gini coefficient of the token distribution across sources — the
    * data-mix inequality number (0 = perfectly balanced mix, →1 = one
    * source dominates). Exact integer rank/sum arithmetic over the
    * ascending-sorted source totals (G = 2Σ i·tᵢ /(nΣt) − (n+1)/n);
    * the single-partition window sees one row per SOURCE.
    */
  def sourceGini(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("t", "source")
    docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source").agg(sum("tokens").as("t"))
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum("t").as("total_tokens"),
        sum(col("i") * col("t")).as("swi"))
      .withColumn("gini", round(
        lit(2.0) * col("swi") / (col("n_sources") * col("total_tokens")) -
          (col("n_sources") + lit(1.0)) / col("n_sources"), 6))
      .select("n_sources", "total_tokens", "gini")
  }

  /** Per-source vocabulary profile: distinct word types, token totals,
    * hapax legomena (types seen once within the source), type-token
    * ratio, and hapax fraction — the lexical-diversity diagnostics that
    * flag templated/machine-generated sources (low TTR, low hapax) vs
    * noisy OCR (hapax-heavy). Two hash aggregates keyed (source, word)
    * then source; the doc counts ride a third tiny aggregate joined on
    * source. All counts exact longs; the two ratios are single rounded
    * divisions.
    */
  def sourceVocabStats(docs: DataFrame): DataFrame = {
    // spread before the explode (one-file scan would serialize it)
    val words = Spread.spread(docs).select(col("source"),
      explode(split(col("text"), " ")).as("word"))
    val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    words.groupBy("source", "word").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(
        count(lit(1)).as("n_types"),
        sum("c").as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .join(nDocs, "source")
      .withColumn("ttr", round(col("n_types") / col("n_tokens"), 6))
      .withColumn("hapax_frac", round(col("hapax") / col("n_types"), 6))
      .select("source", "n_docs", "n_tokens", "n_types", "hapax", "ttr", "hapax_frac")
      .orderBy("source")
  }

  def cleanVerdicts(docs: DataFrame, minWords: Long = 30): DataFrame = {
    val rep = TextOps.repetitionStats(docs)
      .select(col("doc_id"), col("n_words"), col("flag_repetitive"))
    val dup = Dedup.exact(docs).select(col("doc_id"), col("is_dup"))
    docs.select("doc_id")
      .join(dup, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      // the repetition flag only applies at or above the length gate:
      // below it the n-gram shares are dominated by tiny denominators
      // (a 4-word doc's top bigram share is 1/3) and `too_short`
      // already drops the doc — the same length-scoping Gopher's
      // repetition rules use
      // null text yields no word rows → n_words NULL: that is the
      // emptiest possible document, so it drops as too_short (a bare
      // `n_words < minWords` would null out and silently KEEP it)
      .withColumn("reasons", concat_ws(",",
        when(col("is_dup"), lit("exact_dup")),
        when(col("n_words").isNull || col("n_words") < minWords, lit("too_short")),
        when(col("flag_repetitive") && col("n_words") >= minWords,
          lit("repetitive"))))
      .withColumn("keep", col("reasons") === "")
      .select("doc_id", "keep", "reasons")
      .orderBy("doc_id")
  }

  /** The end-to-end training manifest — [[cleanVerdicts]] × the
    * near-dup keeper decision folded into one per-doc include/exclude
    * row with merged reasons: the materialized artifact a training run
    * actually consumes (filter `include`, join back to text, ship).
    * One PK join over two already-linear chains.
    */
  def manifest(docs: DataFrame, pairs: DataFrame,
      minWords: Long = 30): DataFrame = {
    val nd = Dedup.dedupVerdicts(docs, pairs).select("doc_id", "is_keeper")
    cleanVerdicts(docs, minWords)
      .join(nd, "doc_id")
      .withColumn("include", col("keep") && col("is_keeper"))
      .withColumn("manifest_reasons", concat_ws(",",
        when(col("reasons") =!= "", col("reasons")),
        when(!col("is_keeper"), lit("near_dup"))))
      .select("doc_id", "keep", "is_keeper", "include", "manifest_reasons")
      .orderBy("doc_id")
  }

  /** [[manifest]] with the suffix-span scrub chained in — the FULL
    * pipeline artifact a training run consumes: per-doc
    * include/exclude with merged reasons PLUS the scrubbed text and
    * removal counts. Scrubbing is a transform, not an exclusion — a
    * span-scrubbed doc stays includable (unless another rule drops
    * it); `span_scrubbed` is appended to the reasons so the mix owner
    * sees which surviving docs were modified before shipping. One PK
    * join of two already-linear chains; the mined suffix-hit pass is
    * session-cached, shared with the repeats/scrub/rollup consumers.
    */
  def manifestScrubbed(docs: DataFrame, pairs: DataFrame,
      minWords: Long = 30, corpusKey: Option[String] = None): DataFrame = {
    val scrub = Dedup.suffixScrub(docs, 5, 20, corpusKey)
      .select("doc_id", "n_words", "n_removed", "cleaned_text")
    manifest(docs, pairs, minWords)
      .join(scrub, "doc_id")
      .withColumn("manifest_reasons", concat_ws(",",
        when(col("manifest_reasons") =!= "", col("manifest_reasons")),
        when(col("n_removed") > 0, lit("span_scrubbed"))))
      .select("doc_id", "keep", "is_keeper", "include", "manifest_reasons",
        "n_words", "n_removed", "cleaned_text")
      .orderBy("doc_id")
  }

  /** The one-row corpus health report — the number a data-mix owner
    * reads before shipping: include rate, per-reason exclusion
    * counts, and the span-scrub token burden, all derived from ONE
    * pass over [[manifestScrubbed]]'s per-doc artifact (the chains
    * underneath are session-cached and shared with the per-doc
    * queries, so the report costs one extra aggregate, not a
    * re-computation).
    */
  def report(docs: DataFrame, pairs: DataFrame,
      minWords: Long = 30, corpusKey: Option[String] = None): DataFrame = {
    def nReason(tag: String) =
      sum(when(col("manifest_reasons").contains(tag), 1L).otherwise(0L))
    manifestScrubbed(docs, pairs, minWords, corpusKey).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("include"), 1L).otherwise(0L)).as("n_include"),
      round(sum(when(col("include"), 1L).otherwise(0L)) / count(lit(1)), 4)
        .as("include_rate"),
      nReason("exact_dup").as("n_exact_dup"),
      nReason("near_dup").as("n_near_dup"),
      nReason("too_short").as("n_too_short"),
      nReason("repetitive").as("n_repetitive"),
      nReason("span_scrubbed").as("n_span_scrubbed"),
      sum("n_words").as("tokens_total"),
      sum("n_removed").as("tokens_scrubbed"),
      round(sum("n_removed") / sum("n_words"), 4).as("scrub_rate"))
  }

  /** The staged curation FUNNEL — the manifest's per-reason counts
    * re-expressed as a sequential pipeline with FIRST-DROP attribution:
    * each document is charged to the first stage that drops it
    * (too_short → repetitive → exact_dup → near_dup → low_quality), so
    * the rows read as dashboard attrition — every stage's n_in is the
    * previous stage's n_out, unlike [[report]]'s overlapping per-reason
    * counts. The quality gate is CALIBRATED ON THE SURVIVORS
    * ([[TextOps.calibrateQualityThreshold]] over the include set,
    * keep-fraction p): thresholds move when upstream stages change,
    * exactly like a production funnel.
    *
    * Shape: the manifest chain + one scoring pass + the histogram
    * calibration — all doc_id/lang-keyed joins; the funnel window runs
    * over FIVE rows. total comes from one column-pruned count (the
    * joins are PK-inner, one row per doc by construction).
    */
  def funnel(docs: DataFrame, pairs: DataFrame, minWords: Long = 30,
      p: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val m = manifest(docs, pairs, minWords)
    val inc = m.filter(col("include")).select("doc_id")
    // ONE physical scoring pass: the pooled checkpoint feeds both the
    // survivor calibration and the stage assignment (two un-shared
    // subtrees otherwise — a second corpus-sized tokenize per call)
    val scored = graft.CheckpointPool.cached("funnel-scored")(
      TextOps.qualityScore(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "quality_score"))
    val thr = TextOps.calibrateFromScores(
      scored.join(inc, "doc_id")
        .select(col("lang"), col("quality_score").as("score")), p)
      .select(col("lang"), col("thr"))
    val staged = m.join(scored, "doc_id")
      .join(broadcast(thr), Seq("lang"), "left")
      .withColumn("stage",
        when(col("manifest_reasons").contains("too_short"), 1)
          .when(col("manifest_reasons").contains("repetitive"), 2)
          .when(col("manifest_reasons").contains("exact_dup"), 3)
          .when(col("manifest_reasons").contains("near_dup"), 4)
          .when(col("thr").isNull || col("quality_score") < col("thr"), 5)
          .otherwise(6))
    val total = docs.count()
    val cnt = staged.groupBy("stage").agg(count(lit(1)).as("c"))
    val grid = Seq((1, "too_short"), (2, "repetitive"), (3, "exact_dup"),
      (4, "near_dup"), (5, "low_quality")).toDF("stage", "stage_name")
    val w = Window.orderBy("stage") // FIVE rows — never corpus-sized
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cnt, Seq("stage"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum("c").over(w))
      .select(col("stage"), col("stage_name"),
        (lit(total) - col("cum") + col("c")).as("n_in"),
        col("c").as("n_dropped"),
        (lit(total) - col("cum")).as("n_out"))
      .orderBy("stage")
  }

  /** [[funnel]] with an EMBEDDING-SPACE stage spliced in: after the
    * four text stages, the survivors' embeddings run semantic near-dup
    * pruning ([[Similarity.semDedupSized]] — k-means cells at a FIXED
    * target population ⌈N_survivors/targetCellSize⌉, intra-cell
    * cosine ≥ tau drops the farther-from-centroid twin), and only the
    * semantic KEEPERS feed the quality calibration. First-drop
    * attribution is unchanged: too_short → repetitive → exact_dup →
    * near_dup → semantic_dup → low_quality, each doc charged to the
    * first stage that drops it. A surviving doc with no embedding row
    * cannot be a semantic dup and passes straight to the quality gate.
    *
    * The fixed cell SIZE is what keeps the stage linear at corpus
    * scale: per-cell population ≈ targetCellSize is constant, so the
    * intra-cell pair term is Σ|cell|² ≈ N·size (the ∝√N auto rung made
    * it N^1.5), training rides the sampled trainer on both assignment
    * levels, and the hiRankCap skew bound caps a degenerate cell at
    * pop·cap pairs. Measured ×10 → ×100 (ScaleProbe): the stage's
    * growth drops to ≈ the text-only funnel's law.
    *
    * Shape: the [[funnel]] chain plus one semdedup over the SURVIVOR
    * subset only (the stage a mix pipeline actually runs — dedup the
    * docs you might ship, not the ones already dropped). The survivor
    * embedding frame is pooled so the sizing count, both Lloyd's
    * passes, and the pair join read one materialized frame instead of
    * re-evaluating the manifest chain; the funnel window still runs
    * over SIX rows.
    */
  def funnelEmbed(docs: DataFrame, pairs: DataFrame, emb: DataFrame,
      minWords: Long = 30, p: Double = 0.7, tau: Double = 0.4,
      iters: Int = 2, corpusKey: Option[String] = None,
      targetCellSize: Int = 64,
      maxFlatCells: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val m = manifest(docs, pairs, minWords)
    val inc = m.filter(col("include")).select("doc_id")
    val embSurv = graft.CheckpointPool.cached("funnel-embed-surv")(
      emb.join(inc.select(col("doc_id").as("vec_id")), "vec_id")
        .select("vec_id", "embedding"))
    val semKept = Similarity.semDedupSized(embSurv, tau, targetCellSize,
        iters, maxFlatCells, corpusKey.map(_ + "#funnel-embed"))
      .select(col("vec_id").as("doc_id"), col("is_kept").as("sem_kept"))
    val scored = graft.CheckpointPool.cached("funnel-scored")(
      TextOps.qualityScore(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "quality_score"))
    // LEFT join: a text survivor with no embedding row PASSES the
    // semantic stage (see the staged coalesce below), so it must also
    // count in the calibration population — an inner join would
    // calibrate p against only the embedded keepers (and an entirely
    // un-embedded corpus would get a NULL threshold dropping everyone)
    val thr = TextOps.calibrateFromScores(
      scored.join(inc, "doc_id").join(semKept, Seq("doc_id"), "left")
        .filter(coalesce(col("sem_kept"), lit(true)))
        .select(col("lang"), col("quality_score").as("score")), p)
      .select(col("lang"), col("thr"))
    val staged = m.join(scored, "doc_id")
      .join(semKept, Seq("doc_id"), "left")
      .join(broadcast(thr), Seq("lang"), "left")
      .withColumn("stage",
        when(col("manifest_reasons").contains("too_short"), 1)
          .when(col("manifest_reasons").contains("repetitive"), 2)
          .when(col("manifest_reasons").contains("exact_dup"), 3)
          .when(col("manifest_reasons").contains("near_dup"), 4)
          // null sem_kept = no embedding row → not a semantic dup
          .when(not(coalesce(col("sem_kept"), lit(true))), 5)
          .when(col("thr").isNull || col("quality_score") < col("thr"), 6)
          .otherwise(7))
    val total = docs.count()
    val cnt = staged.groupBy("stage").agg(count(lit(1)).as("c"))
    val grid = Seq((1, "too_short"), (2, "repetitive"), (3, "exact_dup"),
      (4, "near_dup"), (5, "semantic_dup"), (6, "low_quality"))
      .toDF("stage", "stage_name")
    val w = Window.orderBy("stage") // SIX rows — never corpus-sized
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cnt, Seq("stage"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum("c").over(w))
      .select(col("stage"), col("stage_name"),
        (lit(total) - col("cum") + col("c")).as("n_in"),
        col("c").as("n_dropped"),
        (lit(total) - col("cum")).as("n_out"))
      .orderBy("stage")
  }

  /** Temperature-scaled multinomial sampling weights per source:
    * wᵢ = tᵢ^τ / Σⱼ tⱼ^τ with τ = 1/2 — the data-mixing recipe
    * (multilingual-BERT / XLM exponent-smoothed sampling) that
    * up-weights small sources relative to proportional sampling. Also
    * emits the proportional weight and the boost ratio so the mix
    * change is readable per source.
    *
    * τ is fixed at 1/2 because √ is IEEE-correctly-rounded (bit-equal
    * in every engine) while pow(x, 0.5) is not; the √-token values
    * round to 6dp DECIMAL(24,6) so both denominators are exact sums in
    * any fold order. One hash aggregate over sources, the scalar
    * totals broadcast back, every ratio divides once and rounds.
    */
  def sourceMixWeights(docs: DataFrame): DataFrame = {
    val perSource = docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source").agg(sum("tokens").as("t"))
      .withColumn("sq", round(sqrt(col("t").cast("double")), 6).cast("decimal(24,6)"))
    val totals = perSource.agg(
      sum("t").as("tot"), sum("sq").as("sq_tot"))
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("t").as("n_tokens"),
        round(col("t").cast("double") / col("tot").cast("double"), 6).as("w_prop"),
        round(col("sq").cast("double") / col("sq_tot").cast("double"), 6)
          .as("w_temp"))
      .withColumn("boost", round(col("w_temp") / col("w_prop"), 4))
      .orderBy("source")
  }

  /** Token-budget apportionment across sources — the step AFTER
    * [[sourceMixWeights]]: turn the temperature weights into integer
    * per-source token targets that sum EXACTLY to `budget`, by the
    * largest-remainder (Hamilton) apportionment method. A mix owner
    * hands the trainer per-source token quotas, not fractional weights
    * — and naive per-source rounding either over- or under-shoots the
    * budget by up to one token per source.
    *
    * Determinism: the apportionment runs on EXACT INTEGERS end to end.
    * The weight is the 6dp-rounded √tokens ([[sourceMixWeights]]'s
    * carrier) ×10⁶ — an exact integer; base = (budget·wᵢ) div Σw and
    * the remainder ranking compare exact integer quotients/remainders
    * (same denominator, so the fractional parts order as their integer
    * numerators — no doubles anywhere near the ±1 boundary). Σbase >
    * budget − n by the floor-division identity, so the top-R remainders
    * (R < n sources) each take one extra token and the targets sum to
    * the budget exactly. `epochs` = target/available is the up/down-
    * sampling factor per source, rounded once from exact operands.
    *
    * Shape at scale: one hash aggregate over the corpus (per-source
    * token counts), then every frame is SOURCE-COUNT sized — the
    * ranking window runs over n_sources rows, never the corpus.
    */
  def mixAllocation(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source").agg(sum("tokens").as("t"))
      .withColumn("s", (round(sqrt(col("t").cast("double")), 6)
        .cast("decimal(24,6)") * lit(1000000)).cast("long"))
    val tot = perSource.agg(sum(col("s")).as("stot"))
    val b = perSource.crossJoin(broadcast(tot))
      .withColumn("num",
        lit(budget).cast("decimal(38,0)") * col("s").cast("decimal(38,0)"))
      // an all-empty corpus has stot = 0: allocate nothing rather than
      // tripping ANSI divide-by-zero in the executor
      .withColumn("base",
        when(col("stot") =!= 0, expr("num div stot")).otherwise(0L))
      .withColumn("rem",
        when(col("stot") =!= 0, expr("num % stot")).otherwise(lit(0)))
    val sb = b.agg(sum("base").as("sb"))
    val w = Window.orderBy(desc("rem"), col("source")) // n_sources rows
    b.withColumn("rnk", row_number().over(w))
      .crossJoin(broadcast(sb))
      .withColumn("target_tokens",
        col("base") + when(col("rnk") <= lit(budget) - col("sb"), 1L)
          .otherwise(0L))
      .withColumn("epochs",
        when(col("t") =!= 0,
          round(col("target_tokens").cast("double") / col("t").cast("double"),
            4) + lit(0.0)))
      .select(col("source"), col("t").as("n_tokens"), col("s").as("w_scaled"),
        col("target_tokens"), col("epochs"))
      .orderBy("source")
  }

  /** Deterministic materialization of [[mixAllocation]]'s quotas — the
    * step that actually EMITS the training mix: every document repeats
    * for `full_epochs = quota div available` full passes, then a partial
    * epoch takes a content-hash-ordered prefix of the source until the
    * remaining `quota mod available` tokens are filled, truncating the
    * one boundary document so per-source output is EXACTLY the quota
    * (and the grand total EXACTLY the budget — Σ over this frame's
    * n_tokens is the apportionment identity, spec-pinned). The pick
    * order is md5(doc_id) — reproducible across runs, engines, and
    * cluster layouts, with no RNG state to ship.
    *
    * Scale: the full-epoch term is one `explode(sequence)` over the
    * corpus — linear, embarrassingly parallel. The partial-epoch prefix
    * sum is the one inherently sequential term, so it runs as a
    * TWO-PASS distributed prefix sum instead of a per-source window
    * over the whole corpus: docs land in 256 md5-prefix buckets, the
    * per-(source, bucket) subtotals (a 256·n_sources-row frame) carry
    * the running offset across buckets, and the within-bucket window
    * partitions by (source, bucket) — 256× the parallelism of the
    * naive per-source window, same order because the bucket key IS the
    * md5's leading byte. Output is (source, epoch)-sized — never
    * corpus-sized.
    */
  def mixMaterialize(docs: DataFrame, budget: Long): DataFrame =
    mixMaterializeDocs(docs, budget)
      .groupBy("source", "epoch")
      .agg(count(lit(1)).as("n_docs"), sum("toks_out").as("n_tokens"))
      .orderBy("source", "epoch")

  /** The DOC-LEVEL emission behind [[mixMaterialize]]: one row per
    * (document, epoch) instance the mix actually ships — full-epoch
    * replicas carry the whole document, the partial-epoch prefix
    * truncates its boundary document (`toks_out` < `tokens` on at most
    * one row per source). This is the frame downstream stages consume
    * ([[mixPackShard]] — pack to capacity, shard for trainers);
    * [[mixMaterialize]] is its (source, epoch) rollup. Same exact-
    * integer apportionment, same md5 pick order, same two-pass
    * distributed prefix sum.
    */
  def mixMaterializeDocs(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = mixAllocation(docs, budget)
      .select(col("source"), col("n_tokens").as("t"), col("target_tokens"))
      .withColumn("full_epochs", expr("target_tokens div t"))
      .withColumn("rem", col("target_tokens") % col("t"))
      .select("source", "full_epochs", "rem")
    val toks = docs
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .select("doc_id", "source", "tokens")
      .join(broadcast(alloc), "source")
    val fullRows = toks.filter(col("full_epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("full_epochs") - 1)))
      .select(col("doc_id"), col("source"), col("epoch"),
        col("tokens").as("toks_out"))
    // two-pass prefix sum: bucket = the md5's leading byte, so ordering
    // by (bucket, h) ≡ ordering by h and the cross-bucket offset is a
    // running sum over the tiny subtotal frame
    val hashed = toks
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val wb = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hashed.groupBy("source", "bucket")
      .agg(sum("tokens").as("bt")) // ≤ 256·n_sources rows
      .withColumn("offset", coalesce(sum("bt").over(wb), lit(0L)))
      .select("source", "bucket", "offset")
    val ww = Window.partitionBy("source", "bucket")
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val partRows = hashed
      .withColumn("prev_in_bucket", coalesce(sum("tokens").over(ww), lit(0L)))
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("prev", col("offset") + col("prev_in_bucket"))
      .filter(col("prev") < col("rem"))
      .select(col("doc_id"), col("source"), col("full_epochs").as("epoch"),
        least(col("tokens"), col("rem") - col("prev")).as("toks_out"))
    // toks_out ≥ 1 is the invariant every consumer leans on —
    // mixPackShard's split path computes last_pack = (offset+toks-1) DIV
    // cap, and a zero-token instance would make sequence() silently emit
    // no rows, dropping the instance from the split output without
    // error. Enforce it HERE, at the producer, loudly: tokens ≥ 1 by
    // construction (split never yields an empty array) and partRows
    // filters prev < rem so rem - prev ≥ 1, but a future materializer
    // edit must fail the run, not corrupt the pack stream.
    fullRows.unionByName(partRows)
      .withColumn("toks_out",
        when(col("toks_out") >= 1, col("toks_out"))
          .otherwise(raise_error(concat(
            lit("mixMaterializeDocs: zero-token instance doc_id="),
            col("doc_id").cast("string"),
            lit(" epoch="), col("epoch").cast("string")))))
  }

  /** The mix pipeline END TO END — materialize → shard → pack: the
    * budget-exact instance stream ([[mixMaterializeDocs]]) lands in
    * content-hash trainer shards ([[Sampling.shuffleShards]] keyed on
    * the (doc, epoch) INSTANCE, so repeated epochs of one document
    * scatter across shards), and each shard packs its instances in
    * shard-hash order into fixed-`capacity` sequences (the
    * [[Packing.packSequences]] concat-then-chunk layout, per shard).
    * The output is the artifact a trainer reads: (shard, pos) is the
    * reproducible global order, pack_id/pack_pos the sequence layout,
    * and Σ toks_out = budget exactly (the apportionment identity
    * survives both stages — neither drops nor duplicates a row).
    *
    * Scale: the instance stream is one explode + the 256-bucket
    * two-pass prefix sum (linear); sharding is ONE hash exchange;
    * packing is a per-shard running sum — parallelism = `shards`,
    * which production sets ≥ the cluster's write parallelism, so no
    * global-order window ever sees the corpus.
    *
    * `splitAtBoundary = true` emits TOKEN-LEVEL pack rows instead: an
    * instance that straddles pack boundaries is split into one row per
    * (instance, pack) intersection — (seg_index, n_segs, pack_pos,
    * seg_tokens) — so every pack in a shard holds EXACTLY `capacity`
    * tokens except the shard's final partial pack (the invariant a
    * trainer's fixed-length loader assumes; PackingSpec pins it). The
    * split is a linear explode (output rows = instances + straddle
    * count; an instance spans ≤ ⌈toks/capacity⌉+1 packs), so the plan
    * shape is unchanged: no new exchange, no window beyond the
    * per-shard running sum.
    */
  def mixPackShard(docs: DataFrame, budget: Long, capacity: Long = 2048L,
      shards: Int = 8, splitAtBoundary: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    val inst = mixMaterializeDocs(docs, budget)
      .withColumn("inst", concat_ws(":", col("doc_id"), col("epoch")))
    val sharded = Sampling.shuffleShards(inst, col("inst"), col("inst"), shards)
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = sharded
      .withColumn("tok_offset", sum("toks_out").over(w) - col("toks_out"))
      .withColumn("pack_id", expr(s"tok_offset DIV ${capacity}L"))
      .withColumn("pack_pos", pmod(col("tok_offset"), lit(capacity)))
      .withColumn("straddles", col("pack_pos") + col("toks_out") > capacity)
    if (!splitAtBoundary)
      packed
        .select("shard", "pos", "doc_id", "epoch", "source", "toks_out",
          "tok_offset", "pack_id", "pack_pos", "straddles")
        .orderBy("shard", "pos")
    else packed
      // toks_out ≥ 1 always (a materialized instance carries tokens —
      // ENFORCED by mixMaterializeDocs' raise_error guard, not just
      // argued), so last_pack is well-defined and sequence() never
      // reverses
      .withColumn("first_pack", col("pack_id"))
      .withColumn("last_pack",
        expr(s"(tok_offset + toks_out - 1) DIV ${capacity}L"))
      .drop("pack_id", "pack_pos", "straddles")
      .withColumn("pack_id",
        explode(sequence(col("first_pack"), col("last_pack"))))
      .withColumn("seg_start",
        greatest(col("tok_offset"), col("pack_id") * capacity))
      .withColumn("seg_end",
        least(col("tok_offset") + col("toks_out"),
          (col("pack_id") + lit(1L)) * capacity))
      .select(col("shard"), col("pos"), col("doc_id"), col("epoch"),
        col("source"), col("pack_id"),
        (col("pack_id") - col("first_pack")).as("seg_index"),
        (col("last_pack") - col("first_pack") + lit(1L)).as("n_segs"),
        (col("seg_start") - col("pack_id") * capacity).as("pack_pos"),
        (col("seg_end") - col("seg_start")).as("seg_tokens"))
      .orderBy("shard", "pos", "seg_index")
  }

  /** c-TF-IDF cluster topic labels (Grootendorst 2022, BERTopic §3.2,
    * public method): k-means cells over the embedding corpus, then per
    * cell the top terms by tf·ln(1 + A/f) where tf = the term's count
    * inside the cell, f = its count across all cells, and A = the
    * average token count per cell — the class-based tf-idf that names
    * what each embedding cluster is ABOUT, the human-readable readout
    * on top of every cluster-shaped operator here (semdedup cells,
    * cluster-balanced sampling, IVF cells).
    *
    * Determinism: the quantizer is the shared deterministic trainer
    * (sampled Lloyd's through the session cache); the ln argument is a
    * single division of exact integers ((nc·f + tot)/(nc·f)), its
    * result rounds to 6dp BEFORE the tf multiply, and ranking runs over
    * the rounded score with a term tiebreak — the tf-idf recipe, so
    * nothing rides a libm last-ulp.
    *
    * Scale: one broadcast-centroid assignment pass, one explode + two
    * hash aggregations; everything past the explode is vocabulary-sized
    * ((cell, term) rows), the top-k window partitions by cell. The
    * stopword/short-token gate drops the degenerate head before the
    * aggregation, not after.
    */
  def clusterTopics(docs: DataFrame, emb: DataFrame, cells: Int = 8,
      iters: Int = 2, topK: Int = 5, corpusKey: Option[String] = None): DataFrame = {
    val assigned = corpusKey
      .map(Similarity.kmeansAssignCached(emb, cells, iters, _))
      .getOrElse(Similarity.kmeansAssign(emb, cells, iters))
      .select(col("vec_id").as("doc_id"), col("cell"))
    cTfIdfTopics(docs, assigned, topK)
  }

  /** The c-TF-IDF scorer over an arbitrary (doc_id, cell) assignment —
    * shared by [[clusterTopics]] (kmeans cells over the whole corpus)
    * and [[funnelTopics]] (the funnel survivors' semantic cells). One
    * explode + two hash aggregations; vocabulary-sized after.
    */
  private def cTfIdfTopics(docs: DataFrame, assigned: DataFrame,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.join(assigned, "doc_id")
      .select(col("cell"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) >= 3 and
        !col("term").isin(TextOps.stopwords: _*))
    val tf = toks.groupBy("cell", "term").agg(count(lit(1)).as("tf"))
    val f = tf.groupBy("term").agg(sum("tf").as("f"))
    val totals = tf.agg(sum("tf").as("tot"), countDistinct("cell").as("nc"))
    val w = Window.partitionBy("cell").orderBy(desc("score"), col("term"))
    tf.join(f, "term").crossJoin(broadcast(totals))
      .withColumn("idf", round(log(
        (col("nc") * col("f") + col("tot")).cast("double") /
          (col("nc") * col("f")).cast("double")), 6))
      .withColumn("score", round(col("tf") * col("idf"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("cell", "rnk", "term", "tf", "score")
      .orderBy("cell", "rnk")
  }

  /** Topic labels for the CURATED corpus — [[funnelEmbed]]'s semantic
    * KEEPERS labeled per cell with [[clusterTopics]]' c-TF-IDF: the
    * human-readable readout on the curation report ("what survived,
    * and what is each surviving cluster about"). Composes the two
    * existing chains: the manifest's include set, the survivors'
    * sized semantic cells (shared cached pieces — running this next to
    * [[funnelEmbed]] in one session pays one extra explode + two
    * vocabulary-sized aggregates, not a second quantizer), and the
    * class-based tf-idf over the keepers' text.
    */
  def funnelTopics(docs: DataFrame, pairs: DataFrame, emb: DataFrame,
      minWords: Long = 30, tau: Double = 0.4, targetCellSize: Int = 64,
      iters: Int = 2, topK: Int = 5,
      corpusKey: Option[String] = None,
      maxFlatCells: Int = 64): DataFrame = {
    val m = manifest(docs, pairs, minWords)
    val inc = m.filter(col("include")).select("doc_id")
    // the SAME pooled survivor frame + cached quantizer as funnelEmbed
    // (label + corpusKey suffix match) — one semantic stage per session
    val embSurv = graft.CheckpointPool.cached("funnel-embed-surv")(
      emb.join(inc.select(col("doc_id").as("vec_id")), "vec_id")
        .select("vec_id", "embedding"))
    val kept = Similarity.semDedupSized(embSurv, tau, targetCellSize,
        iters, maxFlatCells, corpusKey.map(_ + "#funnel-embed"))
      .filter(col("is_kept"))
      .select(col("vec_id").as("doc_id"), col("cell"))
    cTfIdfTopics(docs, kept, topK)
  }
}
