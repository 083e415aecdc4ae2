package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines. Everything keys off a content hash (md5), never an RNG:
  * Bernoulli sampling is irreproducible under task retries and
  * repartitioning, while hash assignment is stable across runs,
  * engines, and cluster layouts — the property that keeps a held-out
  * split held out when the corpus is rebuilt. All projections/windows,
  * no operator-specific shuffles beyond the quota window.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of a key: the exact
    * integer value of the digest's first 8 hex NIBBLES (base-16
    * polynomial — 32 bits of entropy, each term < 16^8 = 2^32, exact
    * 64-bit arithmetic). NOT the base-128 ascii polynomial [[Dedup]]'s
    * MinHash uses against prime moduli: ascii hex chars span only 16
    * values and every coefficient 128^k (k ≥ 1) is ≡ 0 modulo any
    * power-of-two bucket count ≤ 128 — under mod 64 only the LAST
    * char survived (16 reachable buckets of 64; 256 of 8192; 10
    * skewed of 16). The nibble polynomial mixes all eight nibbles
    * into the low bits, uniform for every modulus.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    // conv(hex, 16, 10) IS the nibble polynomial in one call — the
    // 8-term substr/ascii/CASE expansion computes the same value but
    // costs ~8 char extractions + branches per row, measurable on
    // token-exploded frames (DSIR buckets every token of the corpus).
    // The DuckDB oracle mirror keeps the explicit polynomial; both
    // sides parse the same 8 hex chars to the same integer.
    val x = conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    pmod(x, lit(buckets.toLong))
  }

  /** Train/val/test split assignment over 100 hash buckets:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val, rest →
    * test. Content-keyed, so a document keeps its split across corpus
    * rebuilds and dedup reorderings.
    */
  def withSplit(df: DataFrame, key: Column,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val b = hashBucket(key, 100)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Keep ~rate of rows, hash-deterministically (10k buckets →
    * resolution 0.01%).
    */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(key, 10000) < math.round(rate * 10000))
  }

  /** Deterministic k-fold cross-validation assignment with a
    * per-(fold, language) balance audit: fold = content hash mod k
    * (so a doc keeps its fold across rebuilds, the [[withSplit]]
    * property), and each output row carries ratio = n·k/lang_total —
    * ≈ 1 everywhere when the folds are stratification-safe. Two hash
    * aggregates, output bounded by k × languages.
    */
  def cvFolds(docs: DataFrame, k: Int = 5): DataFrame = {
    val withFold = docs.withColumn("fold", hashBucket(col("text"), k))
    val counts = withFold.groupBy("fold", "lang").agg(count(lit(1)).as("n_docs"))
    val langTot = docs.groupBy("lang").agg(count(lit(1)).as("lang_total"))
    counts.join(langTot, "lang")
      .withColumn("ratio", round(col("n_docs") * lit(k) / col("lang_total"), 4))
      .select("fold", "lang", "n_docs", "lang_total", "ratio")
      .orderBy("fold", "lang")
  }

  /** Per-group quota selection: the top `n` rows per `group` by
    * `score` descending, ties broken by `id` ascending — e.g.
    * language-balanced corpus capping (take the best N docs per
    * language instead of letting one language dominate). One window
    * shuffle on the group key.
    */
  def quotaPerGroup(df: DataFrame, group: Column, score: Column,
      id: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(score.desc, id.asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Deterministic global shuffle into trainer shards — the "shuffle
    * 100 TB once" stage a training run reads: each row lands in a
    * content-hash shard with a position given by its hash order inside
    * the shard. Reading shards 0..n-1 in position order yields a
    * reproducible pseudo-random global permutation — no RNG, stable
    * under task retries and corpus rebuilds (same property as
    * [[withSplit]]), and any contiguous doc-id run (a crawl batch, one
    * source's dump) scatters across all shards.
    *
    * Shape at scale: ONE hash-partition exchange (on `shard`) + a
    * per-shard window over the hash — parallelism = shard count, so
    * `shards` should be ≥ the cluster's write parallelism (training
    * setups use thousands). `pos` ties break by `id` for the
    * (astronomically unlikely, but cross-engine-reproducible) md5
    * collision case.
    */
  def shuffleShards(df: DataFrame, key: Column, id: Column,
      shards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("__h").asc, id.asc)
    df.withColumn("__h", md5(key))
      .withColumn("shard", hashBucket(key, shards))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__h")
  }

  /** Token-budget selection per group — the data-MIXING primitive:
    * within each group (language, source, domain), take documents in
    * quality order (score desc, id asc tiebreak — score must already be
    * ROUNDED for cross-engine determinism) until the group's cumulative
    * token count reaches `budget`. A doc is kept iff the tokens BEFORE
    * it leave room to start it (the budget-crossing doc is kept, as
    * training mixtures do — truncation is the loader's job), so every
    * group with any docs contributes at least one.
    *
    * Shape: one window shuffle on the group key (groups = languages /
    * sources — thousands at most, each a running sum, not a global
    * order); the same past-the-key-ceiling chunking as WindowChunks
    * applies if one group ever dominates.
    */
  def tokenBudgetPerGroup(df: DataFrame, group: Column, score: Column,
      id: Column, tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(score.desc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens.cast("long")).over(w))
      .filter(col("cum_tokens") - tokens.cast("long") < budget)
  }

  /** DSIR-style importance weights (Xie et al. 2023, hashed-unigram
    * variant): per document, the log-likelihood ratio of a target
    * domain's token distribution vs the whole corpus, estimated over
    * `buckets` hash buckets with add-½ smoothing —
    * logw(d) = Σ_tokens ln(p_target(b(t)) / p_corpus(b(t))). Documents
    * scoring high look like the target domain; sampling ∝ exp(logw)
    * reweights a raw corpus toward it.
    *
    * Determinism: bucket counts are exact integers; each bucket's
    * log-ratio evaluates once in double with a fixed tree and rounds to
    * an 8dp DECIMAL carrier, so the per-document sum (a DECIMAL
    * aggregate over tokens) is fold-order free.
    *
    * Shape at corpus scale: the two count tables are `buckets`-bounded
    * (default 8192 rows) — one hash aggregate each, then the log-ratio
    * table BROADCASTS to the token stream, whose per-doc sum
    * partial-combines map-side. Nothing document-sized ever shuffles
    * except the (doc_id, sum) rows.
    */
  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row gets the key u^(1/w) — equivalently
    * ranked by ln(u)/w — and the top-k keys are the sample, which is
    * distributed exactly as sequential weighted draws without
    * replacement. The uniform u comes from the content hash (the
    * [[hashBucket]] md5 polynomial mapped to (0, 1]), never an RNG, so
    * the sample is reproducible across runs, engines, and cluster
    * layouts — same contract as every other sampler here.
    *
    * Scale: one narrow projection + a global top-k (TakeOrdered — no
    * full sort, no single-partition window). The ES key is ranked on
    * an 8dp-rounded carrier with a doc_id tiebreak so ordering never
    * touches a raw computed float.
    *
    * `weight` must be strictly positive; non-positive rows are
    * excluded (they have zero inclusion probability). The weight is
    * carried as DOUBLE — fractional importance weights (e.g. the
    * exp'd DSIR log-weights this sampler exists to consume) sample
    * correctly, instead of truncating to 0 (silently excluded) or a
    * distorted integer.
    */
  def weightedSample(docs: DataFrame, weight: Column, k: Int): DataFrame = {
    val m = md5(col("text"))
    val x = (1 to 8).map(i => ascii(m.substr(i, 1)) * lit(math.pow(128, 8 - i).toLong))
      .reduce(_ + _)
    val p = graft.operators.Dedup.minhashP
    val u = (pmod(x.cast("long"), lit(p)) + lit(1.0)) / lit(p + 1.0)
    docs
      .withColumn("w", weight.cast("double"))
      .filter(col("w") > 0)
      .withColumn("es_key", round(log(u) / col("w"), 8))
      .select("doc_id", "w", "es_key")
      .orderBy(desc("es_key"), col("doc_id"))
      .limit(k)
  }

  /** [[weightedSample]] for LOG-space weights — the form that pairs
    * directly with [[dsirWeights]]'s importance log-weights without
    * ever exponentiating: for w = exp(lw), ranking u^(1/w) descending
    * is equivalent to ranking ln(−ln u) − lw ASCENDING (ln u < 0, so
    * ln(u)/exp(lw) = −exp(ln(−ln u) − lw), a monotone flip — the
    * Gumbel-trick identity). exp() is avoided on purpose: lw spans
    * hundreds of nats across a corpus, where exp overflows AND its
    * cross-engine last-ulp differences would land straight in the
    * ranking; ln on identical doubles is the already-proven carrier.
    * Same content-hash uniform, top-k via TakeOrdered, 8dp-rounded
    * key with doc_id tiebreak.
    */
  def weightedSampleLogW(docs: DataFrame, logWeight: Column, k: Int): DataFrame = {
    val m = md5(col("text"))
    val x = (1 to 8).map(i => ascii(m.substr(i, 1)) * lit(math.pow(128, 8 - i).toLong))
      .reduce(_ + _)
    val p = graft.operators.Dedup.minhashP
    val u = (pmod(x.cast("long"), lit(p)) + lit(1.0)) / lit(p + 1.0)
    docs
      .withColumn("lw", logWeight.cast("double"))
      .withColumn("es_key", round(log(-log(u)) - col("lw"), 8))
      .select("doc_id", "lw", "es_key")
      .orderBy(col("es_key"), col("doc_id"))
      .limit(k)
  }

  def dsirWeights(docs: DataFrame, targetSource: String,
      buckets: Int = 8192, scale: Int = 6): DataFrame = {
    // spread before the explode: the one-file documents scan would
    // otherwise serialize the token explode + md5 bucketing into one
    // task — and this frame is evaluated three times (target counts,
    // corpus counts, the final per-doc sum)
    val toks = Spread.spread(docs)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", hashBucket(col("tok"), buckets))
    val target = toks.filter(col("source") === targetSource)
      .groupBy("b").agg(count(lit(1)).as("c_t"))
    val corpus = toks.groupBy("b").agg(count(lit(1)).as("c_r"))
    // token totals come from the bucket tables themselves (8192 rows) —
    // no driver-side count, one broadcast 1-row build side
    val totals = corpus.agg(sum("c_r").as("n_r"))
      .crossJoin(target.agg(sum("c_t").as("n_t")))
    val alphaB = lit(buckets / 2.0) // α·B with α = ½
    val ratios = corpus.join(target, Seq("b"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(
          ((coalesce(col("c_t"), lit(0L)).cast("double") + lit(0.5)) /
            (col("n_t").cast("double") + alphaB)) /
            ((col("c_r").cast("double") + lit(0.5)) /
              (col("n_r").cast("double") + alphaB))), 8)
          .cast("decimal(14,8)").as("lr"))
    toks.join(broadcast(ratios), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lr")).cast("double"), scale).as("dsir_logw"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "n_tokens", "dsir_logw")
      .orderBy("doc_id")
  }
}
