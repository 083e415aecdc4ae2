package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (64-dim float vectors) —
  * brute-force cosine top-k as the correctness baseline and a
  * bucket-pruned (IVF-style) variant as the scale path.
  *
  * The dot product / norms are built-in higher-order-function folds
  * (whole-stage codegen'd, no UDF): elements are cast to double before
  * multiplying so the products are exact, and the cosine is rounded to
  * 4 decimals before ranking so Spark and the DuckDB oracle rank
  * identical values (ties broken by vec_id).
  *
  * Scale notes (100 TB): brute force is queries × corpus — fine for a
  * broadcast query batch against a partitioned corpus (each executor
  * scans its corpus slice once; no shuffle of the corpus). The IVF
  * variant prunes to same-bucket candidates (here the `label` column
  * plays the coarse-quantizer cell id; in production the cell id comes
  * from a k-means assignment computed the same way), turning the scan
  * into a bucket-partitioned join that drops compute by the bucket
  * count while keeping recall for clustered data.
  */
object Similarity {

  /** Left-fold dot product of two double arrays — the codegen'd
    * [[graft.functions.DotProduct]] kernel (IEEE-identical to the
    * zip_with/aggregate composition, no intermediate array per pair).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorMath.dot(a, b)

  private[operators] def toDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** cosine(a, b) rounded to 4. */
  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    round(dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db))), 4)
  }

  /** Brute-force cosine top-k: the first `nQueries` vec_ids against the
    * whole corpus (self excluded).
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = q.join(emb, col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** IVF-style bucketed top-k: candidates restricted to the query's
    * coarse bucket (label column as cell id).
    */
  def bucketedTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("label").as("qlabel"))
    val scored = q.join(emb,
        col("qlabel") === col("label") && col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "label", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** Hard-negative mining (the contrastive-training data op): per
    * query vector, the top-k most-similar corpus vectors carrying a
    * DIFFERENT label — the near-miss negatives that make triplet /
    * InfoNCE training informative, mined corpus-wide. Same
    * broadcast-queries / partitioned-corpus shape as
    * [[bruteForceTopK]]; at scale the candidate set comes from
    * [[ivfTopK]]'s cells first and the label filter applies to the
    * pruned candidates — the plan here IS that filter + ranking,
    * with brute-force candidates as the recall ceiling.
    */
  def hardNegatives(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val scored = q.join(emb, col("qlabel") =!= col("label"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "qlabel", "rnk", "vec_id", "label", "cos")
      .orderBy("qid", "rnk")
  }

  /** Binary-embedding retrieval: 1-bit-per-dimension sign signatures
    * (64-char bit strings) searched by Hamming distance through the
    * codegen'd [[graft.functions.HammingDistance]] — the 32×-compressed
    * retrieval tier below int8 and PQ (sign-random-projection LSH with
    * coordinate hyperplanes; Charikar 2002). The query side broadcasts;
    * the corpus moves only (vec_id, 64-byte signature) rows, never
    * floats. Ties break (distance, vec_id) — all-integer, total order.
    */
  def binaryTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val sig = emb.select(col("vec_id"),
      array_join(transform(col("embedding"),
        x => when(x >= lit(0.0f), lit("1")).otherwise(lit("0"))), "").as("sig"))
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("sig").as("qsig"))
    val scored = broadcast(q).join(sig, col("qid") =!= col("vec_id"))
      .withColumn("hd", graft.functions.HammingDistance.hamming(col("qsig"), col("sig")))
    val w = Window.partitionBy("qid").orderBy(col("hd"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "hd")
      .orderBy("qid", "rnk")
  }

  /** int8 codes + exact integer squared norm per vector, the shared
    * projection behind [[sq8TopK]]/[[sq8Recall]] — the [[quantizeInt8]]
    * scheme kept as a typed array instead of the export CSV.
    */
  /** Append the SQ8 code columns (ma, q, n2) to `emb` as narrow
    * per-row expressions — the ONE quantization scheme every SQ8
    * consumer shares. Column-appending form so an index write can keep
    * the embedding co-located without a vec_id self-join.
    */
  private[operators] def withSq8Codes(emb: DataFrame): DataFrame = {
    val maxAbs = aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (acc, x) => greatest(acc, x))
    emb.withColumn("ma", maxAbs)
      .withColumn("q", transform(col("embedding"), x =>
        when(col("ma") === 0.0, lit(0))
          .otherwise(floor(x.cast("double") / col("ma") * 127 + 0.5).cast("int"))))
      .withColumn("n2",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long") * x.cast("long")))
  }

  private[operators] def sq8Codes(emb: DataFrame): DataFrame =
    withSq8Codes(emb).select("vec_id", "ma", "q", "n2")

  /** SQ8 quantized-cosine top-k — the serving tier between
    * full-precision floats and PQ codes: 4× smaller storage, integer
    * dot products, no training step (unlike PQ) and per-dimension
    * resolution (unlike [[binaryTopK]]'s sign bits). The FAISS
    * ScalarQuantizer QT_8bit idea re-expressed as one codegen'd
    * projection + the [[bruteForceTopK]] plan shape over 4×-less data.
    *
    * Cross-engine determinism: all three inner sums (q·d, q·q, d·d)
    * are exact 64-bit integer aggregates — both engines divide
    * IDENTICAL operands, so the one double expression (an IEEE
    * div/sqrt tree) is bit-equal, rounded once at 4dp with a vec_id
    * tiebreak, never an ORDER BY over a raw float. An all-zero vector
    * quantizes to zeros and scores NULL (cosine undefined) — mirrored
    * as CASE in the oracle.
    */
  def sq8TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val codes = sq8Codes(emb)
    val q = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val dotInt = aggregate(
      zip_with(col("qq"), col("q"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = broadcast(q).join(codes, col("qid") =!= col("vec_id"))
      .withColumn("qcos",
        when(col("qn2") === 0L || col("n2") === 0L, lit(null).cast("double"))
          .otherwise(round(dotInt.cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))), 4) + lit(0.0)))
    val w = Window.partitionBy("qid").orderBy(desc("qcos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "qcos")
      .orderBy("qid", "rnk")
  }

  /** IVF × SQ8 — the composed serving shape (FAISS
    * IndexIVFScalarQuantizer QT_8bit, public API/docs): the coarse
    * quantizer prunes to each query's `nprobe` nearest cells, the int8
    * codes score ONLY those candidates. The two knobs compose
    * independently — nprobe buys recall at scan cost, SQ8 cuts the
    * scanned bytes 4× within [[sq8TopK]]'s bounded score error. Same
    * cached-training contract as [[ivfMultiProbeTopK]].
    */
  def ivfSq8TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      cells: Int = 8, iters: Int = 2, nprobe: Int = 2,
      corpusKey: Option[String] = None): DataFrame = {
    require(iters >= 2, "IVF-SQ8 needs trained centroids (iters >= 2)")
    // terminal checkpoints (the returned plan keeps reading them) go
    // through the CheckpointPool: the cached-quantizer path reuses one
    // probe block set across calls (stable LogicalRDD leaves → stable
    // key), and the keyless path degrades to the pool's bounded FIFO
    // instead of pinning a fresh corpus-sized set per evaluation (the
    // vocabPrune-class leak, closed generically in round 13)
    val (assignedAll, centroids, cacheOwned) = corpusKey match {
      case Some(tag) =>
        val (a, c) = kmeansAssignCachedWithCentroids(emb, cells, iters, tag)
        (a, c, true)
      case None =>
        val (a, cOpt) = kmeansAssignInternal(emb, cells, iters)
        (graft.CheckpointPool.cached("ivfsq8-assigned")(a), cOpt.get, false)
    }
    val assigned = assignedAll.select("vec_id", "cell")
    val codes = sq8Codes(emb)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
    val qCodes = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val pw = Window.partitionBy("qid").orderBy(col("pd"), col("cell"))
    val probes = graft.CheckpointPool.cached("ivfsq8-probes")(
      q.crossJoin(broadcast(centroids))
        .withColumn("pd", l2sq(col("qv"), col("c")))
        .withColumn("pn", row_number().over(pw))
        .filter(col("pn") <= nprobe)
        .select("qid", "cell", "pn"))
    if (!cacheOwned)
      org.apache.spark.sql.GraftShims.uncheckpoint(centroids)
    val withCell = codes.join(assigned, "vec_id")
    val dotInt = aggregate(
      zip_with(col("qq"), col("q"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = probes
      .join(broadcast(qCodes), "qid")
      .join(withCell, "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("qcos",
        when(col("qn2") === 0L || col("n2") === 0L, lit(null).cast("double"))
          .otherwise(round(dotInt.cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))), 4) + lit(0.0)))
    val w = Window.partitionBy("qid").orderBy(desc("qcos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cell", "pn", "qcos")
      .orderBy("qid", "rnk")
  }

  /** Recall@k of the SQ8 tier against the exact-cosine ground truth —
    * the acceptance gate before swapping a serving fleet from float32
    * to int8 reads. One aggregate row, same contract as the IVF/PQ/MRL
    * recall queries.
    */
  def sq8Recall(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val approx = sq8TopK(emb, nQueries, k).select("qid", "vec_id")
    val exact = bruteForceTopK(emb, nQueries, k)
      .select(col("qid").as("bqid"), col("vec_id").as("bvid"))
    val hit = when(col("bqid").isNotNull, 1L).otherwise(0L)
    approx.join(exact,
        col("qid") === col("bqid") && col("vec_id") === col("bvid"), "left")
      .agg(count(lit(1)).as("n_returned"), sum(hit).as("n_hits"),
        round(sum(hit) / lit((nQueries * k).toDouble), 4).as("recall_at_k"))
  }

  /** SQ8 shortlist + exact float rerank — the two-stage serving shape
    * every compressed tier ends in ([[pqRerankTopK]]'s twin): the int8
    * scan proposes `cand` candidates per query, the exact cosine
    * re-scores ONLY those (cand·nQueries rows, never the corpus). At
    * scale the rerank stage reads the float vectors of the shortlist
    * alone — the 4× storage saving applies to the scan, full precision
    * applies to the answer.
    */
  def sq8RerankTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      cand: Int = 10): DataFrame = {
    val candidates = sq8TopK(emb, nQueries, cand).select("qid", "vec_id")
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rer = candidates
      .join(emb.select("vec_id", "embedding"), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    rer.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** Cluster-balanced (diversity-preserving) downsampling: cap each
    * k-means cell at `cap` vectors, picked by a content-keyed md5
    * order (never an RNG — re-runs and shard orders cannot change the
    * sample, the [[Sampling]] discipline). The curation counterpart of
    * semantic dedup: where semdedup drops near-twins, this bounds how
    * much any one REGION of embedding space contributes to a training
    * mix (cluster-capped selection, cf. the domain-balancing role of
    * DSIR-style reweighting).
    *
    * Shape at scale: one assignment pass (broadcast centroids via the
    * session quantizer cache) + one window ranked per cell —
    * parallelism = cells (∝ √N under the [[semdedupAuto]] rung rule),
    * each partition corpus/cells sized, top-cap rows survive.
    */
  def clusterBalancedSample(emb: DataFrame, cells: Int = 8, iters: Int = 2,
      cap: Int = 10, corpusKey: Option[String] = None,
      maxFlatCells: Int = 256): DataFrame = {
    // the rung sits HIGHER than semDedupAuto's 64: sampling has no
    // pairing term, so flat N·cells assignment stays the cheaper plan
    // until the cell count alone dominates (measured ×10 cells=80:
    // flat 5.7 s vs two-level 11.8 s; ×100 cells=800: flat 181 s vs
    // two-level 20 s)
    val assigned =
      if (cells <= maxFlatCells)
        corpusKey.map(kmeansAssignCached(emb, cells, iters, _))
          .getOrElse(kmeansAssign(emb, cells, iters))
          .select("vec_id", "cell")
      else {
        // flat Lloyd's is N·cells distance work — quadratic-ish once
        // cells ∝ √N (measured: 181 s at ×100 with cells=800 vs 5.7 s
        // at ×10). Past the flat rung, reuse the [[semDedupTwoLevel]]
        // shape: coarse √cells over the corpus, fine √cells INSIDE each
        // coarse cell — N·2√cells assignment for the same cell count,
        // composite cell id. The sample is cell-id-opaque, so the
        // composite rung changes WHICH cells exist, not the contract
        // (≤ cap per cell, content-keyed order).
        val side = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
        twoLevelAssign(emb, side, side, iters).select(col("vec_id"),
          (col("pcell") * side + col("cell")).as("cell"))
      }
    val w = Window.partitionBy("cell")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assigned.withColumn("pick", row_number().over(w))
      .filter(col("pick") <= cap)
      .select("cell", "pick", "vec_id")
      .orderBy("cell", "pick")
  }

  /** Int8 max-abs quantization of the embedding column — the storage
    * shape a large embedding corpus actually ships (4× smaller than
    * float32, int-arithmetic dot products). Symmetric per-vector
    * scheme: scale = max|x_i|, q_i = floor(x_i/scale·127 + 0.5), with
    * an all-zero vector quantizing to zeros. A pure codegen'd per-row
    * projection — no shuffle, no UDF. Max round-trip error is
    * scale/254 per element (SimilaritySpec asserts it).
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    sq8Codes(emb) // ONE quantization scheme — the export and the SQ8
      // serving tier cannot silently diverge
      .select(col("vec_id"), col("ma").as("max_abs"),
        concat_ws(",", transform(col("q"), _.cast("string"))).as("q_csv"))
      .orderBy("vec_id")

  /** Embedding QA before indexing: per vector, the L2 norm plus the
    * degenerate-vector flags an index build must reject — NaN/Inf
    * components, the all-zero vector (cosine undefined), and
    * magnitude outliers by the robust MAD rule
    * |norm − median| > k·MAD (median-based, so a batch of broken
    * near-zero vectors can't drag a mean-based threshold down with
    * it). Norms are rounded 6dp before the medians so both engines
    * interpolate over identical values; the two median passes are the
    * exact diagnostic — at 100 TB the register-file quantile sketch
    * ([[Sketch.logHistQuantiles]]) replaces them, same as every other
    * exact-twin here.
    *
    * MAD = 0 (over half the corpus at the same rounded norm) disables
    * the outlier rule rather than flagging everything off-median.
    */
  def normQuality(emb: DataFrame, k: Double = 3.0): DataFrame = {
    val v = toDouble(col("embedding"))
    val base = emb.select(col("vec_id"),
        size(filter(v, x => isnan(x) || x === Double.PositiveInfinity ||
          x === Double.NegativeInfinity)).as("n_bad"),
        round(sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)), 6).as("norm"))
    // medians over FINITE norms only: one NaN component gives a NaN
    // norm, and a NaN inside percentile would poison the median the
    // QA rule depends on — exactly on the broken batches it exists for
    val med = base.filter(col("n_bad") === 0)
      .agg(expr("percentile(norm, 0.5)").as("m"))
    val withMed = base.crossJoin(broadcast(med))
      .withColumn("adev", round(abs(col("norm") - col("m")), 6))
    val mad = withMed.filter(col("n_bad") === 0)
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn("is_zero", col("norm") === 0.0)
      .withColumn("mag_outlier",
        col("mad") > 0.0 && col("adev") > lit(k) * col("mad"))
      .withColumn("flagged",
        col("n_bad") > 0 || col("is_zero") || col("mag_outlier"))
      .select(col("vec_id"), col("norm"), col("n_bad"), col("is_zero"),
        round(col("m"), 6).as("median_norm"), round(col("mad"), 6).as("mad"),
        col("mag_outlier"), col("flagged"))
      .orderBy("vec_id")
  }

  /** Squared L2 distance between two double arrays, rounded to 6 — the
    * rounding absorbs cross-engine summation-order ulp noise so argmin
    * assignments are reproducible (ties broken by cell id). The kernel
    * is the codegen'd [[graft.functions.L2SqDistance]]: same ascending
    * index order and +/−/× sequence as the zip_with/aggregate
    * composition it replaced (bit-equal distances), without the
    * intermediate 64-element array the lambda form allocated per
    * candidate pair — at ×100 / 800 cells an assignment pass scores
    * 160M pairs, so the allocation was the pass's dominant cost.
    */
  private[operators] def l2sq(a: Column, b: Column): Column =
    round(graft.functions.VectorMath.l2sq(a, b), 6)

  /** Deterministic Lloyd's k-means over the embedding column — the real
    * coarse quantizer behind an IVF index. Fixed everything that is
    * normally random: centroids initialize from the first `k` vec_ids,
    * exactly `iters` assign/update rounds run, distances and centroid
    * means round to 6 decimals (absorbing engine addition-order noise
    * without moving any genuine decision), and argmin ties break by
    * cell id. Returns (vec_id, cell, d) — each vector's cell and its
    * rounded squared distance to the final centroid.
    *
    * Scale: each round is one broadcast of k×dims centroids against a
    * corpus scan (no shuffle of the corpus) plus one k×dims-sized
    * aggregate for the update — the textbook distributed Lloyd's. The
    * explode in the update stage moves rows×dims elements through a
    * map-side-combined avg, bounded by the corpus size, not k.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2,
      sampleRows: Int = AutoTrainSample): DataFrame =
    kmeansAssignInternal(emb, k, iters, sampleRows)._1

  /** Default training-sample FLOOR: production Lloyd's never trains on
    * the full corpus (FAISS's train-on-a-sample discipline — the
    * clustering guidance caps training points per centroid); 65536
    * keeps every local test corpus (≤ a few thousand vectors) in the
    * degenerate keep-everything regime — results bit-identical to
    * full-corpus training — while the ×100 probes (hundreds of
    * thousands of vectors) train on the capped sample and assign the
    * corpus once.
    */
  val defaultTrainSample: Int = 65536

  /** Sentinel default for every `sampleRows` parameter: resolve the
    * cap from the CELL COUNT, not a flat constant. A flat 65536
    * silently starves recall once cells is large (measured at
    * ×100/800 cells: 0.1333 vs the full trainer's 0.3000 — ~82 rows
    * per centroid where the full trainer had ~250+); the FAISS
    * clustering guidance is a per-centroid training budget, so the
    * auto default is max(65536, 256·cells) — recall parity without
    * the caller having to know the rule. Explicit values pass through
    * untouched (0 is never a legal cap — [[trainSample]] requires > 0).
    */
  val AutoTrainSample: Int = 0

  /** The resolved auto cap: ≥ ~256 training rows per centroid, never
    * below the [[defaultTrainSample]] floor.
    */
  def autoTrainSample(cells: Int): Int =
    math.max(defaultTrainSample, 256 * cells)

  private[operators] def resolveSample(sampleRows: Int, cells: Int): Int =
    if (sampleRows == AutoTrainSample) autoTrainSample(cells) else sampleRows

  /** Hash-bucket resolution of the training-sample filter. */
  private[graft] val sampleBuckets: Int = 1 << 20

  /** Uniform bucket in [0, 2^20) from the md5 of the vec_id — now just
    * [[Sampling.hashBucket]] at the sample resolution: that bucket
    * hasher IS the nibble polynomial (the power-of-two-safe form this
    * helper originally existed to provide; the ascii-polynomial
    * degeneracy it worked around was fixed at the source).
    */
  private[graft] def hexBucket(key: Column): Column =
    Sampling.hashBucket(key, sampleBuckets)

  /** Deterministic capped training sample over (vec_id, v): keep a row
    * iff [[hexBucket]](vec_id) · n < 2^20 · sampleRows, with n the
    * corpus row count folded in declaratively (one broadcast one-row
    * aggregate — no driver job). Content-hash keyed like every sampler
    * here: stable across runs, engines, and partition layouts, never
    * an RNG. When n ≤ sampleRows the predicate is identically true
    * (hb < 2^20 always), so small corpora keep EVERY row and training
    * degenerates to the exact full-corpus Lloyd's. Expected sample
    * size ≈ sampleRows above the cap (binomial concentration — the cap
    * is a target, not an exact rank).
    */
  private[graft] def trainSample(e: DataFrame, sampleRows: Int): DataFrame = {
    require(sampleRows > 0, s"sampleRows must be positive, got $sampleRows")
    val n1 = e.agg(count(lit(1)).as("__n"))
    e.crossJoin(broadcast(n1))
      .filter(hexBucket(col("vec_id").cast("string"))
        * col("__n") < lit(sampleRows.toLong * sampleBuckets))
      .drop("__n")
  }

  /** Training with the final centroid checkpoint exposed: a caller that
    * MATERIALIZES the returned assignment (cache/checkpoint) should then
    * release the centroid blocks via GraftShims.uncheckpoint — after
    * that, the un-materialized assignment plan must not be executed
    * again (its LogicalRDD leaves are gone). Earlier rounds' centroid
    * checkpoints are released inside the loop as soon as the next
    * round's (eager) checkpoint replaces them.
    *
    * Training runs on the [[trainSample]] capped sample (materialized —
    * its checkpoint is bounded by ~sampleRows and released before
    * return); the FINAL assignment is one broadcast pass over the full
    * corpus against the trained centroids. Init = the k lowest vec_ids
    * of the sample — identical to the historical `vec_id < k` whenever
    * the sample keeps everything and ids are dense from 0, which is
    * every sub-cap corpus.
    */
  private[graft] def kmeansAssignInternal(emb: DataFrame, k: Int,
      iters: Int, sampleRows: Int = AutoTrainSample)
      : (DataFrame, Option[DataFrame]) = {
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val smp = trainSample(e, resolveSample(sampleRows, k)).localCheckpoint()
    var centroids = smp.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cell"), col("v").as("c"))
      .localCheckpoint() // k rows — lets smp release even at iters = 1
    var checkpointed: Option[DataFrame] = Some(centroids)
    // argmin by AGGREGATION, not a window: min(struct(d, cell)) is the
    // same lexicographic pick as row_number over (d asc, cell asc) at
    // rn = 1 (d is pre-rounded, so the order is stable), but the
    // hash aggregate partial-combines map-side — the N·cells candidate
    // frame collapses to one row per vector BEFORE any exchange, where
    // the window shape would shuffle every candidate row (at ×100 /
    // 800 cells that is a 160M-row exchange per assignment pass)
    def argmin(rows: DataFrame) =
      rows.crossJoin(broadcast(centroids))
        .withColumn("d", l2sq(col("v"), col("c")))
        .groupBy("vec_id")
        .agg(min(struct(col("d"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m").getField("cell").as("cell"),
          col("m").getField("d").as("d"))
    for (_ <- 1 until iters) {
      val means = argmin(smp).join(smp, "vec_id")
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cell", "i").agg(round(avg(col("x")), 6).as("m"))
      // materialize the k×dims centroid table each update: without it
      // every downstream evaluation of the assignment (the means of the
      // NEXT round, plus each join side of an IVF search) re-runs the
      // whole previous assign+update chain from the scan up
      centroids = means
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ps"))
        .select(col("cell"), transform(col("ps"), p => p.getField("m")).as("c"))
        .localCheckpoint()
      // the new checkpoint is eager, so the previous round's blocks are
      // no longer reachable from any live plan — release them now
      checkpointed.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
      checkpointed = Some(centroids)
    }
    // the final full-corpus assignment reads only the trained centroid
    // checkpoint — the sample blocks are unreachable from here
    org.apache.spark.sql.GraftShims.uncheckpoint(smp)
    (argmin(e).orderBy("vec_id"), checkpointed)
  }

  /** The centroid table collapsed to ONE broadcastable row holding
    * array<struct<cell, c>> sorted by cell — the shape [[nearestCell]]
    * consumes. Lets an index write compute each vector's cell as a
    * narrow per-row expression over the scan instead of joining a
    * materialized assignment frame back to the corpus by vec_id
    * (guide §2.4: remove shuffles outright — the join shuffled the
    * corpus twice for a value derivable in the projection).
    */
  private[operators] def centroidArray(cent: DataFrame): DataFrame =
    cent.agg(array_sort(collect_list(struct(col("cell"), col("c")))).as("cs"))

  /** Per-row nearest-cell expression over a [[centroidArray]] column:
    * lexicographic array_min of struct(d, cell) — the SAME rounded-L2
    * metric and cell tiebreak as the aggregate argmin in
    * [[kmeansAssignInternal]]/[[assignWithCentroids]] (min(struct(d,
    * cell)) and array_min compare identically), so the produced cell is
    * bit-identical to the trained assignment against the same
    * centroids. `v` must already be the double-cast vector.
    */
  private[operators] def nearestCell(v: Column, cs: Column): Column =
    array_min(transform(cs, s =>
      struct(l2sq(v, s.getField("c")).as("d"), s.getField("cell").as("cell"))))
      .getField("cell")

  /** Assign vectors to their nearest centroid WITHOUT retraining — the
    * incremental-maintenance primitive: an appended batch folds into an
    * existing IVF index using the stored centroids (the same rounded-L2
    * metric and cell tiebreak as training), so append cost is one
    * broadcast-join pass over the batch, never a Lloyd's rerun.
    * `centroids` is a (cell, c: array<double>) frame, e.g. from
    * [[graft.operators.Sink.loadIvfCentroids]].
    */
  def assignWithCentroids(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // aggregate argmin (see kmeansAssignInternal): map-side combine
    // collapses the batch×cells candidates before the exchange
    e.crossJoin(broadcast(centroids))
      .withColumn("d", l2sq(col("v"), col("c")))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m").getField("cell").as("cell"),
        col("m").getField("d").as("d"))
  }

  /** Per-session trained-quantizer cache: Lloyd's runs once per
    * (session, corpus key, k, iters) and the materialized assignment is
    * reused by every subsequent query — an IVF index is trained once
    * and searched many times, so a bench (or a user) issuing repeated
    * top-k queries must not pay training per query. The key is the
    * caller's corpus identifier (e.g. the table directory); entries are
    * session-scoped because checkpointed blocks die with their session.
    * Index-staleness is the usual ANN contract: if the data under a key
    * changes mid-session, the caller owns retraining under a new key —
    * exactly like any deployed IVF index.
    */
  private val quantizerCache =
    new graft.BoundedLruCache[(SparkSession, String, Int, Int, Int), DataFrame](
      maxEntries = 16,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  /** Trained-centroid sibling of [[quantizerCache]], same keying — the
    * multi-probe path ranks centroids per query, so it needs the
    * centroid table alongside the assignment. Kept as a separate cache
    * (not a tuple value) so [[kmeansAssignCached]] callers are
    * untouched; Lloyd's is deterministic, so an assignment from one
    * training run and centroids from another are interchangeable.
    */
  private val centroidCache =
    new graft.BoundedLruCache[(SparkSession, String, Int, Int, Int), DataFrame](
      maxEntries = 16,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  /** Corpus row counts per (session, corpusKey): [[semDedupSized]]'s
    * cell geometry needs N, and an unconditional driver-side
    * `emb.count()` is one extra full-corpus scan per stage invocation
    * at 100 TB. Values are plain Longs — nothing to release — but
    * entries hold session references, so the cache joins the
    * evict/sweep registration below. Same staleness contract as the
    * quantizer cache: data changing under a key mid-session is the
    * caller's count-under-a-new-key problem.
    */
  private val corpusCountCache =
    new graft.BoundedLruCache[(SparkSession, String), java.lang.Long](
      maxEntries = 64, release = _ => ())

  /** N for sized-geometry derivation: one column-pruned count on the
    * keyless path, cached per corpusKey otherwise (the repeated-stage
    * path — corpus funnels call the sized stage per round on the same
    * corpus).
    */
  private[graft] def corpusCount(emb: DataFrame,
      corpusKey: Option[String]): Long = corpusKey match {
    case None => emb.count()
    case Some(ck) =>
      graft.SessionCaches.watch(emb.sparkSession)
      val key = (emb.sparkSession, ck)
      corpusCountCache.get(key).map(_.longValue()).getOrElse(
        corpusCountCache.putIfAbsent(key, emb.count()).longValue())
  }

  /** Test hook: the cached N for a (session, corpusKey), if any. */
  private[graft] def cachedCorpusCount(s: SparkSession,
      ck: String): Option[Long] =
    corpusCountCache.get((s, ck)).map(_.longValue())

  locally {
    graft.SessionCaches.register(
      evict = s => {
        quantizerCache.removeIf(_._1 eq s,
          releaseRemoved = !s.sparkContext.isStopped)
        centroidCache.removeIf(_._1 eq s,
          releaseRemoved = !s.sparkContext.isStopped)
        corpusCountCache.removeIf(_._1 eq s, releaseRemoved = false)
      },
      sweep = () => {
        quantizerCache.removeIf(_._1.sparkContext.isStopped,
          releaseRemoved = false)
        centroidCache.removeIf(_._1.sparkContext.isStopped,
          releaseRemoved = false)
        corpusCountCache.removeIf(_._1.sparkContext.isStopped,
          releaseRemoved = false)
      })
  }

  /** [[kmeansAssign]] through the trained-quantizer cache. Training
    * runs OUTSIDE the map lock (multi-job Lloyd's must not block
    * unrelated keys in the same hash bin); a lost putIfAbsent race
    * costs one redundant training, never a wrong result.
    */
  def kmeansAssignCached(emb: DataFrame, k: Int, iters: Int,
      corpusKey: String,
      sampleRows: Int = AutoTrainSample): DataFrame = {
    graft.SessionCaches.watch(emb.sparkSession)
    // key on the RESOLVED cap so auto and an equal explicit value share
    // one training (auto is pure in (k), so the key stays deterministic)
    val key = (emb.sparkSession, corpusKey, k, iters, resolveSample(sampleRows, k))
    quantizerCache.get(key).getOrElse {
      val (assigned, centroids) = kmeansAssignInternal(emb, k, iters, sampleRows)
      val trained = assigned.localCheckpoint()
      // the assignment checkpoint is eager; the centroid blocks behind
      // the (now superseded) training plan can be released
      centroids.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
      val winner = quantizerCache.putIfAbsent(key, trained)
      if (winner ne trained)  // lost the race: release the loser
        org.apache.spark.sql.GraftShims.uncheckpoint(trained)
      winner
    }
  }

  /** [[kmeansAssignCached]] that also returns the trained centroid
    * table through [[centroidCache]] — the multi-probe entry point.
    * A key present in one cache but not the other (e.g. ivfTopK
    * trained first) costs one redundant training; determinism makes
    * the mixed result identical.
    */
  private[operators] def kmeansAssignCachedWithCentroids(emb: DataFrame, k: Int,
      iters: Int, corpusKey: String,
      sampleRows: Int = AutoTrainSample): (DataFrame, DataFrame) = {
    graft.SessionCaches.watch(emb.sparkSession)
    val key = (emb.sparkSession, corpusKey, k, iters, resolveSample(sampleRows, k))
    (quantizerCache.get(key), centroidCache.get(key)) match {
      case (Some(a), Some(c)) => (a, c)
      case _ =>
        val (assigned, centOpt) = kmeansAssignInternal(emb, k, iters, sampleRows)
        val trainedA = assigned.localCheckpoint()
        val trainedC = centOpt.get // iters >= 2 enforced by callers
        val winA = quantizerCache.putIfAbsent(key, trainedA)
        if (winA ne trainedA)
          org.apache.spark.sql.GraftShims.uncheckpoint(trainedA)
        val winC = centroidCache.putIfAbsent(key, trainedC)
        if (winC ne trainedC)
          org.apache.spark.sql.GraftShims.uncheckpoint(trainedC)
        (winA, winC)
    }
  }

  /** IVF top-k: brute-force restricted to the query's k-means cell —
    * [[bucketedTopK]] with a real learned quantizer instead of the
    * label column.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      cells: Int = 8, iters: Int = 2,
      corpusKey: Option[String] = None,
      sampleRows: Int = AutoTrainSample): DataFrame = {
    // the assignment feeds BOTH sides of the search join — without a
    // materialization each side re-runs the full Lloyd's chain. Cached
    // when the caller names the corpus; checkpointed either way.
    val cellOf = corpusKey match {
      case Some(key) =>
        kmeansAssignCached(emb, cells, iters, key, sampleRows)
          .select("vec_id", "cell")
      case None =>
        val (assigned, centroids) = kmeansAssignInternal(emb, cells, iters, sampleRows)
        val cp = assigned.select("vec_id", "cell").localCheckpoint()
        centroids.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
        cp
    }
    val withCell = emb.join(cellOf, "vec_id")
    val q = withCell.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell").as("qcell"))
    val scored = q.join(withCell,
        col("qcell") === col("cell") && col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "cell", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** Multi-probe IVF top-k: each query searches its `nprobe` NEAREST
    * cells (ranked by rounded L2 to the trained centroids, cell-id
    * tiebreak) instead of only its own — the standard recall knob for
    * clustered corpora where true neighbors straddle a cell boundary.
    * Output carries `pn` (which probe found each hit), so recall
    * attribution is visible in the rows; nprobe=1 reduces to
    * [[ivfTopK]]'s candidate set.
    *
    * Shape: probes are queries × cells against the broadcast centroid
    * table; candidates join corpus on cell — fan-out ≤ nprobe/cells of
    * the corpus per query, never all-pairs. The probe list and the
    * assignment checkpoint are both eager and tiny, after which the
    * centroid blocks release (the keyless-ivfTopK pattern).
    */
  def ivfMultiProbeTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      cells: Int = 8, iters: Int = 2, nprobe: Int = 2,
      corpusKey: Option[String] = None): DataFrame = {
    require(iters >= 2, "multi-probe IVF needs trained centroids (iters >= 2)")
    // cached path: one Lloyd's training serves every nprobe setting
    // (and shares the key with ivfTopK) — a recall curve must not
    // retrain per point; the cache owns the checkpointed blocks
    val (assignedAll, centroids, cacheOwned) = corpusKey match {
      case Some(tag) =>
        val (a, c) = kmeansAssignCachedWithCentroids(emb, cells, iters, tag)
        (a, c, true)
      case None =>
        val (a, cOpt) = kmeansAssignInternal(emb, cells, iters)
        (a.localCheckpoint(), cOpt.get, false)
    }
    val assigned = assignedAll.select("vec_id", "cell")
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        toDouble(col("embedding")).as("qv"))
    val pw = Window.partitionBy("qid").orderBy(col("pd"), col("cell"))
    val probes = q.select("qid", "qv").crossJoin(broadcast(centroids))
      .withColumn("pd", l2sq(col("qv"), col("c")))
      .withColumn("pn", row_number().over(pw))
      .filter(col("pn") <= nprobe)
      .select("qid", "cell", "pn").localCheckpoint()
    if (!cacheOwned)
      org.apache.spark.sql.GraftShims.uncheckpoint(centroids)
    val withCell = emb.join(assigned, "vec_id")
    val scored = probes
      .join(broadcast(q.select("qid", "qe")), "qid")
      .join(withCell, "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cell", "pn", "cos")
      .orderBy("qid", "rnk")
  }

  /** Embedding-cosine near-dup pairs above a threshold, found via
    * sign-bit LSH banding (random-hyperplane LSH with the coordinate
    * axes as hyperplanes): each vector's 64-bit sign signature is cut
    * into `bands` chunks, and a pair is a candidate iff it collides on
    * at least one chunk. Pigeonhole: any pair whose signatures differ
    * in fewer than `bands` sign bits is guaranteed a candidate; high
    * cosine ⇒ few sign flips, so near-dups collide with high
    * probability. Only candidates get the exact cosine verification.
    *
    * Scale: no all-pairs join anywhere — the self-join is on
    * (band, 16-bit chunk value), so fan-out is bounded by band-bucket
    * collision counts, independent of any label column, and over-full
    * buckets star-link through their min id (same population cap as the
    * text LSH — see Dedup.cappedBandCandidates). Signature rows
    * carry (id, band, chunk) only; the 64-float embeddings rejoin after
    * candidate dedup. At larger corpora, raise `bands`/signature width
    * the same way SimHash text banding does (Dedup.simhashNearDups).
    */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.95,
      bands: Int = 4, dims: Int = 64): DataFrame = {
    require(dims % bands == 0, s"bands ($bands) must divide dims ($dims)")
    val w = dims / bands
    val chunk = (b: Int) => struct(lit(b).as("band"),
      array_join(transform(slice(col("embedding"), b * w + 1, w),
        x => when(x >= lit(0.0f), "1").otherwise("0")), "").as("bv"))
    val chunks = emb.select(col("vec_id"),
        explode(array((0 until bands).map(chunk): _*)).as("ch"))
      .select(col("vec_id"), col("ch.band").as("band"), col("ch.bv").as("bv"))
    // population-capped banding, same hazard and same fix as the text
    // LSH (Dedup.cappedBandCandidates): a degenerate sign pattern (e.g.
    // an all-positive embedding region) or a template cluster would
    // otherwise make one bucket a B² candidate island; over-cap buckets
    // star-link through their min vec_id, mirrored in the oracle
    val cand = Dedup.cappedBandCandidates(chunks.withColumnRenamed("vec_id", "doc_id"))
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** Per-group embedding centroids (mean pooling) in long format — one
    * row per (group, dimension): the class-centroid primitive behind
    * prototype classifiers and centroid-based data selection. Long
    * format keeps the oracle exact (no array/string round-trip);
    * callers needing vectors re-assemble with the same
    * sort-collect_list fold the k-means update uses.
    *
    * Shape: one posexplode (rows × dims) through a map-side-combined
    * avg keyed on (group, dim) — linear, groups × dims output rows.
    * The mean rounds to 6 to absorb fold-order ulp, as everywhere.
    */
  def groupCentroids(emb: DataFrame, group: String = "label"): DataFrame =
    emb.select(col(group), posexplode(toDouble(col("embedding"))).as(Seq("i", "x")))
      .groupBy(group, "i")
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n_vectors"))
      .orderBy(group, "i")

  /** Nearest-centroid label classification — the embedding-quality
    * probe (a good representation separates labels; near-random
    * accuracy means label structure is absent — the honest reading for
    * the synthetic gaussian corpus): every vector ranks the broadcast
    * per-label centroids by rounded cosine (label-id tiebreak) and the
    * per-label accuracy is one aggregate over the argmax. Centroids
    * come from the whole corpus (self included) — the non-LOO reduction
    * of "apply a trained classifier", as with
    * [[graft.operators.Classify.nbLangScores]].
    */
  def centroidClassify(emb: DataFrame): DataFrame = {
    val cents = groupCentroids(emb, "label")
      .groupBy(col("label").as("clabel"))
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ps"))
      .select(col("clabel"), expr("transform(ps, p -> p.m)").as("c"))
    val scored = emb.select(col("vec_id"), col("label"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col("embedding"), col("c")))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("clabel"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("clabel") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy", round(col("n_correct") / col("n_vectors"), 4))
      .select("label", "n_vectors", "n_correct", "accuracy")
      .orderBy("label")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster the corpus with the k-means coarse
    * quantizer, then prune within each cluster — a vector is dropped
    * when it has cosine ≥ `tau` with any higher-priority vector of the
    * same cell, priority = closer to the cell centroid (ties by
    * vec_id). This is the non-recursive variant of the paper's
    * per-cluster pruning: "similar to any higher-priority item" rather
    * than "similar to a surviving item" — deterministic, one join, and
    * strictly more aggressive (anything the recursive rule drops, this
    * drops too).
    *
    * Scale: the expensive comparison is confined to intra-cell pairs —
    * exactly the paper's cost model, O(Σ |cell|²) instead of O(N²).
    * Parallelism equals the cell count, so `cells` must grow with the
    * corpus (the paper runs 50k clusters on LAION); the quantizer
    * trains once per corpus via the per-session cache. Only (vec_id,
    * cell, rank) rows shuffle into the pair join; embeddings attach by
    * vec_id join on each side.
    *
    * Output: (vec_id, cell, d, rk, is_kept), one row per input vector.
    */
  def semDedup(emb: DataFrame, tau: Double = 0.95, cells: Int = 8,
      iters: Int = 2, corpusKey: Option[String] = None,
      sampleRows: Int = AutoTrainSample, hiRankCap: Int = 0): DataFrame = {
    val assigned = corpusKey match {
      case Some(key) => kmeansAssignCached(emb, cells, iters, key, sampleRows)
      case None =>
        val (a, centroids) = kmeansAssignInternal(emb, cells, iters, sampleRows)
        val cp = a.localCheckpoint()
        centroids.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
        cp
    }
    pruneWithinCells(emb, assigned, tau, cells, hiRankCap)
  }

  /** The pure rung-selection rule behind [[semDedupAuto]]:
    * cells = ⌈√N⌉ (the IVF sizing rule — cell population ≈ √N bounds
    * the intra-cell pair term at N·√N), Left(cells) = flat single-level
    * while cells ≤ `maxFlatCells` (flat assignment costs N·cells),
    * Right(coarse, fine) with coarse = fine = ⌈√cells⌉ above it
    * (assignment drops to N·2√cells; measured 3.1× faster at ×30 —
    * PLANS.md scale table). Pure so the boundary is unit-testable
    * without a session.
    */
  private[graft] def semDedupRung(n: Long,
      maxFlatCells: Int = 64): Either[Int, (Int, Int)] = {
    val cells = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    if (cells <= maxFlatCells) Left(cells)
    else {
      val side = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
      Right((side, side))
    }
  }

  /** Semantic dedup with the scale-safe plan as the DEFAULT: sizes the
    * quantizer from the corpus (one column-pruned count(), amortized by
    * the Lloyd's passes that follow) and routes through [[semDedup]] or
    * [[semDedupTwoLevel]] per [[semDedupRung]] — a caller no longer
    * opts in to the two-level rung, it arrives when the corpus needs
    * it. Same pruning semantics either way.
    */
  def semDedupAuto(emb: DataFrame, tau: Double = 0.95, iters: Int = 2,
      maxFlatCells: Int = 64, corpusKey: Option[String] = None,
      sampleRows: Int = AutoTrainSample): DataFrame =
    // N through the per-corpusKey count cache (the semDedupSized path):
    // a keyed repeat invocation derives its rung without re-scanning
    // the corpus — previously this path always paid the full count()
    semDedupRung(corpusCount(emb, corpusKey), maxFlatCells) match {
      case Left(cells) => semDedup(emb, tau, cells, iters, corpusKey, sampleRows)
      case Right((coarse, fine)) =>
        semDedupTwoLevel(emb, tau, coarse, fine, iters, sampleRows)
    }

  /** Semantic dedup at a FIXED CELL SIZE — the production layout for
    * the stage: cells = ⌈N/targetCellSize⌉, so the expected per-cell
    * population (and with it the intra-cell pair term, the one
    * super-linear cost of the ∝√N rung) stays CONSTANT as the corpus
    * grows — Σ|cell|² ≈ N·size, linear in N. Assignment routes flat
    * vs two-level by the same [[semDedupRung]] boundary (flat N·cells
    * until `maxFlatCells`, then coarse/fine √ split for
    * N·2√cells), and training rides the sampled trainer on both
    * levels, so no term of the stage scales with N × cells.
    *
    * `hiRankCap` bounds the pair join against quantizer skew: only the
    * `hiRankCap` highest-priority vectors of a cell (closest to its
    * centroid) act as dedup REFERENCES — a degenerate cell that
    * swallows a big corpus fraction costs pop·cap pairs, never pop².
    * Vectors past the cap can still be DROPPED, just not drop others
    * — a bounded under-drop, the same population-cap discipline as the
    * text LSH buckets ([[Dedup]]). 0 disables; the default 4× the
    * target size never bites on a balanced quantizer (population
    * concentrates around the target), so it is purely the skew bound.
    */
  def semDedupSized(emb: DataFrame, tau: Double = 0.95,
      targetCellSize: Int = 64, iters: Int = 2, maxFlatCells: Int = 64,
      corpusKey: Option[String] = None,
      sampleRows: Int = AutoTrainSample, hiRankCap: Int = -1): DataFrame = {
    require(targetCellSize > 0, s"targetCellSize must be > 0, got $targetCellSize")
    val cap = if (hiRankCap == -1) 4 * targetCellSize else hiRankCap
    // N via the per-corpusKey count cache: a keyed repeat invocation
    // (the funnel's per-round sized stage) derives its geometry without
    // re-scanning the corpus
    val cells = math.max(1, math.ceil(
      corpusCount(emb, corpusKey).toDouble / targetCellSize).toInt)
    if (cells <= maxFlatCells)
      semDedup(emb, tau, cells, iters, corpusKey, sampleRows, cap)
    else {
      val side = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
      semDedupTwoLevel(emb, tau, side, side, iters, sampleRows, cap)
    }
  }

  /** The SemDeDup pruning stage over an arbitrary cell assignment
    * (vec_id, cell, d): rank within cell by (distance, id), drop any
    * vector with cos ≥ tau against a lower-ranked cellmate. Shared by
    * the flat and two-level quantizer paths — the cell column is opaque
    * here, so a composite (coarse, fine) id works unchanged.
    */
  private def pruneWithinCells(emb: DataFrame, assigned: DataFrame,
      tau: Double, cells: Int, hiRankCap: Int = 0): DataFrame = {
    val byCell = Window.partitionBy("cell").orderBy(col("d"), col("vec_id"))
    val ranked = assigned.withColumn("rk", row_number().over(byCell).cast("long"))
    // per-vector self-norm computed ONCE: the pair cosine divides by the
    // two cached norms — the same IEEE values as folding both
    // self-products per pair (identical ops on identical inputs), at a
    // third of the per-pair fold work
    val vecs = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // the pair join's only equi-key is `cell` — `cells` distinct values
    // means `cells` tasks no matter the core count (and one fat cell is
    // one straggler). Salt it: lo rows take grp = rk mod G, hi rows
    // replicate G ways (rows × G of rank+vector — trivial next to the
    // pairwise stage), join on (cell, grp) → cells × G tasks, result
    // identical. G follows the session's parallelism.
    val g = math.max(1,
      emb.sparkSession.sparkContext.defaultParallelism / math.max(cells, 1))
    // the skew bound (see semDedupSized): only the cap highest-priority
    // rows of a cell act as references — pop·cap pairs, never pop²
    val hiBase = if (hiRankCap > 0)
      ranked.filter(col("rk") <= hiRankCap) else ranked
    val hi = hiBase.join(vecs, "vec_id")
      .select(col("cell").as("cell_a"), col("rk").as("rk_a"),
        col("v").as("ea"), col("nrm").as("na"))
      .withColumn("grp_a", explode(sequence(lit(0), lit(g - 1))))
    val lo = ranked.join(vecs, "vec_id")
      .select(col("vec_id").as("vid_b"), col("cell").as("cell_b"),
        col("rk").as("rk_b"), col("v").as("eb"), col("nrm").as("nb"))
      .withColumn("grp_b", pmod(col("rk_b"), lit(g.toLong)).cast("int"))
    val dropped = hi.join(lo,
        col("cell_a") === col("cell_b") && col("grp_a") === col("grp_b") &&
          col("rk_a") < col("rk_b"))
      .filter(round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4) >= tau)
      .select(col("vid_b").as("vec_id")).distinct()
      .withColumn("__dropped", lit(true))
    ranked.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("d"), col("rk"),
        col("__dropped").isNull.as("is_kept"))
      .orderBy("vec_id")
  }

  /** Per-parent Lloyd's: the [[kmeansAssignInternal]] recipe run
    * INDEPENDENTLY inside every parent cell in one distributed pass.
    * Centroid tables are keyed (pcell, cell) and the assignment joins on
    * pcell instead of cross-joining the full centroid set — with
    * coarse ≈ fine ≈ √cells, per-vector assignment work drops from
    * O(cells) to O(2√cells). Same determinism: init = the k lowest
    * vec_ids per parent, means rounded to 6dp, ties by cell id.
    */
  private def kmeansAssignWithin(parents: DataFrame, emb: DataFrame,
      k: Int, iters: Int, sampleRows: Int = AutoTrainSample): DataFrame = {
    val sr = resolveSample(sampleRows, k)
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .join(parents, "vec_id") // (vec_id, v, pcell)
    // per-parent capped training sample (the trainSample rule with n =
    // the PARENT population, folded in via one broadcast parent-count
    // frame): each parent trains its k fine cells on ≤ ~sr of its own
    // rows — training cost stops scaling with the parent population. A
    // sub-cap parent keeps every row, so small parents (every local
    // test corpus) train bit-identically to the unsampled form.
    val np = e.groupBy("pcell").agg(count(lit(1)).as("__np"))
    val smp = e.join(broadcast(np), "pcell")
      .filter(hexBucket(col("vec_id").cast("string"))
        * col("__np") < lit(sr.toLong * sampleBuckets))
      .drop("__np")
      .localCheckpoint()
    var centroids = smp
      .withColumn("rn", row_number().over(
        Window.partitionBy("pcell").orderBy("vec_id")))
      .filter(col("rn") <= k)
      .select(col("pcell"), (col("rn") - 1).as("cell"), col("v").as("c"))
      .localCheckpoint()
    var previous: Option[DataFrame] = Some(centroids)
    // aggregate argmin (see kmeansAssignInternal); pcell is functionally
    // determined by vec_id (one parent per vector), so grouping by both
    // keeps it in scope without changing the per-vector pick
    def argminOf(rows: DataFrame) =
      rows.join(centroids, "pcell")
        .withColumn("d", l2sq(col("v"), col("c")))
        .groupBy("vec_id", "pcell")
        .agg(min(struct(col("d"), col("cell"))).as("m"))
        .select(col("vec_id"), col("pcell"),
          col("m").getField("cell").as("cell"),
          col("m").getField("d").as("d"))
    for (_ <- 1 until iters) {
      val means = argminOf(smp).join(smp.select("vec_id", "v"), "vec_id")
        .select(col("pcell"), col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("pcell", "cell", "i").agg(round(avg(col("x")), 6).as("m"))
      centroids = means
        .groupBy("pcell", "cell")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ps"))
        .select(col("pcell"), col("cell"),
          transform(col("ps"), p => p.getField("m")).as("c"))
        .localCheckpoint()
      previous.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
      previous = Some(centroids)
    }
    // the final per-parent assignment scores the FULL population
    // against the (possibly sample-)trained fine centroids
    val out = argminOf(e).localCheckpoint()
    org.apache.spark.sql.GraftShims.uncheckpoint(smp)
    previous.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
    out
  }

  /** Two-level SemDeDup — the scale rung past flat IVF: coarse Lloyd's
    * over the corpus, then an independent fine Lloyd's INSIDE each
    * coarse cell, then the standard intra-cell pruning within
    * (coarse, fine). Flat IVF with cells ∝ √N makes both the assignment
    * (N·cells) and the pairing (N²/cells) terms N^1.5 — measured on the
    * ×30 probe; the two-level split keeps the pairing term identical
    * (total cells = coarse·fine) while cutting assignment to
    * N·(coarse + fine) = O(N·√cells). Same pruning semantics; cell ids
    * are the composite coarse·fine + fine index.
    */
  def semDedupTwoLevel(emb: DataFrame, tau: Double = 0.95,
      coarseCells: Int = 8, fineCells: Int = 8, iters: Int = 2,
      sampleRows: Int = AutoTrainSample, hiRankCap: Int = 0): DataFrame = {
    val fine = twoLevelAssign(emb, coarseCells, fineCells, iters, sampleRows)
    val composite = fine.select(col("vec_id"),
      (col("pcell") * fineCells + col("cell")).as("cell"), col("d"))
    pruneWithinCells(emb, composite, tau, coarseCells * fineCells, hiRankCap)
  }

  /** Two-level (coarse → fine-within-coarse) assignment with its
    * terminal checkpoint in a bounded session cache: the fine
    * assignment is EAGER ([[kmeansAssignWithin]] checkpoints it) and
    * every caller's result keeps reading from it, so an uncached call
    * pinned one corpus-assignment block set per evaluation for the
    * session lifetime — the vocabPrune-class leak. Keyed on the input
    * plan + geometry; deterministic Lloyd's makes cross-call reuse
    * exact (and a repeated semdedup/sampler evaluation skips both
    * Lloyd's passes entirely).
    */
  private val twoLevelCache =
    new graft.BoundedLruCache[(SparkSession, Int, Int, Int, Int, Long, Int, Int), DataFrame](
      maxEntries = 8,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  locally {
    graft.SessionCaches.register(
      evict = s => twoLevelCache.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => twoLevelCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def twoLevelAssign(emb: DataFrame, coarseCells: Int,
      fineCells: Int, iters: Int,
      sampleRows: Int = AutoTrainSample): DataFrame = {
    graft.SessionCaches.watch(emb.sparkSession)
    // each level resolves the auto cap against ITS OWN cell count
    val (srCoarse, srFine) =
      (resolveSample(sampleRows, coarseCells), resolveSample(sampleRows, fineCells))
    // semanticHash compares file sources by ROOT PATH only — fold the
    // file-level generation in so a same-path rewrite misses
    val key = (emb.sparkSession, emb.queryExecution.analyzed.semanticHash(),
      coarseCells, fineCells, iters,
      graft.CheckpointPool.planGeneration(emb), srCoarse, srFine)
    twoLevelCache.get(key).getOrElse {
      val (coarse, cCent) = kmeansAssignInternal(emb, coarseCells, iters, srCoarse)
      val coarseCp = coarse.select(col("vec_id"), col("cell").as("pcell"))
        .localCheckpoint()
      cCent.foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
      val fine = kmeansAssignWithin(coarseCp, emb, fineCells, iters, srFine)
      // fine is checkpointed — coarseCp is fully consumed
      org.apache.spark.sql.GraftShims.uncheckpoint(coarseCp)
      val winner = twoLevelCache.putIfAbsent(key, fine)
      if (winner ne fine)
        org.apache.spark.sql.GraftShims.uncheckpoint(fine)
      winner
    }
  }

  /** The m disjoint subvector views of the embedding column — the
    * product-quantization decomposition (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI). Slicing
    * happens BEFORE the double cast so each subspace pipeline is
    * byte-identical to running [[kmeansAssignInternal]] on a narrower
    * corpus.
    */
  private def subspaces(emb: DataFrame, m: Int, subDim: Int): Seq[(Int, DataFrame)] =
    (0 until m).map { s =>
      (s, emb.select(col("vec_id"),
        slice(col("embedding"), s * subDim + 1, subDim).as("embedding")))
    }

  /** Per-session trained-PQ cache, the [[quantizerCache]] twin: a PQ
    * index trains once per (session, corpus, geometry) and is searched
    * many times. Holds (codes, centroids), both localCheckpointed.
    */
  private val pqCache = new graft.BoundedLruCache[
    (SparkSession, String, Int, Int, Int, Int), (DataFrame, DataFrame)](
      maxEntries = 8,
      release = { case (codes, cents) =>
        if (!codes.sparkSession.sparkContext.isStopped) {
          org.apache.spark.sql.GraftShims.uncheckpoint(codes)
          org.apache.spark.sql.GraftShims.uncheckpoint(cents)
        }
      })

  locally {
    graft.SessionCaches.register(
      evict = s => pqCache.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => pqCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  /** Train (or fetch) the PQ index: per-subspace Lloyd's → one
    * (sub, vec_id, code, d) codes frame and one (sub, cell, c)
    * centroids frame, both eagerly materialized so repeated searches
    * (and the codes/search/recall query trio) pay training once per
    * (session, corpusKey, geometry).
    */
  private[graft] def pqTrained(emb: DataFrame, m: Int, subDim: Int, k: Int,
      iters: Int, corpusKey: Option[String]): (DataFrame, DataFrame) = {
    require(iters >= 2, "PQ needs trained centroids (iters >= 2)")
    def train(): (DataFrame, DataFrame) = {
      // the m subspace quantizers are INDEPENDENT — train them
      // concurrently (Spark schedules jobs from multiple threads
      // freely; each training materializes only its own checkpoints).
      // Serially, a keyless rebuild pays m × the per-subspace Lloyd's
      // latency, which is almost all scheduling overhead at small k —
      // the dominant cost of a two-tier index RETRAIN. Results are
      // bit-identical either way (trainings share nothing), and
      // Future.sequence preserves subspace order.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val parts = Await.result(
        Future.sequence(subspaces(emb, m, subDim).map { case (s, e) =>
          Future {
            val (assigned, cOpt) = kmeansAssignInternal(e, k, iters)
            (assigned.select(lit(s).as("sub"), col("vec_id"),
              col("cell").as("code"), col("d")),
              cOpt.get.select(lit(s).as("sub"), col("cell"), col("c")))
          }
        }), Duration.Inf)
      val codes = parts.map(_._1).reduce(_ unionByName _).localCheckpoint()
      val cents = parts.map(_._2).reduce(_ unionByName _).localCheckpoint()
      // both unions are eagerly materialized — the per-subspace training
      // checkpoints behind them can be released
      parts.foreach { case (_, c) =>
        org.apache.spark.sql.GraftShims.uncheckpoint(c)
      }
      (codes, cents)
    }
    corpusKey match {
      case None => train()
      case Some(ck) =>
        graft.SessionCaches.watch(emb.sparkSession)
        val key = (emb.sparkSession, ck, m, subDim, k, iters)
        pqCache.get(key).getOrElse {
          val trained = train()
          val winner = pqCache.putIfAbsent(key, trained)
          if (winner ne trained) {  // lost the race: release the loser
            org.apache.spark.sql.GraftShims.uncheckpoint(trained._1)
            org.apache.spark.sql.GraftShims.uncheckpoint(trained._2)
          }
          winner
        }
    }
  }

  /** PQ codes: each vector compressed to m sub-codes, one per subspace,
    * via the same deterministic Lloyd's as the IVF coarse quantizer
    * (k codes per subspace, `iters` rounds, 6dp rounding, ties by cell
    * id). Output (sub, vec_id, code, d) — 64 float dims become m small
    * ints, the 16-32× compression a 100 TB embedding corpus ships to
    * its search tier.
    */
  def pqCodes(emb: DataFrame, m: Int = 4, subDim: Int = 16, k: Int = 8,
      iters: Int = 2, corpusKey: Option[String] = None): DataFrame =
    pqTrained(emb, m, subDim, k, iters, corpusKey)._1.orderBy("sub", "vec_id")

  /** Asymmetric-distance (ADC) PQ top-k: per query, a lookup table of
    * squared L2 distances from its raw subvectors to every subspace
    * centroid (nQueries × m × k rows — tiny, broadcast), then each
    * database vector's approximate distance is the exact DECIMAL sum of
    * its m table entries. The corpus side of the join moves only
    * (sub, code, vec_id) ints — never embeddings — which is the whole
    * point of PQ at scale; ranking ties break by vec_id on exact
    * decimal distances.
    */
  def pqAdcTopK(emb: DataFrame, nQueries: Int = 10, kTop: Int = 3,
      m: Int = 4, subDim: Int = 16, k: Int = 8, iters: Int = 2,
      corpusKey: Option[String] = None): DataFrame = {
    val (codes, cents) = pqTrained(emb, m, subDim, k, iters, corpusKey)
    val qsub = subspaces(emb.filter(col("vec_id") < nQueries), m, subDim)
      .map { case (s, e) =>
        e.select(lit(s).as("sub"), col("vec_id").as("qid"),
          toDouble(col("embedding")).as("qv"))
      }.reduce(_ unionByName _)
    val luts = qsub.join(cents, "sub")
      .select(col("sub"), col("qid"), col("cell").as("code"),
        l2sq(col("qv"), col("c")).as("dist"))
    val scored = codes.join(broadcast(luts), Seq("sub", "code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("dist").cast("decimal(18,6)")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kTop)
      .select(col("qid"), col("rnk"), col("vec_id"),
        col("adist").cast("double").as("adc_dist"))
      .orderBy("qid", "rnk")
  }

  /** Two-stage retrieval, the production ANN serving shape: cheap PQ
    * ADC candidates (top `cand` per query) re-ranked by EXACT cosine
    * over the raw vectors to the final top `k`. Only candidates×dims
    * floats are touched in stage two — the full corpus never leaves
    * its int codes — and the rerank join is broadcast on the tiny
    * query/candidate side.
    */
  def pqRerankTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      cand: Int = 10, m: Int = 4, subDim: Int = 16, kc: Int = 8,
      iters: Int = 2, corpusKey: Option[String] = None): DataFrame = {
    val candidates = pqAdcTopK(emb, nQueries, cand, m, subDim, kc, iters, corpusKey)
      .select(col("qid"), col("vec_id"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rer = candidates
      .join(emb.select("vec_id", "embedding"), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    rer.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** Matryoshka-style truncated search (Kusupati et al. 2022, "MRL"):
    * cosine top-k over only the first `dims` dimensions — the cheap
    * first-stage retrieval an MRL-trained embedding enables (prefix
    * dims carry most of the signal; the synthetic gaussian corpus has
    * no such structure, so its recall gate measures the honest floor,
    * as with PQ/IVF).
    */
  def prefixTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      dims: Int = 16): DataFrame =
    bruteForceTopK(
      emb.select(col("vec_id"), slice(col("embedding"), 1, dims).as("embedding")),
      nQueries, k)

  /** Principal direction of the embedding corpus by two deterministic
    * power-iteration steps over the centered scatter matrix — the
    * spectral op behind PCA whitening / ABTT embedding post-processing
    * ("all-but-the-top"), done Spark-first: the 64×64 covariance
    * accumulates as ONE hash aggregate over per-row outer products (a
    * narrow flatten-transform projection, map-side combined to 4096
    * cells per partition — the corpus is touched exactly once and
    * never joined), and both matvec+normalize steps stay IN-PLAN as
    * joins over the 4096-cell / 64-row model frames. No driver-side
    * linear algebra, no .collect() of anything data-sized.
    *
    * Determinism (cross-engine): per-row products round to 8dp DECIMAL
    * before the fold-order-free sum; covariance is a RAW double tree
    * over those exact sums (IEEE ops on identical operands are
    * bit-equal — intermediate roundings are deliberately absent, see
    * the lattice note at `means`), matvec terms round to 10dp DECIMAL
    * before the carry, and normalized components round to 8dp — the
    * [[graft.operators.IndicatorsExt]] exact-sum contract. v₀ = 1/8
    * (exact) on every dimension; sign and values are therefore
    * bit-reproducible on any engine or partitioning.
    *
    * Output: one row per dimension with the unit loading after two
    * iterations and the Rayleigh eigenvalue estimate λ = v₁ᵀCv₁
    * (replicated per row — the natural frame shape).
    */
  def pcaPowerTop(emb: DataFrame): DataFrame = {
    val (_, v2, lambda) = pcaChain(emb)
    v2.crossJoin(broadcast(lambda))
      .select(col("j").as("dim"), col("vj").as("loading"), col("eigenvalue"))
      .orderBy("dim")
  }

  /** Per-dimension centering means over a `v: array<double>` frame:
    * (i, m = Σ round(x_i,8) / n_i, nn = n_i) with n_i carried as
    * count(*) per dimension. Exposed package-private so the
    * fixed-width invariant (n_i ≡ corpus row count for every i) stays
    * test-pinned — the r18 rewrite folded the separate count() job
    * into this aggregate on that assumption.
    */
  private[graft] def pcaMeans(e: DataFrame): DataFrame =
    meansFromScatter(pcaScatterMeans(e))

  /** ONE corpus pass for the whole PCA model state: the upper-triangle
    * scatter structs (j ≥ i) and the per-dimension centering terms
    * (tagged j = −1, the same DECIMAL(18,8) type) ride a single
    * explode + hash aggregate, so the corpus is scanned and exploded
    * once instead of twice (guide §1.2 step 1 — remove a full pass).
    * Output: (i, j, s = Σp, cnt); product cells ignore cnt, the mean
    * rows divide by it.
    */
  private[graft] def pcaScatterMeans(e: DataFrame): DataFrame =
    e.select(explode(expr(
      """concat(
        |  flatten(transform(v, (xi, i) -> transform(slice(v, i + 1, size(v) - i), (xj, jj) ->
        |    struct(i AS i, i + jj AS j,
        |           CAST(round(xi * xj, 8) AS DECIMAL(18,8)) AS p)))),
        |  transform(v, (x, i) -> struct(i AS i, -1 AS j,
        |    CAST(round(x, 8) AS DECIMAL(18,8)) AS p)))""".stripMargin)).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
      .groupBy("i", "j").agg(sum("p").as("s"), count(lit(1)).as("cnt"))

  /** The (i, m, nn) centering frame read off the fused scatter+means
    * aggregate — the same Σround(x_i,8) / count(*) division (over the
    * same DECIMAL sum and count) the standalone means pass computed.
    */
  private def meansFromScatter(sm: DataFrame): DataFrame =
    sm.filter(col("j") === -1)
      .select(col("i"), (col("s").cast("double") /
        col("cnt").cast("double")).as("m"),
        col("cnt").cast("double").as("nn"))

  /** The shared power-iteration chain behind [[pcaPowerTop]] and
    * [[abttPostProcess]]: (means(i, m), v2(j, vj) unit direction,
    * lambda(eigenvalue)).
    */
  private def pcaChain(emb: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Spread before the 4096× outer-product explode: a one-file corpus
    // would otherwise serialize the whole scatter chain onto one task
    // (measured 11.8 s of a 13.4 s query on the single-file sf0.1 scan).
    val e = Spread.spread(emb).select(toDouble(col("embedding")).as("v"))
    // scatter cells: s_ij = Σ round(x_i·x_j, 8)  (exact DECIMAL).
    // UPPER TRIANGLE ONLY (j ≥ i): IEEE multiplication is commutative,
    // so round(x_i·x_j, 8) = round(x_j·x_i, 8) term-for-term and the
    // mirrored cell sums are the SAME multiset of decimals — the
    // corpus-sized scatter explodes d(d+1)/2 = 2080 structs per row
    // instead of d² = 4096 (measured: the scatter aggregate is the one
    // hot stage of this chain; guide §2.3 "shuffle fewer bytes" — here
    // the saving is in the per-row explode + map-side partial agg).
    // The lower triangle is restored AFTER aggregation on the
    // model-sized (2080-row) frame, bit-identically.
    // scatter cells AND centering terms in ONE pass ([[pcaScatterMeans]]):
    // the fused (i, j, s, cnt) aggregate is 2080 + 64 rows — checkpoint
    // it once; cells and means are filters over it
    val sm = pcaScatterMeans(e).localCheckpoint()
    val cellsUpper = sm.filter(col("j") >= 0).select("i", "j", "s")
    val cells = cellsUpper.unionByName(
      cellsUpper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("s")))
    // column sums for centering: m_i = Σ round(x_i, 8) / n. NOTE the
    // division is deliberately UNROUNDED: the DECIMAL sums are the
    // determinism anchors, and IEEE ops on identical operands are
    // bit-equal cross-engine — whereas rounding here would park values
    // on a fine decimal lattice whose next rounding (the matvec's) hits
    // exact halfway cases that the two engines resolve differently
    // (Spark rounds the exact expansion, DuckDB rounds a scaled double).
    // n rides along as count(*) per dimension (every row contributes to
    // every i), so the chain no longer pays a separate count() job.
    // CONTRACT: embeddings are FIXED-WIDTH — per-dimension count(*)
    // equals the corpus row count only when every vector carries every
    // dimension (pinned by SimilaritySpec's means-count invariant); a
    // variable-width source would silently change the centering
    // divisor and must not ride this chain.
    val means = meansFromScatter(sm) // 64 rows off the checkpointed sm
    // the 4096-cell model frame feeds BOTH matvec steps — checkpoint it
    // eagerly so the corpus-sized scatter chain runs exactly once (the
    // block set is model-sized and lives until session end, the
    // keyless-ivfTopK precedent)
    val cov = cells
      .join(means.select(col("i"), col("m").as("mi"), col("nn")), "i")
      .join(means.select(col("i").as("j"), col("m").as("mj")),
        Seq("j")) // means reused under two aliases; 64-row broadcasts
      .withColumn("c",
        col("s").cast("double") / col("nn") - col("mi") * col("mj"))
      .select("i", "j", "c")
      .localCheckpoint()
    // one power step from vector frame v(j, vj) -> w(i, wi) as double
    def matvec(v: DataFrame): DataFrame = cov
      .join(broadcast(v), "j")
      .withColumn("t", round(col("c") * col("vj"), 10).cast("decimal(20,10)"))
      .groupBy("i").agg(sum("t").cast("double").as("wi"))
    // normalize w -> unit v (rounded 8; "+ 0.0" kills -0.0 — the
    // cross-engine signed-zero trap); norm crossJoins as one row. A
    // zero-variance corpus gives nrm = 0 — guard the quotient to 0.0
    // (null under default Spark, exception under ANSI) rather than
    // propagating a degenerate division
    def normalize(w: DataFrame): DataFrame = {
      val norm = w.agg(
        round(sqrt(sum(round(col("wi") * col("wi"), 10)
          .cast("decimal(20,10)")).cast("double")), 8).as("nrm"))
      w.crossJoin(broadcast(norm))
        .select(col("i").as("j"),
          when(col("nrm") =!= 0.0,
            round(col("wi") / col("nrm"), 8) + lit(0.0))
            .otherwise(lit(0.0)).as("vj"))
    }
    val v0 = spark.range(64).select(col("id").cast("int").as("j"),
      lit(0.125).as("vj"))
    val v1 = normalize(matvec(v0))
    val w2 = matvec(v1)
    val lambda = v1.join(w2, col("j") === col("i"))
      .agg(round(sum(round(col("vj") * col("wi"), 10).cast("decimal(20,10)"))
        .cast("double"), 6).as("eigenvalue"))
    (means, normalize(w2), lambda)
  }

  /** All-but-the-top embedding post-processing (Mu & Viswanath 2018):
    * every vector is centered and its projection on the corpus'
    * dominant direction removed — the cheap fix for the anisotropy
    * that makes raw embedding cosines bunch together. Consumes
    * [[pcaPowerTop]]'s chain; the whole transform is one 64× explode
    * joined against the broadcast 64-row model (means + direction),
    * re-aggregated per vector — linear, no corpus self-join.
    *
    * Output per vector: the pre/post L2 norms and the removed energy
    * fraction d²/‖x−μ‖² (rounded; `+ 0.0` guards the quotients).
    * Determinism: x, μ, v are identical doubles cross-engine; the
    * per-vector dot and norms fold 8dp-rounded DECIMAL terms (products
    * of arbitrary doubles — no lattice inputs, see the `means` note).
    */
  def abttPostProcess(emb: DataFrame): DataFrame = {
    val (means, v2, _) = pcaChain(emb)
    val model = means.join(v2, col("i") === col("j"))
      .select(col("i"), col("m"), col("vj").as("pc"))
    val parts = Spread.spread(emb)
      .select(col("vec_id"), posexplode(toDouble(col("embedding"))))
      .select(col("vec_id"), col("pos").as("i"), col("col").as("x"))
      .join(broadcast(model), "i")
      .withColumn("xc", col("x") - col("m"))
    val agg = parts.groupBy("vec_id").agg(
      sum(round(col("xc") * col("xc"), 8).cast("decimal(18,8)"))
        .cast("double").as("sq"),
      sum(round(col("xc") * col("pc"), 8).cast("decimal(18,8)"))
        .cast("double").as("d"))
    agg
      .withColumn("orig_norm", round(sqrt(col("sq")), 6))
      .withColumn("post_norm",
        round(sqrt(greatest(col("sq") - col("d") * col("d"), lit(0.0))), 6))
      .withColumn("removed_frac",
        // sq = 0 iff the vector equals the per-dimension means after
        // 8dp rounding — guard the quotient (null under default
        // Spark, exception under ANSI) to 0.0, mirrored in the oracle
        when(col("sq") =!= 0.0,
          round(col("d") * col("d") / col("sq"), 6) + lit(0.0))
          .otherwise(lit(0.0)))
      .select("vec_id", "orig_norm", "post_norm", "removed_frac")
      .orderBy("vec_id")
  }

  /** Exact squared-L2 top-k — the ground truth for [[pqAdcTopK]]'s
    * recall gate (cosine [[bruteForceTopK]] ranks a different metric).
    */
  def l2TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("dist", l2sq(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "dist")
      .orderBy("qid", "rnk")
  }
}
