package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over the documents table — the
  * training-data-pipeline surface (driver north star; SURVEY.md §7.4):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Determinism: every similarity primitive is built from md5 hex
  * strings (identical in Spark and DuckDB) and exact integer set
  * arithmetic; the only floats are single divisions (Jaccard), rounded
  * to 4 on both sides.
  *
  * Scale notes (100 TB): exact dedup is a hash-partition groupBy on the
  * fingerprint — embarrassingly parallel. The pairwise n-gram join is
  * the quadratic baseline and stays for verification only; the scale
  * path is MinHash+LSH, whose cost is rows × seeds for signatures plus
  * a bucket-join whose fan-out is bounded by band-collision rate —
  * near-linear, and the band join key (band index, band value) hash
  * partitions evenly since md5 minima are uniform. SimHash gives a
  * constant-width signature per doc; banding its 16-bit chunks bounds
  * the Hamming search the same way.
  */
object Dedup {

  /** Word-n-gram shingles per doc: (doc_id, s). `distinct = false`
    * skips the dedup shuffle — correct for duplicate-insensitive
    * consumers (min-aggregates: MinHash signatures, winnowing minima);
    * set semantics (Jaccard counting) need the default distinct.
    */
  private def spread(docs: DataFrame): DataFrame = Spread.spread(docs)

  def shingles(docs: DataFrame, n: Int = 3, distinct: Boolean = true): DataFrame = {
    val words = split(col("text"), " ")
    val grams = expr(
      s"""transform(sequence(1, size(w) - ${n - 1}),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")}))""".stripMargin)
    val raw = spread(docs).select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(grams).as("s"))
    if (distinct) {
      // fixed-width exchange + partition-local dedup instead of a plain
      // distinct(): hash partitioning on (doc_id, s) satisfies the
      // dedup aggregate's required clustering, so no second exchange —
      // and the reduce side keeps cluster-width tasks. A plain
      // distinct() lets AQE coalesce its reduce side by shuffle BYTES,
      // but shingle frames are CPU-heavy downstream (md5 polynomials,
      // verification joins); the byte-based coalesce was measured
      // leaving 28 of 32 cores idle on those stages. Width follows the
      // session's shuffle sizing (never below core count) so a cluster
      // deployment with shuffle.partitions in the thousands keeps its
      // per-task volume — a hard core-count width would concentrate a
      // corpus-scale gram stream into a handful of reducers.
      val spark = docs.sparkSession
      val np = math.max(spark.sparkContext.defaultParallelism,
        spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
      raw.repartition(np, col("doc_id"), col("s")).dropDuplicates()
    } else raw
  }

  /** Exact dedup by content hash: keeper = min doc_id per fingerprint. */
  def exact(docs: DataFrame): DataFrame = {
    val byFp = Window.partitionBy("fp")
    docs.withColumn("fp", md5(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(byFp))
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("is_dup", col("doc_id") =!= col("keeper"))
      .select("doc_id", "fp", "keeper", "n_copies", "is_dup")
      .orderBy("doc_id")
  }

  /** Canonical text normalization for fuzzy-exact dedup: lowercase,
    * strip everything but letters/digits/spaces, collapse whitespace
    * runs, trim. Kept to constructs with identical Java-regex/RE2
    * semantics so the oracle applies the same function.
    */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** [[exact]] over NORMALIZED text — the normalize→hash "fuzzy-exact"
    * pass production pipelines run before any near-dup stage: case,
    * punctuation, and whitespace variants of the same content collapse
    * to one fingerprint at hash-groupBy cost, leaving the expensive
    * LSH machinery only the genuinely paraphrased pairs.
    */
  def exactNormalized(docs: DataFrame): DataFrame =
    exact(docs.withColumn("text", normalizeText(col("text"))))

  /** Pairwise n-gram Jaccard near-dup pairs (quadratic baseline):
    * join docs on shared shingles, jaccard = |∩| / (|A|+|B|-|∩|).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs).localCheckpoint()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "na", "nb", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val minhashSeeds = 12
  val minhashBandSize = 3 // 4 bands of 3 → catches jaccard ≳ 0.5 pairs

  /** Mersenne prime 2^31-1: products (a·x + b) with a, x < P stay under
    * 2^62, so the universal-hash family evaluates exactly in 64-bit
    * integer arithmetic on both engines.
    */
  val minhashP = 2147483647L

  /** 12 fixed (a, b) parameter pairs for the h_k(x) = (a·x + b) mod P
    * family — arbitrary constants, shared verbatim with the oracle.
    */
  val minhashParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L), (134775813L, 1L),
    (1664525L, 1013904223L), (22695477L, 1L), (69069L, 362437L),
    (1583458089L, 945024L), (784588716L, 805306457L), (425612765L, 97L),
    (1203248318L, 11113L), (622729787L, 7369L), (141421356L, 2718281L))

  /** Base value per shingle: an 8-character ascii polynomial over the
    * md5 hex digest — one md5 per shingle, 32 bits of entropy, exact in
    * both engines (each term < 128^8 < 2^56).
    */
  private[graft] def shingleBase(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = md5(s)
    val x = (1 to 8).map(i => ascii(m.substr(i, 1)) * lit(math.pow(128, 8 - i).toLong))
      .reduce(_ + _)
    pmod(x.cast("long"), lit(minhashP))
  }

  /** MinHash signatures: sig_k = min over shingles of h_k(base(s)).
    * min is duplicate-insensitive → non-distinct shingles (no shuffle
    * before the aggregate).
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(shingles(docs, distinct = false))

  private def minhashSignaturesFrom(sh: DataFrame): DataFrame = {
    val withBase = sh.withColumn("x", shingleBase(col("s")))
    val aggs = minhashParams.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(minhashP))).as(s"h$k")
    }
    withBase.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Max population of one (band, band-value) bucket before candidate
    * generation switches from all-pairs to star-linking. 100 keeps
    * all-pairs exact for every natural bucket in the small-SF corpora
    * while bounding the measured sf0.1 hot bucket (~1.5k docs in one
    * 16-bit SimHash chunk value) to O(B) candidates instead of ~1.9M.
    */
  val lshBucketCap = 100

  /** Candidate pairs from banded signature rows (doc_id, band, bv),
    * with a population cap per (band, bv) bucket.
    *
    * Buckets at or under [[lshBucketCap]] emit all intra-bucket pairs —
    * exactly the classic banding. A bucket OVER the cap is, in a real
    * corpus, either a boilerplate/template cluster or a degenerate band
    * value (bit-biased SimHash chunks collect unrelated docs): all-pairs
    * there is a B² island that no banding bounds, the normal failure
    * mode of web-scale LSH dedup. Over-cap buckets emit STAR LINKS
    * instead — every member pairs with the bucket's min doc_id — so
    * candidates are O(B) per bucket and a genuine template cluster stays
    * connected through its hub for downstream cluster resolution
    * ([[dedupVerdicts]]). The documented recall tradeoff is pair-level
    * only: inside an over-cap bucket a pair is reported iff each side
    * verifies against the hub (near-identical template members do;
    * unrelated docs sharing a degenerate band value never did belong
    * together). The same cap logic is mirrored verbatim in the DuckDB
    * oracle CTEs, so capped outputs stay hash-checked at every SF.
    */
  private[graft] def cappedBandCandidates(bands: DataFrame,
      cap: Int = lshBucketCap): DataFrame = {
    val stats = bands.groupBy("band", "bv")
      .agg(count(lit(1)).as("bn"), min("doc_id").as("bmin"))
    val tagged = bands.join(stats, Seq("band", "bv"))
    val small = tagged.filter(col("bn") <= cap)
    val smallPairs = small.as("a").join(small.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // bmin is the bucket minimum, so doc_a < doc_b holds by construction
    val starLinks = tagged.filter(col("bn") > cap && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("doc_a"), col("doc_id").as("doc_b"))
    smallPairs.unionByName(starLinks).distinct()
  }

  /** Recall-preserving alternative to [[cappedBandCandidates]]'s star
    * links: over-cap buckets SUB-SPLIT on extra signature material
    * instead of collapsing to hub pairs.
    *
    * `bands` must carry, besides (doc_id, band, bv), an `ext` array
    * column of `maxDepth` extra key pieces (for SimHash chunk b: the
    * other three chunks; for MinHash band b: the other band values).
    * Each (doc, band) row descends the prefix chain
    * `bv, bv_e1, bv_e1_e2, …` and settles in its SHALLOWEST prefix
    * bucket whose population is ≤ cap — or the full-depth bucket when
    * none is. All-pairs are emitted within settled buckets only.
    * The choice is consistent across a bucket (prefixes nest, so docs
    * sharing a depth-d key share every ancestor's population), which
    * keeps the output deterministic and SQL-mirrorable.
    *
    * Why this preserves the pairs a user actually wants:
    *  - a DEGENERATE over-cap bucket (unrelated docs on a bit-biased
    *    band value) scatters across sub-keys — each sub-bucket falls
    *    under the cap fast and candidate count stays O(Σ small²);
    *  - a GENUINE template cluster agrees on the extra pieces too, so
    *    it rides to full depth intact and emits ALL its pairs — there
    *    the candidate count equals the true duplicate-pair count, i.e.
    *    output-bound work, not waste (a 500-doc boilerplate cluster
    *    yields its full ~125k pair list instead of 499 hub links).
    * The residual miss is a near-dup pair inside an over-cap bucket
    * whose members disagree on every prefix — such pairs are still
    * caught by any OTHER band they share under the cap (the standard
    * multi-band recall argument).
    *
    * Cost: one extra explode ((maxDepth+1)× band rows) and one extra
    * aggregate over (band, depth, key) — both linear; no B² island
    * anywhere. Scale shape identical to the star path.
    */
  private[graft] def subSplitBandCandidates(bands: DataFrame, maxDepth: Int,
      cap: Int = lshBucketCap): DataFrame = {
    val keyStructs = (0 to maxDepth).map { d =>
      val pieces = col("bv") +: (0 until d).map(j => col("ext")(j))
      struct(lit(d).as("depth"), concat_ws("_", pieces: _*).as("key"))
    }
    val keyed = bands
      .select(col("doc_id"), col("band"),
        explode(array(keyStructs: _*)).as("dk"))
      .select(col("doc_id"), col("band"),
        col("dk.depth").as("depth"), col("dk.key").as("key"))
    val counts = keyed.groupBy("band", "depth", "key").agg(count(lit(1)).as("bn"))
    // each (doc, band, depth) has exactly one key, so min(struct) picks
    // the shallowest eligible depth with its key
    val chosen = keyed.join(counts, Seq("band", "depth", "key"))
      .filter(col("bn") <= cap || col("depth") === maxDepth)
      .groupBy("doc_id", "band")
      .agg(min(struct(col("depth"), col("key"))).as("dk"))
      .select(col("doc_id"), col("band"),
        col("dk.depth").as("depth"), col("dk.key").as("key"))
    chosen.as("a").join(chosen.as("b"),
        col("a.band") === col("b.band") && col("a.depth") === col("b.depth") &&
          col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH candidate pairs (same band value in any band, bucket-capped —
    * see [[cappedBandCandidates]]) verified with exact Jaccard;
    * output = verified near-dup pairs.
    */
  /** Session-scoped cache of the verified MinHash pair list, keyed by
    * a caller-supplied corpus tag (the sf dir) — the trained-quantizer
    * precedent: the pair list, the estimator gate, and PageRank all
    * consume the IDENTICAL chain, so compute it once per (session,
    * corpus, threshold). Entries are localCheckpoint'd; SessionCaches
    * releases the blocks on tenant eviction or context stop.
    */
  private val pairsCache =
    new graft.BoundedLruCache[(SparkSession, String, String), DataFrame](
      maxEntries = 16,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  locally {
    graft.SessionCaches.register(
      evict = s => pairsCache.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => pairsCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  /** [[minhashLshPairs]] through the session pair cache. The chain runs
    * OUTSIDE the map lock; a lost putIfAbsent race costs one redundant
    * computation, never a wrong result.
    */
  def minhashLshPairsCached(docs: DataFrame, corpusKey: String,
      threshold: Double = 0.5): DataFrame = {
    graft.SessionCaches.watch(docs.sparkSession)
    val key = (docs.sparkSession, corpusKey, threshold.toString)
    pairsCache.get(key).getOrElse {
      val pairs = minhashLshPairs(docs, threshold).localCheckpoint()
      val winner = pairsCache.putIfAbsent(key, pairs)
      if (winner ne pairs)  // lost the race: release the loser's blocks
        org.apache.spark.sql.GraftShims.uncheckpoint(pairs)
      winner
    }
  }

  /** Distinct (doc_id, md5(n-gram)) frame through the same session
    * cache (key tag distinguishes it) — the containment chain reads it
    * four times, so it materializes once per (session, corpus, n).
    */
  private def shingleHashCached(docs: DataFrame, n: Int,
      corpusKey: String): DataFrame = {
    graft.SessionCaches.watch(docs.sparkSession)
    val key = (docs.sparkSession, corpusKey + "#shinglehash", n.toString)
    pairsCache.get(key).getOrElse {
      val sh = shingles(docs, n)
        .select(col("doc_id"), md5(col("s")).as("h")).localCheckpoint()
      val winner = pairsCache.putIfAbsent(key, sh)
      if (winner ne sh)
        org.apache.spark.sql.GraftShims.uncheckpoint(sh)
      winner
    }
  }

  /** [[simhashNearDups]] through the same session pair cache (key tag
    * distinguishes the families): the verified simhash pair list is
    * consumed by both the pair query and cluster resolution — in
    * production you compute the pair list ONCE and cluster it, you
    * don't re-mine pairs per consumer.
    */
  def simhashNearDupsCached(docs: DataFrame, corpusKey: String,
      maxDist: Int = 3): DataFrame = {
    graft.SessionCaches.watch(docs.sparkSession)
    val key = (docs.sparkSession, corpusKey + "#simhash", maxDist.toString)
    pairsCache.get(key).getOrElse {
      val pairs = simhashNearDups(docs, maxDist).localCheckpoint()
      val winner = pairsCache.putIfAbsent(key, pairs)
      if (winner ne pairs)
        org.apache.spark.sql.GraftShims.uncheckpoint(pairs)
      winner
    }
  }

  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5,
      fullRecall: Boolean = false): DataFrame = {
    // the signature table is materialized eagerly (localCheckpoint, not
    // cache) — the band self-join and the candidate verification each
    // read it from BOTH join sides, and concurrent stages racing a cold
    // cache recompute the whole shingle+aggregate subtree per side.
    // Signatures derive FROM the materialized distinct shingle table:
    // min is duplicate-insensitive, so the distinct set gives the same
    // minima as the raw multiset — and the verification needs the
    // distinct table anyway, so one shingle chain feeds both instead of
    // re-running the scan+split+md5 chain a second time
    val sh = shingles(docs).localCheckpoint()
    val sig = minhashSignaturesFrom(sh).localCheckpoint()
    val bands = minhashBandRows(sig)
    val nBands = minhashSeeds / minhashBandSize
    val cands =
      if (fullRecall) subSplitBandCandidates(bands, maxDepth = nBands - 1)
      else cappedBandCandidates(bands.drop("ext"))
    // verify candidates with exact jaccard: shared shingles per pair
    jaccardVerify(sh, cands, threshold)
  }

  /** Banded rows (doc_id, band, bv, ext) from a MinHash signature table
    * — one explode pass over sig, not a bands-way union: a union fans
    * the plan into one AQE stage per branch per join side, and before
    * the signature cache is materialized those stages race to recompute
    * the whole signature subtree. `ext` carries the other bands' values
    * for [[subSplitBandCandidates]].
    */
  private[graft] def minhashBandRows(sig: DataFrame): DataFrame = {
    val nBands = minhashSeeds / minhashBandSize
    def bandValue(b: Int) = concat_ws("_",
      (0 until minhashBandSize).map(j => col(s"h${b * minhashBandSize + j}")): _*)
    val bandStructs = (0 until nBands).map { b =>
      val others = (0 until nBands).filterNot(_ == b).map(bandValue)
      struct(lit(b).as("band"), bandValue(b).as("bv"), array(others: _*).as("ext"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"),
        col("bb.ext").as("ext"))
  }

  /** Exact-Jaccard verification of candidate pairs against a distinct
    * shingle table `sh` (doc_id, s) — shared by the batch LSH path and
    * the streaming near-dup runner so both verify through one plan.
    */
  private[graft] def jaccardVerify(sh: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame =
    jaccardVerifyAsym(sh, sh, cands, threshold)

  /** [[jaccardVerify]] with distinct per-side shingle tables — doc_a
    * resolves in `shA`, doc_b in `shB` (the incremental batch-vs-corpus
    * path, where the two id spaces come from different frames).
    */
  private[graft] def jaccardVerifyAsym(shA: DataFrame, shB: DataFrame,
      cands: DataFrame, threshold: Double): DataFrame = {
    val sizesA = shA.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sizesB = shB.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cands
      .join(shA.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(shB.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      .join(sizesA.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizesB.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental ingest dedup — the production dedup shape at 100 TB:
    * the corpus is never re-deduped per ingest; each NEW batch is
    * classified against the EXISTING corpus. Verdict per batch doc:
    * 'exact' (verbatim copy of an existing doc), 'near' (verified
    * n-gram Jaccard ≥ threshold against an existing doc, found via
    * asymmetric MinHash-LSH banding), or 'new'. `dup_of` is the min
    * existing doc for exact copies, else the best verified partner
    * (max rounded jaccard, min doc_id); `jaccard` is reported for near
    * verdicts only (exact is 1.0 by definition).
    *
    * Shape — everything scales with the BATCH, not the corpus:
    * exact is one md5 left join against the fp → min(doc_id) store;
    * near joins batch band rows against existing band rows on
    * (band, bv) — never batch×batch or existing×existing — and only
    * collision pairs reach the Jaccard verification. Existing-side
    * buckets are capped at [[lshBucketCap]] members (lowest doc_ids —
    * deterministic and oracle-mirrorable): a batch doc colliding with a
    * corpus-scale template cluster verifies against its cap lowest
    * members instead of the whole island, which still finds the
    * verdict (template members are mutually similar) at O(cap) cost.
    * A deployment persists the fp/signature/band tables and appends
    * each accepted batch; here they derive from `existing` per call.
    */
  /** The existing-corpus dedup index (exact-fingerprint store, shingle
    * table, capped band table), cached per (session, corpusKey). In
    * production this is a PERSISTED index the increment loop appends to
    * per batch — recomputing it for every incoming batch would make each
    * increment cost O(corpus), which is exactly what incremental dedup
    * exists to avoid. Bounded LRU; blocks released on eviction.
    */
  private val incIndexCache = new graft.BoundedLruCache[
    (SparkSession, String), (DataFrame, DataFrame, DataFrame)](
    maxEntries = 8,
    release = { case (fp, sh, bands) =>
      if (!fp.sparkSession.sparkContext.isStopped) {
        org.apache.spark.sql.GraftShims.uncheckpoint(fp)
        org.apache.spark.sql.GraftShims.uncheckpoint(sh)
        org.apache.spark.sql.GraftShims.uncheckpoint(bands)
      }
    })

  locally {
    graft.SessionCaches.register(
      evict = s => incIndexCache.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => incIndexCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  /** Content fingerprint rows (fp, doc_id) — the raw form of the exact
    * store. The cached index aggregates to fp → min(doc_id) up front;
    * the STORED index ([[Sink.writeDedupIndex]]) keeps the raw rows so
    * appends stay append-only and the min folds at classify time,
    * scoped to the batch's fingerprints.
    */
  private[graft] def exactFpRows(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("fp"), col("doc_id"))

  /** MinHash band rows (doc_id, band, bv) from a distinct shingle
    * table — the probe-side unit both the cached and stored index
    * paths band with.
    */
  private[graft] def bandRowsOf(sh: DataFrame): DataFrame =
    minhashBandRows(minhashSignaturesFrom(sh)).drop("ext")

  /** The [[lshBucketCap]] population cap over band rows: keep the cap
    * lowest doc_ids per (band, bv) bucket — deterministic, so the cap
    * computed at READ time over a stored band table equals the cap the
    * cached index bakes in at build time on the same rows.
    */
  private[graft] def capBandRows(bands: DataFrame): DataFrame =
    bands.withColumn("rn", row_number().over(
        Window.partitionBy("band", "bv").orderBy("doc_id")))
      .filter(col("rn") <= lshBucketCap).drop("rn")

  /** Verdict assembly shared by the cached ([[incrementalDedup]]) and
    * stored ([[Sink.classifyWithDedupIndex]]) incremental-dedup paths:
    * verify the LSH collision candidates by exact Jaccard, pick the
    * best partner per batch doc, and classify exact/near/new. `exFp`
    * must cover (at least) the batch's fingerprint space as
    * (fp, ex_exact=min existing doc); `exSh` must hold the FULL
    * distinct shingle set of every doc_b in `cands`. Verdicts are
    * per-doc independent given the index, so any partition of the
    * batch (micro-batch replay included) composes to the same result.
    * Returns an eagerly materialized frame (batch-sized) so callers
    * can release their transient inputs immediately.
    */
  private[graft] def classifyCore(bFp: DataFrame, exFp: DataFrame,
      bSh: DataFrame, exSh: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame = {
    val verified = jaccardVerifyAsym(bSh, exSh, cands, threshold)
    // best partner per batch doc, on the ROUNDED jaccard (cross-engine
    // deterministic), doc_id ascending tiebreak
    val best = verified
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_a").orderBy(desc("jaccard"), col("doc_b"))))
      .filter(col("rn") === 1)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("ex_near"),
        col("jaccard").as("near_jaccard"))
    bFp.join(exFp, Seq("fp"), "left")
      .join(best, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("ex_exact").isNotNull, lit("exact"))
          .when(col("ex_near").isNotNull, lit("near"))
          .otherwise(lit("new")))
      .withColumn("dup_of", coalesce(col("ex_exact"), col("ex_near")))
      .withColumn("jaccard",
        when(col("ex_exact").isNull, col("near_jaccard")))
      .select("doc_id", "verdict", "dup_of", "jaccard")
      .orderBy("doc_id")
      // eager: the verdict frame is batch-sized (tiny next to the index);
      // materializing it here lets every transient block behind it be
      // released NOW instead of pinning three block sets per keyless
      // call until the RDDs are GC'd
      .localCheckpoint()
  }

  def incrementalDedup(existing: DataFrame, batch: DataFrame,
      threshold: Double = 0.5, existingKey: Option[String] = None): DataFrame = {
    // the existing-corpus index: exact store (content hash → min doc),
    // shingle table (feeds signatures AND Jaccard verification — min is
    // duplicate-insensitive), capped band table the batch probes
    def buildIndex(): (DataFrame, DataFrame, DataFrame) = {
      val fp = exactFpRows(existing)
        .groupBy("fp").agg(min("doc_id").as("ex_exact"))
        .localCheckpoint()
      val sh = shingles(existing).localCheckpoint()
      val capped = capBandRows(bandRowsOf(sh)).localCheckpoint()
      (fp, sh, capped)
    }
    val (exFp, exSh, exCapped) = existingKey match {
      case None => buildIndex()
      case Some(ck) =>
        graft.SessionCaches.watch(existing.sparkSession)
        val key = (existing.sparkSession, ck)
        incIndexCache.get(key).getOrElse {
          val built = buildIndex()
          val winner = incIndexCache.putIfAbsent(key, built)
          if (winner ne built) {  // lost the race: release the loser
            org.apache.spark.sql.GraftShims.uncheckpoint(built._1)
            org.apache.spark.sql.GraftShims.uncheckpoint(built._2)
            org.apache.spark.sql.GraftShims.uncheckpoint(built._3)
          }
          winner
        }
    }
    val bFp = batch.select(col("doc_id"), md5(col("text")).as("fp"))
    val bSh = shingles(batch).localCheckpoint()
    val bBands = bandRowsOf(bSh)
    val cands = bBands.as("q").join(exCapped.as("e"),
        col("q.band") === col("e.band") && col("q.bv") === col("e.bv"))
      .select(col("q.doc_id").as("doc_a"), col("e.doc_id").as("doc_b"))
      .distinct()
    val result = classifyCore(bFp, exFp, bSh, exSh, cands, threshold)
    org.apache.spark.sql.GraftShims.uncheckpoint(bSh)
    if (existingKey.isEmpty) {
      // keyless path: the index was built for this one call — release
      // it (the cached path's index belongs to the LRU, which releases
      // on eviction)
      org.apache.spark.sql.GraftShims.uncheckpoint(exFp)
      org.apache.spark.sql.GraftShims.uncheckpoint(exSh)
      org.apache.spark.sql.GraftShims.uncheckpoint(exCapped)
    }
    result
  }

  /** SimHash near-dup pairs: band the 64-bit signatures into 4×16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 shares at
    * least one identical chunk → 100% recall at maxDist ≤ 3 for pairs
    * whose shared chunk's bucket is under [[lshBucketCap]]; over-cap
    * buckets star-link through their hub — see
    * [[cappedBandCandidates]]), join on chunk equality, verify with the
    * codegen'd graft.functions.HammingDistance expression.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3,
      fullRecall: Boolean = false): DataFrame = {
    // eager materialization: three consumers (chunk generation + two
    // verification join-backs) would race a cold cache. Unsorted — the
    // consumers are joins, so the output-contract sort stays out of
    // the checkpoint.
    val sig = simhashUnsorted(docs).localCheckpoint()
    // explode, not a 4-way union (see minhashLshPairs): one pass, one
    // AQE stage per join side instead of eight racing the cold cache
    val chunkStructs = (0 until 4).map { b =>
      val others = (0 until 4).filterNot(_ == b)
        .map(j => col("simhash").substr(j * 16 + 1, 16))
      struct(lit(b).as("band"), col("simhash").substr(b * 16 + 1, 16).as("bv"),
        array(others: _*).as("ext"))
    }
    val chunks = sig.select(col("doc_id"),
        explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("ch.band").as("band"), col("ch.bv").as("bv"),
        col("ch.ext").as("ext"))
    // star mode bounds over-cap buckets to hub links (pair recall
    // traded for O(B)); full-recall mode sub-splits them on the other
    // three chunks so template clusters keep their complete pair list
    val cands =
      if (fullRecall) subSplitBandCandidates(chunks, maxDepth = 3)
      else cappedBandCandidates(chunks.drop("ext"))
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
      .withColumn("dist",
        graft.functions.HammingDistance.hamming(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select("doc_a", "doc_b", "dist")
      .orderBy("doc_a", "doc_b")
  }

  /** Winnowing fingerprint near-dup pairs (Schleimer et al.,
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the
    * MOSS scheme): hash positioned lowercase word n-grams, slide a
    * w-window over each document's hash sequence, select the window
    * minimum — the guarantee is that any match of length ≥ w+n-1 words
    * between two documents shares at least one selected fingerprint.
    * Near-dup pairs are documents sharing ≥ `minShared` fingerprints.
    *
    * Scale shape: fingerprints are ~1 per w shingles (the density
    * bound), so the join side is a sparse (doc, fp) table; candidate
    * generation reuses [[cappedBandCandidates]] (a boilerplate
    * fingerprint shared by thousands of template docs star-links
    * instead of exploding), and the shared-count verification joins
    * only candidate pairs. Min over md5 hex strings is lexicographic in
    * both engines, so selection is cross-engine exact.
    */
  def winnowPairs(docs: DataFrame, n: Int = 5, w: Int = 4,
      minShared: Int = 2): DataFrame = {
    val words = split(lower(col("text")), " ")
    val grams = expr(
      s"""transform(sequence(1, size(wds) - ${n - 1}),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(wds, i + $j)").mkString(", ")}))""".stripMargin)
    val hashed = spread(docs).select(col("doc_id"), words.as("wds"))
      .filter(size(col("wds")) >= n)
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), md5(col("s")).as("h"))
    // window minimum per start position; starts whose window would run
    // past the end are dropped (both engines filter identically)
    val sel = hashed
      .withColumn("wmin", min("h").over(
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)))
      .withColumn("maxpos", max("pos").over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("maxpos") - (w - 1))
      .select(col("doc_id"), col("wmin").as("fp")).distinct()
      .localCheckpoint()
    val cand = cappedBandCandidates(
      sel.select(col("doc_id"), lit(0).as("band"), col("fp").as("bv")))
    cand
      .join(sel.select(col("doc_id").as("doc_a"), col("fp")), "doc_a")
      .join(sel.select(col("doc_id").as("doc_b"), col("fp")), Seq("doc_b", "fp"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("doc_a", "doc_b", "n_shared")
      .orderBy("doc_a", "doc_b")
  }

  /** Train/eval contamination check (decontamination): for every eval
    * document with at least `n` words, the count and share of its
    * distinct word n-grams that also appear anywhere in the training
    * corpus — the standard n-gram-overlap benchmark-leakage scan.
    * Shape: the train side collapses to a distinct gram set (bounded by
    * corpus text volume, hash-partitioned on the gram), the eval side
    * joins against it on the gram and re-aggregates per doc — two
    * shuffles, no pairwise doc×doc work anywhere, so cost is linear in
    * total grams regardless of how many documents collide.
    */
  /** Edit-distance near-dup pairs: prefix/suffix blocking + a
    * codegen'd `levenshtein` verify — the fuzzy-matching family member
    * that catches typo-level variants exact normalization and
    * shingle-set methods both miss (Levenshtein 1966; standard
    * entity-resolution blocking shape).
    *
    * Blocking bands: band 0 = the first `blockLen` chars of
    * lower(text), band 1 = the first `blockLen` of its REVERSE (a
    * suffix block, so an edit near one end still collides on the
    * other). Candidates route through [[cappedBandCandidates]] — the
    * same population cap + star-link discipline as the LSH families,
    * mirrored in the oracle CTE. The verify runs Spark's built-in
    * levenshtein (identical unit-cost semantics in DuckDB) on the
    * first `verifyLen` chars: O(verifyLen²) per candidate, constant
    * per pair, and only (doc_id, block) rows ever shuffle.
    */
  def levenshteinPairs(docs: DataFrame, maxDist: Int = 5,
      blockLen: Int = 12, verifyLen: Int = 64): DataFrame = {
    val nrm = docs.select(col("doc_id"), lower(col("text")).as("n"))
      .localCheckpoint()
    val bands = nrm.select(col("doc_id"), lit(0).as("band"),
        substring(col("n"), 1, blockLen).as("bv"))
      .unionByName(nrm.select(col("doc_id"), lit(1).as("band"),
        substring(reverse(col("n")), 1, blockLen).as("bv")))
    val cands = cappedBandCandidates(bands)
    cands
      .join(nrm.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(nrm.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("lev", levenshtein(
        substring(col("na"), 1, verifyLen), substring(col("nb"), 1, verifyLen)))
      .filter(col("lev") <= maxDist)
      .select("doc_a", "doc_b", "lev")
      .orderBy("doc_a", "doc_b")
  }

  def contamination(train: DataFrame, eval: DataFrame, n: Int = 8): DataFrame = {
    // non-distinct shingling: the per-(doc, gram) dedup would be thrown
    // away by the gram-level distinct anyway — one shuffle, not two
    val trainGrams = shingles(train, n, distinct = false).select("s").distinct()
      .withColumn("__hit", lit(1))
    // ONE pass over the eval grams: a left join against the distinct
    // train-gram set (at most one match per row, so row count is
    // preserved) marks hits, and a single per-doc aggregate folds the
    // total and the hit count together. The old sizes/hits split read
    // the eval shingling twice (forcing a localCheckpoint), aggregated
    // per doc twice, and re-joined — two extra Exchanges plus the
    // checkpoint materialization job (guide §2.3/§2.4).
    shingles(eval, n).join(trainGrams, Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total_ngrams"),
        count(col("__hit")).as("contaminated_ngrams"))
      .withColumn("contamination_ratio",
        round(col("contaminated_ngrams") / col("total_ngrams"), 4))
      .orderBy("doc_id")
  }

  /** Bloom-pre-filtered decontamination — the 100 TB shape of
    * [[contamination]], row-identical output (same oracle SQL). The
    * eval benchmark's distinct grams (the SMALL side — benchmarks are
    * MBs) build a `BloomFilter` on the driver; the TRAINING corpus —
    * petabyte-scale in production — is probed by the codegen'd
    * [[graft.functions.BloomMightContain]] INSIDE its narrow shingling
    * scan, so only matching grams plus an fpp fraction of false
    * positives ever reach a shuffle. The exact semi-join against the
    * surviving grams then removes the false positives: bloom filters
    * have no false negatives, so exactness is preserved with the train
    * side's shuffle volume cut from |train grams| to
    * ≈ |true hits| + fpp·|train grams|.
    */
  def contaminationBloom(train: DataFrame, eval: DataFrame, n: Int = 8,
      fpp: Double = 0.001): DataFrame = {
    val evalGrams = shingles(eval, n).localCheckpoint()
    val evalGramSet = evalGrams.select("s").distinct().localCheckpoint()
    val bloom = evalGramSet.stat.bloomFilter("s",
      math.max(evalGramSet.count(), 1L), fpp)
    // the filter now lives on the driver — the gram-set blocks are done
    org.apache.spark.sql.GraftShims.uncheckpoint(evalGramSet)
    // broadcast, not closure capture: fetched once per executor instead
    // of shipping MBs with every task
    val bloomBc = train.sparkSession.sparkContext.broadcast(bloom)
    val trainSurvivors = shingles(train, n, distinct = false)
      .filter(graft.functions.BloomMightContain.mightContain(col("s"), bloomBc))
      .select("s").distinct()
      .withColumn("__hit", lit(1))
    // same fused single-pass per-doc fold as [[contamination]]: the
    // left join against the distinct surviving-gram set preserves row
    // count, so one aggregate carries both the total and the hit count
    evalGrams.join(trainSurvivors, Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total_ngrams"),
        count(col("__hit")).as("contaminated_ngrams"))
      .withColumn("contamination_ratio",
        round(col("contaminated_ngrams") / col("total_ngrams"), 4))
      .orderBy("doc_id")
  }

  /** Cross-source n-gram leakage matrix: for every pair of sources, the
    * number of distinct word n-grams they share and the gram-set
    * Jaccard — the corpus-level twin of [[contamination]] (per-doc):
    * "how much of source A is also in source B" drives mixture and
    * provenance decisions before training.
    *
    * Shape: [[shingles]] keyed by source collapses the corpus to one
    * distinct (source, gram) set — linear in corpus grams, hash
    * partitioned on the gram — and the pair join fans out at most
    * (#sources choose 2) rows per gram, so a bounded source count keeps
    * the whole matrix linear at 100 TB. No doc×doc work anywhere.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 8): DataFrame = {
    // shingles is keyed by a `doc_id` column — feed it the source label
    // instead (it never assumes numeric ids), giving distinct
    // (source, gram) directly; checkpoint once for the two consumers
    val g = shingles(docs.select(col("source").as("doc_id"), col("text")), n)
      .select(col("doc_id").as("source"), col("s"))
      .localCheckpoint()
    val sizes = g.groupBy("source").agg(count(lit(1)).as("n"))
    g.as("a").join(g.as("b"),
        col("a.s") === col("b.s") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .withColumn("jaccard",
        round(col("shared_grams") / (col("na") + col("nb") - col("shared_grams")), 4))
      .select("src_a", "src_b", "shared_grams", "na", "nb", "jaccard")
      .orderBy("src_a", "src_b")
  }

  /** Duplicate-cluster resolution: near-dup PAIRS → per-doc cluster id
    * (the min doc_id in its connected component). Near-duplicate is not
    * transitive, but dedup policy treats the union of pairs as an
    * equivalence relation: keep one document per cluster.
    *
    * Implementation: iterative min-label propagation over the pair
    * graph — the standard distributed connected-components loop. Each
    * round is one shuffle join (labels across edges) + an aggregate;
    * rounds = O(component diameter). `localCheckpoint` cuts the growing
    * lineage each round (without it the plan doubles per iteration);
    * each round's blocks are explicitly released once superseded
    * (GraftShims.uncheckpoint). localCheckpoint blocks are not
    * replicated — on a cluster where executor loss mid-iteration must
    * be survivable, swap for reliable `checkpoint` against the
    * checkpoint dir (same call shape, adds HDFS round-trips).
    * The converged fixpoint (min reachable id) is unique, so the result
    * is deterministic regardless of execution order. Measured against
    * pointer-jumping variants (1 and 3 path-halving hops per round) on
    * the 105k-pair sf0.1 graph: the extra per-round joins cost more
    * than the saved rounds. This loop is the REFERENCE implementation
    * and is no longer on any default path — [[resolveClustersAdaptive]]
    * selects a driver union-find for bounded graphs and
    * [[resolveClustersStar]] (O(log d) rounds) beyond; all three are
    * spec-proven label-identical.
    */
  def resolveClusters(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // materialize the incoming pair pipeline ONCE before anything refers
    // to it twice: the symmetric union below has two branches, and
    // without this checkpoint each branch re-evaluates the whole
    // upstream candidate+verification chain inside one job (measured as
    // the bulk of dedup_clusters' r3 bench time)
    val p = pairs.select(col(aCol), col(bCol)).localCheckpoint()
    // localCheckpoint, not cache: the first round's join has several
    // consumers of the edge set (labels init, the join, the count) whose
    // jobs race a COLD cache and each recompute the whole upstream pair
    // pipeline (measured 6× concurrent recomputation of the simhash
    // chain, 210 s → 25 s cold at sf0.1); the eager checkpoint
    // materializes it exactly once and cuts the pair-pipeline lineage
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint()
    // edges is materialized — the raw pair blocks are no longer needed
    org.apache.spark.sql.GraftShims.uncheckpoint(p)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("nbr")), "dst")
        .groupBy(col("src").as("id")).agg(min("nbr").as("nbrMin"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .withColumn("next", least(col("cluster"), coalesce(col("nbrMin"), col("cluster"))))
        .localCheckpoint()
      changed = updated.filter(col("next") =!= col("cluster")).count()
      labels = updated.select(col("id"), col("next").as("cluster"))
    }
    // the returned labels read only the LAST round's checkpoint; the
    // edge set — the one full-data-sized copy — is no longer referenced
    // and is released eagerly. Per-round label checkpoints are
    // node-sized and left to the context cleaner.
    org.apache.spark.sql.GraftShims.uncheckpoint(edges)
    labels
  }

  /** Connected components by alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the diameter-bounded twin of [[resolveClusters]], same output
    * contract (id → component-min cluster label).
    *
    * The simple loop propagates the min ONE hop per round: a chain
    * component of diameter d costs d synchronous Spark jobs — fatal for
    * d ~ 10³ at scale. Star rounds rewire the edge set itself:
    * large-star points every node's larger neighbors at its neighborhood
    * min, small-star collapses the remaining smaller neighbors — the
    * component contracts toward its minimum at doubling speed, giving
    * O(log d) rounds (DedupSpec asserts ≤ 2·log₂ d + 4 on an
    * adversarial 128-chain, where the simple loop needs ~d). Each round
    * is two aggregate+join shuffles over the CURRENT edge set, which
    * only shrinks as stars form; `localCheckpoint` cuts the per-round
    * lineage growth exactly as in the simple loop.
    *
    * Both variants converge to the unique fixpoint (min reachable id),
    * so results are interchangeable. This is the [[dedupVerdicts]]
    * DEFAULT: its round count is diameter-safe (a chain component at
    * corpus scale cannot stall it), and the driver-synchronous part of
    * every round is count-gated — the set-equality convergence check
    * (two exceptAll scans) only runs when the edge count repeats, so
    * most rounds cost the two star shuffles plus one count on an
    * already-materialized frame. [[resolveClusters]] remains for graphs
    * measured to be shallow where its half-per-round cost wins locally.
    */
  def resolveClustersStar(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    resolveClustersStarWithRounds(pairs, aCol, bCol)._1

  private[graft] def resolveClustersStarWithRounds(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): (DataFrame, Int) = {
    // materialize the pair pipeline ONCE — ids and the edge init below
    // reference it three times, and each un-checkpointed reference would
    // re-run the whole upstream candidate chain (see resolveClusters)
    val p = pairs.select(col(aCol), col(bCol)).localCheckpoint()
    // canonical undirected edges (u > v), self-loops dropped — but
    // remember every id that appeared, so isolated ids keep a label.
    // ids is checkpointed too (node-sized): the final labels join reads
    // it after the loop, long after p's blocks are released.
    val ids = p.select(col(aCol).as("id"))
      .unionByName(p.select(col(bCol).as("id"))).distinct().localCheckpoint()
    var edges = p
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    org.apache.spark.sql.GraftShims.uncheckpoint(p)
    var rounds = 0
    var prevCnt = edges.count()
    var converged = prevCnt == 0L
    while (!converged) {
      rounds += 1
      // large-star: every node u (both edge directions) attaches its
      // strictly-larger neighbors — and itself — to m = min(N(u) ∪ {u})
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.filter(col("u") > col("m"))
          .select(col("u"), col("m").as("v")))
        .distinct()
      // small-star on the canonical (u > v) set: collapse each node's
      // smaller neighbors onto their min
      val minsS = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(minsS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(minsS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct().localCheckpoint()
      // count-gated convergence: both frames are DISTINCT sets, so equal
      // counts + an empty one-direction diff prove set equality. The
      // count is a near-free job on the just-materialized checkpoint;
      // the exceptAll scan only runs on rounds where the count repeats
      // (normally just the final confirming round).
      val cnt = small.count()
      converged = cnt == prevCnt && small.exceptAll(edges).isEmpty
      // that was the last read of the previous round's edge set —
      // release its checkpoint blocks
      org.apache.spark.sql.GraftShims.uncheckpoint(edges)
      edges = small
      prevCnt = cnt
    }
    // fixpoint is a star forest: each non-root has exactly one edge to
    // its root; roots and isolated ids label themselves
    val labels = ids
      .join(edges.select(col("u").as("id"), col("v").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
    (labels, rounds)
  }

  /** Size-adaptive cluster resolution — the selection policy over the
    * two distributed resolvers and a driver-local solve:
    *
    *  - a pair graph at or under `localEdgeMax` edges (default 2²² ≈
    *    4M pairs of longs, ~64 MB — same bounded-collect discipline as
    *    `Sink.upsertPartitioned`'s partition list) collapses to ONE
    *    collect + an in-memory union-find. Near-dup pair sets are
    *    usually tiny relative to their corpus (pairs ≈ duplicates, not
    *    rows), and the distributed loops pay a dozen synchronous
    *    round-trip jobs that driver-local union-find replaces with one
    *    — which also makes the query immune to per-job scheduling
    *    jitter under cluster contention.
    *  - larger graphs run [[resolveClustersStar]] — O(log diameter)
    *    rounds, unbounded capacity.
    *
    * Non-integral id columns skip the local path (the union-find is
    * Long-keyed). Labels are the unique fixpoint (component-min id)
    * on every path — DedupSpec asserts all three agree.
    */
  def resolveClustersAdaptive(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      localEdgeMax: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralTypes: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val integral = integralTypes.contains(pairs.schema(aCol).dataType) &&
      integralTypes.contains(pairs.schema(bCol).dataType)
    if (!integral) return resolveClustersStar(pairs, aCol, bCol)
    val p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .localCheckpoint()
    if (p.count() > localEdgeMax) {
      val out = resolveClustersStar(p, "a", "b")
      org.apache.spark.sql.GraftShims.uncheckpoint(p)
      return out
    }
    val edges = p.collect().map(r => (r.getLong(0), r.getLong(1)))
    org.apache.spark.sql.GraftShims.uncheckpoint(p)
    // union-find with path compression; second pass labels every id
    // with its component minimum (the same fixpoint the loops reach)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = parent.keys.toArray
    val compMin = scala.collection.mutable.HashMap.empty[Long, Long]
    ids.foreach { id =>
      val r = find(id)
      if (id < compMin.getOrElse(r, Long.MaxValue)) compMin(r) = id
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    ids.toSeq.sorted.map(id => (id, compMin(find(id))))
      .toDF("id", "cluster")
  }

  /** Per-document dedup verdicts from near-dup pairs: cluster id and
    * keeper flag (keeper = the cluster's min doc_id); documents in no
    * pair form singleton clusters. `docs ✂ is_keeper` is the
    * deduplicated corpus.
    *
    * Resolution runs [[resolveClustersAdaptive]]: bounded graphs solve
    * in one driver union-find job, larger graphs run the O(log d) star
    * rounds — so a chain-shaped component at corpus scale cannot turn
    * resolution into thousands of synchronous Spark jobs, and a small
    * graph never pays a dozen of them.
    */
  def dedupVerdicts(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = resolveClustersAdaptive(pairs).withColumnRenamed("id", "doc_id")
    docs.select("doc_id").join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("is_keeper", col("cluster") === col("doc_id"))
      .orderBy("doc_id")
  }

  /** Quality-aware cluster representative selection: instead of
    * [[dedupVerdicts]]' min-doc_id keeper, each near-dup cluster keeps
    * its HIGHEST-quality member ([[TextOps.qualityScore]], doc_id
    * tiebreak) — the policy production dedup actually wants (keep the
    * cleanest copy of the boilerplate family, not the first-crawled
    * one). Ranking runs over the ROUNDED 4dp score so the order is
    * engine-identical; the window partitions by cluster (bounded by
    * the largest near-dup family, not the corpus).
    */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val verdicts = dedupVerdicts(docs, pairs).select("doc_id", "cluster")
    val quality = TextOps.qualityScore(docs).select("doc_id", "quality_score")
    val w = Window.partitionBy("cluster")
      .orderBy(desc("quality_score"), col("doc_id"))
    verdicts.join(quality, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster", "quality_score", "keep")
      .orderBy("doc_id")
  }

  /** Asymmetric containment pairs — the QUOTE/subset detector Jaccard
    * misses: a short document embedded verbatim in a long one shares
    * most of ITS grams but few of the long one's, so
    * C = |A∩B| / min(|A|,|B|) is high while Jaccard is far below any
    * near-dup threshold (both are emitted so the gap is visible per
    * pair). Candidates come from shared distinct n-grams routed
    * through [[cappedBandCandidates]] — over-popular grams
    * (boilerplate) star-link through their min doc instead of pairing
    * a B² island, the same discipline as every LSH family here; the
    * exact intersection then computes only on candidate pairs.
    */
  def containmentPairs(docs: DataFrame, n: Int = 8,
      threshold: Double = 0.5, corpusKey: Option[String] = None): DataFrame = {
    // the distinct (doc_id, md5(gram)) frame feeds FOUR consumers
    // (candidates, sizes, both intersection sides) — without a
    // materialization each re-runs the scan+explode+distinct chain.
    // Cached path checkpoints it once per (session, corpus); the
    // hash stands in for the gram string everywhere (the same md5
    // identity banding already relies on)
    val sh = corpusKey match {
      case Some(tag) => shingleHashCached(docs, n, tag)
      case None => shingles(docs, n)
        .select(col("doc_id"), md5(col("s")).as("h"))
    }
    val cand = cappedBandCandidates(
      sh.select(col("doc_id"), lit(0).as("band"), col("h").as("bv")))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsz"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsz").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsz").as("nb")), "doc_b")
      .withColumn("containment",
        round(col("n_common") / least(col("na"), col("nb")), 4))
      .withColumn("jaccard",
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "n_common", "na", "nb", "containment", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Cluster-size distribution over the [[dedupVerdicts]] labels — the
    * dedup observability view (how much of the corpus sits in near-dup
    * families, and how big the worst boilerplate cluster is). Two hash
    * aggregates; the output is size-distribution-bounded.
    */
  def clusterSizeHistogram(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupVerdicts(docs, pairs)
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("sz") * col("n_clusters"))
      .orderBy("sz")

  /** 64-bit SimHash over distinct words, emitted as a 64-char bit
    * string (MSB-first nibble order of the word md5's first 16 hex
    * chars). sum ≥ 0 → '1'.
    *
    * Shape: each word maps to a 64-element ±1 array (a codegen'd
    * higher-order transform, no row explosion), and the per-document
    * signature is 64 scalar sums — algebraic aggregates with map-side
    * partial combine, so the shuffle carries 64 ints per (partition,
    * doc) instead of 64 rows per word (the naive explode would move
    * docs × words × 64 rows).
    */
  def simhash(docs: DataFrame): DataFrame =
    simhashUnsorted(docs).orderBy("doc_id")

  /** [[simhash]] minus its output-contract sort: the pair miner
    * consumes signatures by join/explode, so materializing a
    * rangepartition + global sort of the corpus-sized signature table
    * into its checkpoint bought nothing (guide §2.4 — an orderBy used
    * only to make OUTPUT deterministic does not belong in an
    * intermediate).
    */
  private[graft] def simhashUnsorted(docs: DataFrame): DataFrame = {
    val docWords = spread(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
    // bit arrays computed once per vocabulary word (Zipf: vocab ≪
    // doc×word pairs), then joined back — the join side is tiny and
    // broadcasts
    val vocab = docWords.select("word").distinct()
      .withColumn("h", md5(col("word")))
      .withColumn("wts", expr(
        """flatten(transform(sequence(1, 16), i ->
          |  transform(sequence(3, 0, -1), j ->
          |    (shiftright(cast(conv(substring(h, i, 1), 16, 10) as int), j) & 1) * 2 - 1)))""".stripMargin))
      .select("word", "wts")
    val sums = (0 until 64).map(b => sum(col("wts").getItem(b)).as(s"s$b"))
    docWords.join(vocab, "word")
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .withColumn("simhash",
        concat((0 until 64).map(b => when(col(s"s$b") >= 0, "1").otherwise("0")): _*))
      .select("doc_id", "simhash")
  }

  /** Exact repeated-substring spans — the dedup granularity between
    * whole-document exact dedup and document-level near-dup: find, per
    * document, the maximal word spans whose every `n`-gram also occurs
    * in at least `minDf` distinct documents (so a span is a verbatim
    * run shared across the corpus — boilerplate, licence headers,
    * templated passages). This is the distributed analog of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", 2022): where a single node
    * builds a suffix array, the cluster shape is a gram-frequency
    * shuffle plus a per-document gaps-and-islands merge.
    *
    * Plan: positions explode to (doc_id, pos, md5(gram)) — the join and
    * df aggregation move 128-bit hashes, never gram text; document
    * frequency is a distinct-(hash, doc) count (cross-document only: a
    * phrase repeated inside ONE doc is repetitionStats' job, not a
    * corpus-level duplicate); flagged positions semi-join back and
    * merge into maximal spans with the pos − row_number() island trick
    * inside a per-doc window. Every stage is key-partitioned (gram
    * hash, then doc_id) — no broadcast, no driver state; the gram-df
    * aggregate is the same linear shuffle the contamination check pays,
    * which is the inherent cost of EXACT (not sketched) substring
    * matching at corpus scale.
    *
    * Output: (doc_id, span_start, span_end, dup_grams) with 1-based
    * inclusive word indices, span_end = last flagged gram's start
    * + n − 1, dup_grams = number of flagged grams merged into the span.
    */
  def substringSpans(docs: DataFrame, n: Int = 8, minDf: Int = 2): DataFrame = {
    val words = split(col("text"), " ")
    val gramArr = expr(
      s"""transform(sequence(1, size(w) - ${n - 1}),
         |  i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")}))""".stripMargin)
    val grams = spread(docs).select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), posexplode(gramArr).as(Seq("p0", "s")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), md5(col("s")).as("h"))
    val flagged = grams.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("h")
    val hits = grams.join(flagged, Seq("h"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("isl", col("pos") - row_number().over(byDoc))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("span_start"),
        (max("pos") + (n - 1)).as("span_end"),
        count(lit(1)).as("dup_grams"))
      .select("doc_id", "span_start", "span_end", "dup_grams")
      .orderBy("doc_id", "span_start")
  }

  /** Suffix-array exact-substring dedup (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" shape,
    * re-expressed relationally): find, per document position, the
    * longest word-span that occurs at least twice anywhere in the
    * corpus, by sorting word-level suffixes and taking adjacent LCPs —
    * the classic longest-repeated-substring construction, which
    * catches long verbatim repeats BELOW the shingle-Jaccard radar
    * (a 30-word quote in two otherwise-unrelated documents moves
    * 3-gram Jaccard by ~3% but lights up here at rep_len 30).
    *
    * Construction, fully distributed — no global single-partition
    * sort anywhere:
    *   1. suffixes: every (doc_id, pos) with ≥ minLen words left,
    *      truncated to maxLen words (the standard truncated-suffix
    *      cap: reported spans saturate at maxLen).
    *   2. bucket = the suffix's first minLen words. Two suffixes with
    *      word-LCP ≥ minLen share their first minLen words, so every
    *      qualifying adjacency is WITHIN a bucket — sorting inside
    *      buckets is exactly as good as the global suffix sort for
    *      spans ≥ minLen, and each bucket sorts in parallel.
    *   3. singleton buckets (the overwhelming majority — ~92% of
    *      suffixes at sf0.01) are pruned by a bucket-count window
    *      before any LCP work.
    *   4. within a bucket, sort by (suffix, doc_id, pos); per suffix,
    *      rep_len = max(LCP(prev), LCP(next)) — the suffix-array
    *      identity: the longest repeat starting at a position is
    *      realized against a sort-adjacent suffix. LCP is the count
    *      of k with equal k-prefixes (prefix equality is monotone).
    *
    * Scale: the shuffle is one hash-partition by bucket; per-bucket
    * work is O(B log B) sort + O(B·maxLen²) LCP, parallel across
    * buckets. A pathological O(N)-row boilerplate bucket (a corpus
    * where every document shares one minLen-word prefix) would
    * serialize into one straggler sort task; `bucketCap` bounds it
    * with the LSH population-cap pattern: members of an over-cap
    * bucket are by construction duplicated at ≥ minLen (they all
    * share their first minLen words with ≥ bucketCap others), so
    * they are emitted with rep_len = minLen WITHOUT sorting — the
    * straggler becomes a narrow projection. Under-reporting is the
    * documented cap semantics (the true repeat may be longer); the
    * default cap is far above any bucket the fixtures produce, so
    * normal corpora take the exact path everywhere.
    *
    * Output, per document with any duplicated span: the longest
    * duplicated span's length, position, and text, plus the count of
    * duplicated suffix positions.
    */
  /** Default suffix-bucket population cap — mirrored verbatim in the
    * oracle SQL; far above any bucket the test fixtures produce, so
    * it only engages on genuinely pathological boilerplate corpora.
    */
  val suffixBucketCap: Int = 100000

  def suffixRepeats(docs: DataFrame, minLen: Int = 5,
      maxLen: Int = 20, corpusKey: Option[String] = None,
      bucketCap: Int = suffixBucketCap): DataFrame = {
    val hits = suffixHitsMaybeCached(docs, minLen, maxLen, corpusKey, bucketCap)
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(desc("rep_len"), col("pos"))
    hits
      .withColumn("max_rep_len", max("rep_len").over(Window.partitionBy("doc_id")))
      .withColumn("n_dup_positions", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("max_rep_len"), col("n_dup_positions"),
        col("pos").as("top_pos"),
        concat_ws(" ", expr("slice(sw, 1, rep_len)")).as("top_span"))
      .orderBy("doc_id")
  }

  /** [[suffixHits]] through the session cache: the repeats report, the
    * scrub, and the per-source rollup all consume the same mined hit
    * stream — one bucket-sort pass per (session, corpus, params).
    */
  private def suffixHitsCached(docs: DataFrame, minLen: Int, maxLen: Int,
      corpusKey: String, bucketCap: Int): DataFrame = {
    graft.SessionCaches.watch(docs.sparkSession)
    val key = (docs.sparkSession, corpusKey + "#suffixhits",
      s"$minLen:$maxLen:$bucketCap")
    pairsCache.get(key).getOrElse {
      val hits = suffixHits(docs, minLen, maxLen, bucketCap).localCheckpoint()
      val winner = pairsCache.putIfAbsent(key, hits)
      if (winner ne hits)
        org.apache.spark.sql.GraftShims.uncheckpoint(hits)
      winner
    }
  }

  private def suffixHitsMaybeCached(docs: DataFrame, minLen: Int,
      maxLen: Int, corpusKey: Option[String], bucketCap: Int): DataFrame =
    corpusKey match {
      case Some(tag) => suffixHitsCached(docs, minLen, maxLen, tag, bucketCap)
      case None => suffixHits(docs, minLen, maxLen, bucketCap)
    }

  /** The per-position duplicated-span stream behind [[suffixRepeats]]
    * and [[suffixScrub]]: (doc_id, pos, sw, rep_len) for every suffix
    * whose longest duplicated prefix reaches minLen.
    *
    * The per-bucket sort orders by the WORD ARRAY (element-wise
    * lexicographic), not the space-joined suffix string: array order
    * places max-LCP neighbors adjacently for ANY token bytes, while
    * the joined-string order only coincides with it when every token
    * character sorts above the 0x20 separator — a token containing a
    * control character (tab) would break string-order adjacency and
    * silently under-report rep_len. Both engines compare
    * element-wise, shorter-prefix-first, so the shared-oracle
    * contract holds on arbitrary input.
    */
  private def suffixHits(docs: DataFrame, minLen: Int,
      maxLen: Int, bucketCap: Int): DataFrame = {
    val sfx = spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= minLen)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, size(w) - ${minLen - 1})")).as("pos"),
        col("w"))
      .select(col("doc_id"), col("pos"),
        expr(s"slice(w, pos, $maxLen)").as("sw"))
      .withColumn("bucket", concat_ws(" ", expr(s"slice(sw, 1, $minLen)")))
    val byBucket = Window.partitionBy("bucket")
    val ordered = Window.partitionBy("bucket")
      .orderBy(col("sw"), col("doc_id"), col("pos"))
    // LCP(sw, other) = length of the leading run of equal elements —
    // identical to "number of k with equal k-prefixes" (prefix
    // equality is monotone in k). Folded ELEMENT-WISE with a
    // short-circuit flag: the old per-k `slice(sw,1,k) = slice(other,
    // 1,k)` form allocated two fresh arrays and compared O(k) elements
    // at every k (O(maxLen²) work + 2·maxLen allocations per neighbor)
    // for the same count; this is one O(maxLen) pass with no
    // allocations (guide §1.2 step 2: per-task work — this fold is the
    // hot expression of the bucket-sort stage). Null neighbor (bucket
    // edge) → 0 via the outer coalesce, as before.
    def lcp(other: String): org.apache.spark.sql.Column = coalesce(expr(
      s"""aggregate(sequence(1, least(size(sw), size($other))),
         |  named_struct('eq', true, 'c', 0),
         |  (acc, k) -> IF(acc.eq AND element_at(sw, k) = element_at($other, k),
         |    named_struct('eq', true, 'c', acc.c + 1),
         |    named_struct('eq', false, 'c', acc.c)),
         |  acc -> acc.c)""".stripMargin), lit(0))
    val counted = sfx
      .withColumn("bn", count(lit(1)).over(byBucket))
      .filter(col("bn") >= 2) // same shuffle key: count + lag share it
    // exact path: per-bucket sort + adjacent LCP. bn is constant per
    // bucket, so whole buckets route one way and sort-adjacency
    // within a surviving bucket is untouched by the split.
    val exact = counted
      .filter(col("bn") <= bucketCap)
      .withColumn("pw", lag("sw", 1).over(ordered))
      .withColumn("nw", lead("sw", 1).over(ordered))
      .withColumn("rep_len",
        greatest(lcp("pw"), lcp("nw")).cast("int"))
      .filter(col("rep_len") >= minLen)
      .select("doc_id", "pos", "sw", "rep_len")
    // over-cap path: every member shares its first minLen words with
    // ≥ bucketCap others, so it is duplicated at ≥ minLen by
    // construction — emit rep_len = minLen with NO sort (the
    // boilerplate straggler becomes a projection). The exchange under
    // both branches is the same bucket hash-partition; Spark reuses it.
    val capped = counted
      .filter(col("bn") > bucketCap)
      .select(col("doc_id"), col("pos"), col("sw"),
        lit(minLen).cast("int").as("rep_len"))
    exact.unionByName(capped)
  }

  /** Scrub the duplicated spans [[suffixRepeats]] finds — the removal
    * step of the suffix-array dedup pipeline (Lee et al. 2021 remove
    * the repeats they locate; this operator emits the cleaned corpus).
    * Every position covered by some duplicated span of ≥ minLen words
    * is dropped (the aggressive variant: ALL occurrences go, not
    * all-but-one — boilerplate shouldn't survive anywhere), and the
    * surviving words rejoin in order.
    *
    * Shape: the hit stream explodes to flagged word positions
    * (bounded by words-per-doc × span overlap), distinct, anti-joined
    * against the positional word stream, then one per-doc ordered
    * re-assembly — every stage keys on doc_id after the bucket
    * shuffle the hit mining already paid.
    */
  def suffixScrub(docs: DataFrame, minLen: Int = 5,
      maxLen: Int = 20, corpusKey: Option[String] = None,
      bucketCap: Int = suffixBucketCap): DataFrame = {
    val flagged = suffixHitsMaybeCached(docs, minLen, maxLen, corpusKey, bucketCap)
      .select(col("doc_id"),
        explode(expr("sequence(pos, pos + rep_len - 1)")).as("fp"))
      .distinct()
    val words = spread(docs)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("wpos"), col("col").as("word"))
    val kept = words.join(flagged,
      words("doc_id") === flagged("doc_id") && col("wpos") === col("fp"),
      "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(wpos, word))), x -> x.word)"))
        .as("cleaned_text"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** Per-source rollup of [[suffixScrub]] — the boilerplate-burden
    * report: how many tokens the span scrub removes from each source,
    * how many documents it touches, and how many it empties outright.
    * The number a data-mix owner reads before deciding which source
    * needs upstream cleaning. One join + one grouped aggregate on top
    * of the scrub.
    */
  def suffixScrubStats(docs: DataFrame, minLen: Int = 5,
      maxLen: Int = 20, corpusKey: Option[String] = None,
      bucketCap: Int = suffixBucketCap): DataFrame = {
    val scrub = suffixScrub(docs, minLen, maxLen, corpusKey, bucketCap)
      .select("doc_id", "n_words", "n_removed")
    docs.select("doc_id", "source")
      .join(scrub, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("tokens_total"),
        sum("n_removed").as("tokens_removed"),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("docs_touched"),
        sum(when(col("n_removed") === col("n_words"), 1L).otherwise(0L))
          .as("docs_emptied"))
      .withColumn("reduction_pct",
        round(col("tokens_removed") / col("tokens_total"), 4))
      .orderBy("source")
  }

  /** MinHash estimator quality gate: for every LSH-confirmed pair, the
    * Jaccard ESTIMATE from signature agreement (matching components /
    * K) next to the exact distinct-shingle Jaccard and the absolute
    * error — the measurement that justifies (or indicts) the signature
    * width K, the same gate family as the IVF/PQ recall queries. One
    * signature self-join over the already-verified pair list; exact
    * integer match counts, one division, rounded.
    */
  def minhashJaccardEstimate(docs: DataFrame, threshold: Double = 0.5,
      corpusKey: Option[String] = None): DataFrame = {
    val k = minhashParams.size
    val pairs = (corpusKey match {
      case Some(tag) => minhashLshPairsCached(docs, tag, threshold)
      case None => minhashLshPairs(docs, threshold)
    }).select("doc_a", "doc_b", "jaccard")
    val sig = minhashSignatures(docs)
    val sa = sig.toDF(sig.columns.map(c => if (c == "doc_id") "doc_a" else c + "_a"): _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == "doc_id") "doc_b" else c + "_b"): _*)
    val matches = (0 until k)
      .map(i => when(col(s"h${i}_a") === col(s"h${i}_b"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("est", round(matches / lit(k.toDouble), 4))
      .withColumn("abs_err", round(abs(col("est") - col("jaccard")), 4))
      .select("doc_a", "doc_b", "jaccard", "est", "abs_err")
      .orderBy("doc_a", "doc_b")
  }
}
