package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet sink operators (SURVEY.md §2.1 S5/S6) — the engine
  * equivalents of the reference's row-at-a-time insert
  * (/root/reference/fetch_yfinance.py:21-34) and bulk upsert
  * (/root/reference/fetch_and_store_multi.py:244-248). Batching and
  * vectorized encoding are native to the Parquet writer; what the sink
  * layer owns is LAYOUT — the partitioning and in-file ordering that
  * make downstream reads cheap.
  *
  * Layout contract for the stocks table at scale:
  *  - `partitionBy(symbol)` → partition pruning turns per-symbol scans
  *    (the reference's `WHERE symbol=?`, SURVEY §2.2 P2) into
  *    directory-level pruning;
  *  - `sortWithinPartitions(date)` → parquet row-group min/max stats
  *    prune date ranges (P3/P4), and window scans are pre-sorted.
  * At 100 TB, symbol alone may under- or over-partition; the grid
  * becomes (symbol-bucket, year) with the same sort contract.
  */
object Sink {

  /** Write bars partitioned by symbol, date-sorted within files. */
  def writeStocks(df: DataFrame, path: String): Unit =
    df.repartition(col("symbol"))
      .sortWithinPartitions("symbol", "date")
      .write
      .mode("overwrite")
      .partitionBy("symbol")
      .parquet(path)

  /** Upsert-then-write snapshot rewrite: merge updates into the stored
    * table and replace it (the plain-parquet stand-in for a
    * transactional MERGE; at scale this becomes dynamic partition
    * overwrite of only the touched partitions).
    */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame): Unit = {
    val exists = pathExists(spark, path)
    val merged = if (exists) {
      Merge.upsert(spark.read.parquet(path), updates)
    } else updates
    // write to a temp location then swap, so the source is never read
    // and overwritten in the same job. The swap is the crash-recoverable
    // rename-aside (never delete-then-rename: Hadoop rename signals
    // failure by returning false, and an unchecked false after the
    // delete would lose the only live copy).
    val tmp = path + "__tmp"
    writeStocks(merged, tmp)
    if (exists) checkedSwap(spark, tmp, path, "upsertInto")
    else {
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
        s"upsertInto: rename($tmp, $dst) failed — new data remains at $tmp")
    }
  }

  /** Write bars to a (symbol, year)-partitioned layout, date-sorted
    * within files — the grid [[upsertPartitioned]] merges into. Year is
    * derived from the date column; reads get two-level directory pruning
    * (`WHERE symbol=? AND date BETWEEN` prunes to the touched dirs).
    */
  def writeStocksPartitioned(df: DataFrame, path: String,
      overwriteMode: String = "static"): Unit =
    df.withColumn("year", year(col("date")))
      .repartition(col("symbol"), col("year"))
      .sortWithinPartitions("symbol", "date")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", overwriteMode)
      .partitionBy("symbol", "year")
      .parquet(path)

  /** Partition-pruned upsert — the scale path [[upsertInto]]'s scaladoc
    * promises, demonstrated: merge `updates` into a (symbol, year)
    * partitioned table rewriting ONLY the touched partitions.
    *
    * The reference's production cadence is a small daily increment into
    * a years-deep store (/root/reference/fetch_and_store_multi.py:244-248
    * upserts one fetch batch per run); a snapshot rewrite reads and
    * rewrites the whole table for that sliver. Here:
    *  1. the touched (symbol, year) set comes off the updates — an
    *     aggregate over partition COLUMNS only, collected to the driver
    *     (bounded by partition count, never by data);
    *  2. existing rows are read back under an explicit partition-value
    *     filter, so the scan prunes to touched directories (file listing
    *     + parquet footers of everything else are never opened);
    *  3. the merged slice is written with dynamic partition overwrite —
    *     only partitions present in the written frame are replaced;
    *     untouched partition files are never read, never rewritten,
    *     byte-identical after the merge (SinkSpec asserts both).
    * Cost is proportional to the updated slice, not the table.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame): Unit = {
    if (!pathExists(spark, path)) {
      writeStocksPartitioned(updates, path)
      return
    }
    val touched = updates.select(col("symbol"), year(col("date")).as("year"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .toSeq
    val merged = Merge.upsert(prunedTouchedRead(spark, path, touched), updates)
    writeStocksPartitioned(merged, path, overwriteMode = "dynamic")
  }

  /** Read back ONLY the given (symbol, year) partitions — an explicit
    * partition-value filter, so the scan prunes to touched directories
    * (SinkSpec asserts `PartitionFilters` in the executed plan).
    */
  private[graft] def prunedTouchedRead(spark: SparkSession, path: String,
      touched: Seq[(String, Int)]): org.apache.spark.sql.DataFrame = {
    val pruneFilter = touched
      .groupBy(_._1).toSeq
      .map { case (s, ys) =>
        col("symbol") === s && col("year").isin(ys.map(_._2): _*)
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    spark.read.parquet(path).filter(pruneFilter).drop("year")
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The 100 TB layout made concrete: a bucketed, per-bucket-sorted
    * stocks table. Reading it back hash-distributes by symbol from
    * STORAGE — a `PARTITION BY symbol` window or a symbol-keyed join
    * plans with no Exchange (SinkSpec asserts the executed plan), which
    * on a cluster is the difference between a shuffle of the whole
    * table and none. One file per bucket keeps Spark's
    * one-sorted-file-per-bucket requirement so bucket info stays
    * usable.
    */
  def writeStocksBucketed(df: DataFrame, table: String, buckets: Int = 8): Unit =
    df.repartition(buckets, col("symbol"))
      .write
      .mode("overwrite")
      .bucketBy(buckets, "symbol")
      .sortBy("symbol", "date")
      .saveAsTable(table) // managed table in the session warehouse

  /** S7 CSV export (the reference's S3 path is a manual CSV dump +
    * `aws s3 cp`, /root/reference/README.md:99-107 — no object store in
    * this container, so the path is any Hadoop-FS URI; s3a:// works
    * unchanged on a cluster with the S3 connector on the classpath).
    * Headered, one file per partition; doubles round-trip exactly
    * (shortest-repr printing).
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read back an [[exportCsv]] export with an explicit schema (CSV has
    * no types; inferring would re-scan and can widen types).
    */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSONL export — the LLM-training-data interchange format (one JSON
    * object per line, one file per partition; sharded .jsonl is what
    * tokenizer/loader pipelines consume). Same Hadoop-FS path semantics
    * as [[exportCsv]] (s3a:// works unchanged on a cluster).
    */
  def exportJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read back an [[exportJsonl]] export with an explicit schema —
    * skipping inference avoids the extra full scan AND pins types
    * (inference would widen e.g. int-valued doubles).
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Reject side-output sink (SURVEY §2.1 S9 / §2.8 Q4): quality
    * rejects land next to the main table, partitioned the same way.
    */
  def writeRejects(df: DataFrame, path: String): Unit =
    df.withColumn("errors", concat_ws(",", col("errors")))
      .write.mode("append").partitionBy("symbol").parquet(path)

  /** Persist a trained IVF index — the production "train once, store,
    * serve many" shape: the cell assignment lands PARTITIONED BY cell
    * WITH the vectors co-located in the cell partitions (so a probe is
    * a partition-pruned scan that already carries the embeddings — no
    * join back against the corpus-sized embedding table at serve time)
    * and the trained centroid table lands beside it. Serving never
    * retrains: [[searchIvfIndex]] loads centroids (a cells-sized
    * broadcast) and scans only the probed partitions.
    *
    * The overwrite is forced to STATIC partition-overwrite semantics:
    * a retrain must replace the WHOLE assignment directory, or cells
    * absent from the new base would keep stale appended rows from the
    * previous index generation under a dynamic session default.
    */
  def writeIvfIndex(emb: DataFrame, dir: String, cells: Int = 8,
      iters: Int = 2, corpusKey: Option[String] = None): Unit = {
    require(iters >= 2, "a stored IVF index needs trained centroids (iters >= 2)")
    // training is once-per-corpus by design (the writeIvfPqIndex
    // contract): with a corpusKey the quantizer comes from the session
    // cache — shared with ivfTopK and every other index build on the
    // same key — and a rebuild pays only the pivot and the writes. The
    // cache OWNS those checkpoints; release them only on the keyless
    // (train-fresh) path.
    val cent = (corpusKey match {
      case Some(ck) =>
        Similarity.kmeansAssignCachedWithCentroids(emb, cells, iters, ck)._2
      case None => Similarity.kmeansAssignInternal(emb, cells, iters)._2.get
    })
    // the cell is a NARROW per-row expression over the scan (argmin
    // against the broadcast trained centroids — bit-identical to the
    // cached assignment frame, which is itself the same argmin over the
    // same final centroids): the write pays ONE exchange (the cell
    // repartition below) instead of three (assignment shuffle + corpus
    // join + repartition — guide §2.4).
    // repartition by cell BEFORE the partitioned write: each task then
    // holds whole cells and every cell lands as ONE file. Without it,
    // every shuffle task writes a sliver into every cell directory —
    // tasks × cells files, and at cells ∝ corpus the serve-time file
    // listing dominates search (measured ×100 probe: 36.8 s → the
    // one-file-per-cell layout serves the same probe in ~1 s).
    // the model-sized centroid artifact is independent of the
    // corpus-sized assignment write — overlap them (guide §2.6: submit
    // independent jobs concurrently so the small job back-fills the
    // big one's tail); the manifest still lands only after BOTH parts
    // exist, so a reader never sees a manifest ahead of its content
    val centF = scala.concurrent.Future {
      writeCentroidArtifact(cent, s"$dir/centroids")
    }(scala.concurrent.ExecutionContext.global)
    try {
      withNearestCell(emb.select("vec_id", "embedding"), cent)
        .select("vec_id", "embedding", "cell")
        .repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell").parquet(s"$dir/assignment")
    } finally scala.concurrent.Await.ready(
      centF, scala.concurrent.duration.Duration.Inf)
    centF.value.get.get // surface an artifact-write failure
    writeIndexManifest(spark = emb.sparkSession, dir = dir,
      fields = Seq("kind" -> "ivf", "cells" -> cells.toString))
    // a full (re)write is a new generation — tombstones against the
    // REPLACED rows must not mask the new content
    clearTombstones(emb.sparkSession, dir)
    if (corpusKey.isEmpty)
      org.apache.spark.sql.GraftShims.uncheckpoint(cent)
  }

  /** Fixed-cell-SIZE geometry: cells = ⌈N/targetCellSize⌉ — the
    * production sizing rule for every IVF-family build. A fixed cell
    * COUNT makes per-cell population grow with the corpus (probe scans
    * grow ∝ N); a fixed cell SIZE keeps every probed partition
    * constant-sized as the corpus grows, so serving cost is pinned by
    * the geometry knob instead of the data. One column-pruned count on
    * the keyless path; with a corpusKey, N comes from the shared
    * per-corpus count cache ([[Similarity.corpusCount]]) — a keyed
    * build whose corpus was already counted (a sized semdedup stage, a
    * sibling sized build) derives its geometry without another scan.
    */
  def sizedCells(emb: DataFrame, targetCellSize: Int,
      corpusKey: Option[String] = None): Int = {
    require(targetCellSize > 0, s"targetCellSize must be > 0, got $targetCellSize")
    math.max(1, math.ceil(
      Similarity.corpusCount(emb, corpusKey).toDouble / targetCellSize).toInt)
  }

  /** [[writeIvfIndex]] at a fixed cell SIZE (cells = ⌈N/size⌉, see
    * [[sizedCells]]). Returns the resolved cell count (it also lands in
    * the manifest, the geometry every maintenance op reads back).
    */
  def writeIvfIndexSized(emb: DataFrame, dir: String,
      targetCellSize: Int = 512, iters: Int = 2,
      corpusKey: Option[String] = None): Int = {
    val cells = sizedCells(emb, targetCellSize, corpusKey)
    writeIvfIndex(emb, dir, cells, iters, corpusKey)
    writeIndexManifest(emb.sparkSession, dir, Seq("kind" -> "ivf",
      "cells" -> cells.toString,
      "target_cell_size" -> targetCellSize.toString))
    cells
  }

  /** [[writeIvfSq8Index]] at a fixed cell SIZE. */
  def writeIvfSq8IndexSized(emb: DataFrame, dir: String,
      targetCellSize: Int = 512, iters: Int = 2,
      corpusKey: Option[String] = None): Int = {
    val cells = sizedCells(emb, targetCellSize, corpusKey)
    writeIvfSq8Index(emb, dir, cells, iters, corpusKey)
    writeIndexManifest(emb.sparkSession, dir, Seq("kind" -> "ivfsq8",
      "cells" -> cells.toString,
      "target_cell_size" -> targetCellSize.toString))
    cells
  }

  /** [[writeIvfPqIndex]] at a fixed cell SIZE (coarse tier only — the
    * PQ codebook geometry m/subDim/k is subspace-shaped, not
    * corpus-shaped).
    */
  def writeIvfPqIndexSized(emb: DataFrame, dir: String,
      targetCellSize: Int = 512, iters: Int = 2,
      m: Int = 4, subDim: Int = 16, k: Int = 8,
      corpusKey: Option[String] = None): Int = {
    val cells = sizedCells(emb, targetCellSize, corpusKey)
    writeIvfPqIndex(emb, dir, cells, iters, m, subDim, k, corpusKey)
    writeIndexManifest(emb.sparkSession, dir, Seq("kind" -> "ivfpq",
      "cells" -> cells.toString, "m" -> m.toString,
      "subDim" -> subDim.toString, "k" -> k.toString,
      "target_cell_size" -> targetCellSize.toString))
    cells
  }

  /** The sized layout's maintenance contract: when the manifest carries
    * `target_cell_size` (the index was built by a `writeIvf*Sized`),
    * a maintenance RETRAIN re-derives cells = ⌈N_union/size⌉ instead of
    * freezing the stored cell count — the fixed-size invariant (cell
    * population ≈ size, the linear-at-scale property) survives the
    * index's own growth. Appends never resize (they fold into the
    * frozen geometry); only the retrain branch, which rewrites the
    * whole tree anyway, re-sizes.
    */
  private def manifestTargetCellSize(spark: SparkSession,
      dir: String): Option[Int] =
    readIndexManifest(spark, dir).flatMap(_.get("target_cell_size"))
      .flatMap(_.toIntOption)

  /** Stored-artifact generation stamp: (max mtime, file count, total
    * bytes) of the data files under `path`, folded to one Long. A
    * retrain REWRITES the artifact files (new stamp); an append never
    * touches them — so (dir, generation) keys a safe reuse of the
    * loaded-and-pivoted frame across calls. One FS listing, no parquet
    * opened.
    *
    * The stamp alone is NOT collision-free: a retrain that rewrites the
    * same number of bytes within one mtime tick (second-granularity
    * object stores) reproduces the old stamp. The cache key therefore
    * also folds in the manifest's `write_id` (a per-write nonce, see
    * [[writeIndexManifest]]) — every full index write changes it, so a
    * same-stamp rewrite still misses; appends never rewrite the
    * manifest, so they keep reusing the loaded frame as before.
    */
  private def artifactGeneration(spark: SparkSession, path: String): Long = {
    var mt = 0L; var n = 0L; var bytes = 0L
    forEachDataFile(spark, path) { f =>
      mt = math.max(mt, f.getModificationTime); n += 1; bytes += f.getLen
    }
    if (n == 0 && !pathExists(spark, path)) -1L
    else (mt * 31 + n) * 31 + bytes
  }

  /** The ONE recursive tree walk behind [[artifactGeneration]],
    * [[countDataFiles]] and [[cellFileCounts]]: visits every data file
    * (skips _SUCCESS / hidden), no-op on a missing tree. FS metadata
    * only — never opens a file, never runs a Spark job.
    */
  private def forEachDataFile(spark: SparkSession, path: String)(
      visit: org.apache.hadoop.fs.LocatedFileStatus => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) visit(f)
    }
  }

  /** Loaded stored-artifact cache: serving and maintenance call
    * [[loadIvfCentroids]]/[[loadPqCentroids]] on EVERY operation (a
    * drop-cadence maintenance replay reloads the same frozen artifacts
    * a dozen times), and each load is a read + group + pivot job over
    * an unchanged file set. Keyed by the artifact's generation stamp
    * so a retrain (rewritten files) misses and reloads while appends
    * (artifact untouched) reuse. Values are localCheckpoint'ed
    * cells-sized frames; LRU-bounded, lifecycle-registered.
    */
  private val artifactLoadCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), DataFrame](
      maxEntries = 32,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  locally {
    graft.SessionCaches.register(
      evict = s => artifactLoadCache.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => artifactLoadCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def cachedArtifactLoad(spark: SparkSession, path: String)(
      build: => DataFrame): DataFrame = {
    graft.SessionCaches.watch(spark)
    // the artifact tables live one level under the index dir, whose
    // manifest carries the per-write nonce ("" for legacy indexes —
    // those fall back to the stamp alone, the pre-write_id behavior)
    val indexDir = new org.apache.hadoop.fs.Path(path).getParent.toString
    val writeId = readIndexManifest(spark, indexDir)
      .flatMap(_.get("write_id")).getOrElse("")
    val key = (spark, path, artifactGeneration(spark, path), writeId)
    artifactLoadCache.get(key).getOrElse {
      val df = build.localCheckpoint()
      // once per artifact generation (cache misses only): an index
      // artifact table is never legitimately empty, and an empty
      // broadcast codebook/centroid frame makes every downstream join
      // silently drop all rows instead of failing
      if (df.isEmpty) {
        org.apache.spark.sql.GraftShims.uncheckpoint(df)
        throw new IllegalArgumentException(
          s"stored index artifact at $path is empty — zero-row table " +
            "or missing data files (partial restore / failed rewrite?)")
      }
      val winner = artifactLoadCache.putIfAbsent(key, df)
      if (winner ne df)
        org.apache.spark.sql.GraftShims.uncheckpoint(df)
      winner
    }
  }

  /** Append the nearest-cell column as a NARROW per-row argmin over the
    * broadcast centroid table — the same rounded-L2 metric and cell
    * tiebreak as [[Similarity.assignWithCentroids]], without its
    * aggregate + vec_id-join shape: index writes and plain appends
    * derive the cell inside the scan projection instead of shuffling an
    * assignment frame back onto the corpus (guide §2.4).
    */
  private def withNearestCell(batch: DataFrame, cent: DataFrame): DataFrame =
    batch.crossJoin(broadcast(Similarity.centroidArray(cent)))
      .withColumn("cell",
        Similarity.nearestCell(Similarity.toDouble(col("embedding")), col("cs")))

  /** The stored PQ codebooks collapsed to ONE broadcastable row
    * (subs: array<struct<sub, cs: array<struct<cell, c>>>>, sub-sorted)
    * — the shape [[pqCodesColumn]] consumes.
    */
  private def pqSubsArray(pqc: DataFrame): DataFrame =
    pqc.groupBy("sub")
      .agg(array_sort(collect_list(struct(col("cell"), col("c")))).as("cs"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cs")))).as("subs"))

  /** Per-row PQ codes over a [[pqSubsArray]] `subs` column: for each
    * subspace, the lexicographic argmin of (rounded-L2 distance, code)
    * between the row's subvector slice and that subspace's codewords —
    * bit-identical to [[Similarity.assignWithCentroids]] applied
    * per-subspace (the pqEncode/pqTrained scheme), as a narrow
    * expression.
    */
  private def pqCodesColumn(subDim: Int): Column =
    transform(col("subs"), sa =>
      array_min(transform(sa.getField("cs"), s0 =>
        struct(Similarity.l2sq(
            Similarity.toDouble(slice(col("embedding"),
              sa.getField("sub") * lit(subDim) + lit(1), lit(subDim))),
            s0.getField("c")).as("d"),
          s0.getField("cell").as("cell"))))
        .getField("cell"))

  /** Persist a model-sized centroid/codebook frame PIVOTED — the
    * vector column stays an array<double>, exactly the shape every
    * consumer broadcasts. The old layout exploded each vector into
    * (key, i, x) rows at write and re-pivoted (groupBy + collect_list +
    * array_sort — a shuffle job) on EVERY artifact-cache miss; parquet
    * stores arrays natively, so the explode/pivot round trip bought
    * nothing (guide §2.4: remove shuffles outright). coalesce(1): the
    * frame is cells- or m×k-sized, one file cuts serve-time listing.
    */
  private def writeCentroidArtifact(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Reassemble the stored centroid table: (cell, c: array<double>) —
    * a cells-sized frame, always broadcast by its consumers. Cached per
    * artifact generation (see [[cachedArtifactLoad]]): repeated serving
    * calls against an unchanged index skip the read entirely. Stored
    * pivoted ([[writeCentroidArtifact]]) — the load is a bare read.
    */
  def loadIvfCentroids(spark: SparkSession, dir: String): DataFrame =
    cachedArtifactLoad(spark, s"$dir/centroids") {
      spark.read.parquet(s"$dir/centroids").select("cell", "c")
    }

  /** Fold a new vector batch into a stored IVF index WITHOUT
    * retraining: assign each new vector to its nearest STORED centroid
    * (the training metric — rounded L2, cell tiebreak) and append the
    * assignment into the cell-partitioned layout. This is the
    * production maintenance path — append cost is one broadcast-join
    * pass over the batch; [[searchIvfIndex]] serves the union
    * immediately. Pair with [[ivfAppendDrift]] (run it BEFORE
    * appending) to detect when the incoming distribution has drifted
    * far enough from the trained one that a retrain is due — the same
    * contract as [[graft.operators.Dedup.incrementalDedup]] on the
    * text side.
    *
    * vec_id is the index key: a batch carrying the same vec_id twice
    * (a re-delivered drop) appends ONCE — [[dedupBatch]] keeps one
    * deterministic row per id, matching the drift pre-flight's counts
    * (its assignment is already per-id). Duplicates against ALREADY
    * STORED ids are the caller's contract (append-only ingest with
    * fresh ids), as for any ANN index without a delete path.
    */
  def appendToIvfIndex(newEmb: DataFrame, dir: String): Unit = {
    val spark = newEmb.sparkSession
    requireIndexKind(spark, dir, "ivf", "appendToIvfIndex")
    val uniq = dedupBatch(newEmb)
    val cent = loadIvfCentroids(spark, dir)
    appendAssignedIvf(uniq,
      Similarity.assignWithCentroids(uniq, cent).select("vec_id", "cell"), dir)
  }

  /** The write tail of [[appendToIvfIndex]] over a PRE-COMPUTED
    * (deduped batch, assignment) pair — the maintain loop computes both
    * once per drop (checkpointed, shared with the drift counts) instead
    * of re-deduping and re-assigning inside the append.
    */
  private def appendAssignedIvf(uniq: DataFrame, assigned: DataFrame,
      dir: String): Unit =
    assigned
      .join(uniq, "vec_id")
      .select("vec_id", "embedding", "cell")
      .repartition(col("cell")) // one appended file per touched cell
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assignment")

  /** Pre-flight drift check for [[appendToIvfIndex]]: per cell, the
    * stored population vs the incoming batch's would-be population
    * (assigned with the STORED centroids, no retrain), a smoothed PSI
    * between the two cell-share distributions, and a retrain_due flag.
    * Everything is cells-sized after the two grouped counts — the
    * windows and the one-row total joins run over ≤ cells rows.
    *
    * The verdict is NULL-CALIBRATED: a finite batch drawn from the
    * exact stored distribution still reads a nonzero smoothed PSI —
    * its expectation is ≈ (cells − 1)·(1/t_new + 1/t_stored) (the
    * chi-square-style null floor), which DOMINATES when cells ≫ batch
    * (measured: a same-distribution 2020-vector batch against an
    * 800-cell ×100 index reads PSI ≈ 0.4 with NO drift — the raw
    * `psi > threshold` rule tripped a spurious 19-minute full retrain;
    * at ×10 the floor predicts 0.043 and the batch read 0.034). The
    * flag therefore fires on `psi > threshold + psi_null`, with
    * `psi_null` emitted as a column so the calibration is auditable.
    *
    * PSI carrier mirrors [[Corpus.sourceDrift]]: per-cell term rounded
    * to an 8dp DECIMAL so the sum is fold-order free, total rounded 6.
    */
  /** Stored-side per-cell PHYSICAL row counts, cached per artifact
    * generation: the drift pre-flight needs them EVERY micro-batch,
    * and a full `read.parquet(assignment).groupBy(cell).count()`
    * re-lists and re-scans the whole cells-∝-N tree per drop — the
    * dominant per-batch job of the maintain twins' replay storm. The
    * value is a driver-side cells-sized map (bounded by the index
    * geometry, never by data — the probed-cell-list collect
    * discipline). Appends seed the NEXT generation arithmetically
    * (pre-append counts + the batch's per-cell counts, both already
    * in the drift frame — no new scan); retrains and compactions
    * change the generation WITHOUT a seed, so the next maintain call
    * rescans once. These are footer-equivalent physical counts —
    * exactly what the drift frame counted before; tombstones stay
    * invisible to it by design.
    */
  /** Hard bound on the DRIVER-SIDE index maps ([[storedCellCounts]],
    * [[centroidCellIds]]): "geometry-bounded, not data-bounded" is only
    * a guarantee while the geometry itself fits the driver — in the
    * sized layout cells = ⌈N/size⌉, so a 10¹⁰-vector / size-64 index
    * is ~1.5×10⁸ cells, past what a driver map should hold. Above this
    * bound the collects REFUSE (loud, actionable) and the maintain
    * pre-flight falls back to ONE distributed aggregate over the
    * assignment per drop ([[maintainCore]]'s fallback branch —
    * bit-identical verdict, index-proportional cost, the pre-cache
    * behavior). Production IVF serves ≲10⁶-10⁷ cells, so the default
    * (2²⁴ ≈ 1.7×10⁷ entries, a few hundred MB of boxed map at worst)
    * never bites on a sane geometry; override via the
    * `graft.maxDriverMapEntries` system property (specs lower it to
    * pin the fallback).
    */
  private[graft] def maxDriverMapEntries: Long =
    sys.props.get("graft.maxDriverMapEntries") match {
      case None => 1L << 24
      case Some(v) =>
        // parse loudly at the config boundary: a malformed override must
        // read as a config error, not a NumberFormatException surfacing
        // from deep inside a maintain/search path
        val parsed = v.toLongOption
        require(parsed.isDefined,
          s"graft.maxDriverMapEntries must be a long, got '$v'")
        parsed.get
    }

  /** The index's cell-count geometry — manifest first (free), else a
    * generation-cached centroid count (one footer-only job per index
    * generation). The tiny Long answer is what gates the driver-map
    * collects above.
    */
  private val cellGeomCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), Long](
      maxEntries = 64, release = _ => ())

  locally {
    graft.SessionCaches.register(
      evict = s => cellGeomCache.removeIf(_._1 eq s, releaseRemoved = false),
      sweep = () => cellGeomCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private[graft] def indexCellGeometry(spark: SparkSession,
      dir: String): Long =
    readIndexManifest(spark, dir).flatMap(_.get("cells"))
      .flatMap(_.toLongOption).getOrElse {
        graft.SessionCaches.watch(spark)
        val writeId = readIndexManifest(spark, dir)
          .flatMap(_.get("write_id")).getOrElse("")
        val key = (spark, s"$dir/centroids",
          artifactGeneration(spark, s"$dir/centroids"), writeId)
        cellGeomCache.get(key).getOrElse(
          cellGeomCache.putIfAbsent(key,
            loadIvfCentroids(spark, dir).count()))
      }

  private def requireDriverMapFits(spark: SparkSession, dir: String,
      what: String): Unit = {
    val geom = indexCellGeometry(spark, dir)
    require(geom <= maxDriverMapEntries,
      s"$what: index at $dir has $geom cells > graft.maxDriverMapEntries" +
        s" (${maxDriverMapEntries}) — a driver-side cells-sized map would" +
        " not fit; use the distributed pre-flight (maintain* falls back" +
        " automatically) or raise the bound explicitly")
  }

  private val cellCountCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), Map[Long, Long]](
      maxEntries = 32, release = _ => ())

  locally {
    graft.SessionCaches.register(
      evict = s => cellCountCache.removeIf(_._1 eq s, releaseRemoved = false),
      sweep = () => cellCountCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def assignGenKey(spark: SparkSession,
      dir: String): (SparkSession, String, Long, String) = {
    val writeId = readIndexManifest(spark, dir)
      .flatMap(_.get("write_id")).getOrElse("")
    (spark, dir, artifactGeneration(spark, s"$dir/assignment"), writeId)
  }

  private[graft] def storedCellCounts(spark: SparkSession,
      dir: String): Map[Long, Long] = {
    requireDriverMapFits(spark, dir, "storedCellCounts")
    graft.SessionCaches.watch(spark)
    val key = assignGenKey(spark, dir)
    cellCountCache.get(key).getOrElse {
      // partition-column inference reads `cell=` path values as INT —
      // normalize to the centroid table's LONG before collecting
      val m = spark.read.parquet(s"$dir/assignment")
        .groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cellCountCache.putIfAbsent(key, m)
    }
  }

  /** Seed the CURRENT generation's count entry (called right after an
    * un-compacted append, when the post-append counts are known
    * arithmetically).
    */
  private def seedCellCounts(spark: SparkSession, dir: String,
      counts: Map[Long, Long]): Unit = {
    cellCountCache.putIfAbsent(assignGenKey(spark, dir), counts)
    ()
  }

  /** Centroid cell-id list, cached per centroids-artifact generation —
    * the drift verdict's grid, collected once per index generation
    * instead of once per micro-batch. Cells-sized.
    */
  private val centroidCellCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), Seq[Long]](
      maxEntries = 32, release = _ => ())

  locally {
    graft.SessionCaches.register(
      evict = s => centroidCellCache.removeIf(_._1 eq s, releaseRemoved = false),
      sweep = () => centroidCellCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def centroidCellIds(spark: SparkSession, dir: String): Seq[Long] = {
    requireDriverMapFits(spark, dir, "centroidCellIds")
    graft.SessionCaches.watch(spark)
    val writeId = readIndexManifest(spark, dir)
      .flatMap(_.get("write_id")).getOrElse("")
    val key = (spark, s"$dir/centroids",
      artifactGeneration(spark, s"$dir/centroids"), writeId)
    centroidCellCache.get(key).getOrElse {
      val ids = loadIvfCentroids(spark, dir).select("cell")
        .collect().map(_.getLong(0)).toSeq.sorted
      centroidCellCache.putIfAbsent(key, ids)
    }
  }

  /** Driver-side twin of [[ivfAppendDrift]]'s verdict — the maintain
    * loop's per-micro-batch decision without the cells-sized DataFrame
    * chain (multi-join + window + broadcast = a dozen tiny driver jobs
    * per drop, the replay storm's fixed cost). Same smoothed-PSI
    * arithmetic on the SAME operands: Spark divides two longs by
    * casting both to double, `round(x, n)` on a double is
    * BigDecimal.valueOf(x).setScale(n, HALF_UP) (the Catalyst Round
    * kernel), the term sum is an exact scale-8 decimal sum (fold-order
    * free — iteration order can't move it), and `log` is Math.log on
    * the same JVM — so the verdict is BIT-IDENTICAL to the DataFrame
    * form (spec-pinned, and every maintain-log oracle re-verifies it).
    * Returns (psi, psi_null, retrain_due).
    */
  private[graft] def driftVerdictDriverSide(gridCells: Seq[Long],
      stored: Map[Long, Long], incoming: Map[Long, Long],
      threshold: Double): (Double, Double, Boolean) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val nCells = gridCells.size.toLong
    val tS = gridCells.iterator.map(stored.getOrElse(_, 0L)).sum
    val tN = gridCells.iterator.map(incoming.getOrElse(_, 0L)).sum
    var sum = JBD.ZERO
    gridCells.foreach { c =>
      val nS = stored.getOrElse(c, 0L)
      val nN = incoming.getOrElse(c, 0L)
      val pS = (nS + 1L).toDouble / (tS + nCells).toDouble
      val pN = (nN + 1L).toDouble / (tN + nCells).toDouble
      val term = (pN - pS) * math.log(pN / pS)
      sum = sum.add(JBD.valueOf(term).setScale(8, RoundingMode.HALF_UP))
    }
    psiFromTermSum(sum, nCells, tS, tN, threshold)
  }

  /** The verdict's FINAL arithmetic, factored so the driver-map path
    * above and the distributed fallback below share it verbatim: input
    * is the exact scale-8 decimal term sum plus the three totals —
    * identical JBD roundings either way, so the two paths cannot
    * diverge by construction.
    */
  private def psiFromTermSum(sum: java.math.BigDecimal, nCells: Long,
      tS: Long, tN: Long,
      threshold: Double): (Double, Double, Boolean) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val psi = JBD.valueOf(sum.doubleValue)
      .setScale(6, RoundingMode.HALF_UP).doubleValue
    val psiNull = JBD.valueOf((nCells - 1L).toDouble *
        (1.0 / math.max(tN, 1L).toDouble + 1.0 / math.max(tS, 1L).toDouble))
      .setScale(6, RoundingMode.HALF_UP).doubleValue
    (psi, psiNull, psi > threshold + psiNull)
  }

  /** The maintain pre-flight ABOVE [[maxDriverMapEntries]]: one
    * distributed aggregate over the stored assignment — the same
    * grid-left-join + smoothed-term chain as [[ivfAppendDrift]],
    * reduced to ONE collected row (term sum as an exact scale-8
    * decimal, plus the three totals), finished with the shared
    * [[psiFromTermSum]]. Verdict is bit-identical to the driver-map
    * path (Catalyst's Round on double is the same
    * BigDecimal.valueOf(x).setScale(8, HALF_UP), the decimal sum is
    * fold-order free, and long/long division casts to double in both
    * engines — spec-pinned); cost is index-proportional per drop,
    * which is exactly the trade the bound exists to make.
    * Returns (psi, retrain_due, t_stored_physical).
    */
  private def driftVerdictDistributed(spark: SparkSession,
      cent: DataFrame, assignPath: String, incoming: Map[Long, Long],
      threshold: Double): (Double, Boolean, Long) = {
    val spark2 = spark
    import spark2.implicits._
    val stored = spark.read.parquet(assignPath)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_stored"))
    val inc = incoming.toSeq.toDF("cell", "n_new")
    val cells = cent.select("cell")
      .join(stored, Seq("cell"), "left")
      .join(broadcast(inc), Seq("cell"), "left")
      .withColumn("n_stored", coalesce(col("n_stored"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val totals = cells.agg(
      count(lit(1)).as("n_cells"),
      sum("n_stored").as("t_stored"), sum("n_new").as("t_new"))
    val pS = (col("n_stored") + lit(1)) / (col("t_stored") + col("n_cells"))
    val pN = (col("n_new") + lit(1)) / (col("t_new") + col("n_cells"))
    val row = cells.crossJoin(broadcast(totals))
      .withColumn("term",
        round((pN - pS) * log(pN / pS), 8).cast("decimal(18,8)"))
      .agg(sum("term").as("s"), max("n_cells").as("n_cells"),
        max("t_stored").as("t_stored"), max("t_new").as("t_new"))
      .head()
    val termSum = Option(row.getDecimal(0))
      .map(_.setScale(8)).getOrElse(java.math.BigDecimal.ZERO)
    val (psi, _, due) = psiFromTermSum(termSum,
      row.getLong(1), row.getLong(2), row.getLong(3), threshold)
    (psi, due, row.getLong(2))
  }

  /** Stored per-cell counts as a DATAFRAME: the generation-cached
    * driver map rendered local when the geometry fits
    * [[maxDriverMapEntries]], the raw distributed aggregate above it —
    * so [[ivfAppendDrift]] works at ANY cell count.
    */
  private def storedCellCountsDF(spark: SparkSession,
      dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    if (indexCellGeometry(spark, dir) <= maxDriverMapEntries)
      storedCellCounts(spark, dir).toSeq.toDF("cell", "n_stored")
    else spark.read.parquet(s"$dir/assignment")
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_stored"))
  }

  def ivfAppendDrift(spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark2 = spark
    import spark2.implicits._
    val cent = loadIvfCentroids(spark, dir)
    val stored = storedCellCountsDF(spark, dir)
    val incoming = Similarity.assignWithCentroids(batch, cent)
      .groupBy("cell").agg(count(lit(1)).as("n_new"))
    val cells = cent.select("cell")
      .join(stored, Seq("cell"), "left")
      .join(incoming, Seq("cell"), "left")
      .withColumn("n_stored", coalesce(col("n_stored"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val totals = cells.agg(
      count(lit(1)).as("n_cells"),
      sum("n_stored").as("t_stored"), sum("n_new").as("t_new"))
    val pS = (col("n_stored") + lit(1)) / (col("t_stored") + col("n_cells"))
    val pN = (col("n_new") + lit(1)) / (col("t_new") + col("n_cells"))
    val wAll = Window.partitionBy() // cells-sized frame only
    cells.crossJoin(broadcast(totals))
      .withColumn("term",
        round((pN - pS) * log(pN / pS), 8).cast("decimal(18,8)"))
      .withColumn("psi", round(sum("term").over(wAll).cast("double"), 6))
      .withColumn("psi_term", round(col("term").cast("double"), 6))
      .withColumn("psi_null", round(
        (col("n_cells") - 1).cast("double") *
          (lit(1.0) / greatest(col("t_new"), lit(1L)) +
            lit(1.0) / greatest(col("t_stored"), lit(1L))), 6))
      .withColumn("retrain_due", col("psi") > lit(threshold) + col("psi_null"))
      .select("cell", "n_stored", "n_new", "psi_term", "psi", "psi_null",
        "retrain_due")
      .orderBy("cell")
  }

  /** Persist a trained IVF-PQ index — the FAISS-style memory-lean
    * serving layout, all in ONE cell-partitioned table:
    * (vec_id, codes: array<int>, embedding) partitioned by the coarse
    * cell, plus the coarse centroids and the per-subspace PQ codebooks
    * beside it. The columnar format makes the two serving tiers two
    * PROJECTIONS of the same files: the ADC candidate stage reads only
    * (vec_id, codes) — m small ints per vector, the 16-32× compressed
    * tier — and the exact-rerank stage reads (vec_id, embedding) for
    * the already-pruned candidates. Both stages scan only the probed
    * cell partitions; nothing ever joins the corpus embedding table.
    */
  def writeIvfPqIndex(emb: DataFrame, dir: String, cells: Int = 8,
      iters: Int = 2, m: Int = 4, subDim: Int = 16, k: Int = 8,
      corpusKey: Option[String] = None): Unit = {
    require(iters >= 2, "a stored IVF-PQ index needs trained centroids (iters >= 2)")
    // training is once-per-corpus by design: with a corpusKey, the
    // coarse quantizer and the PQ codebooks come from the session
    // caches (shared with ivfTopK / the pq_* queries), and an index
    // rebuild pays only the assignment pivot and the writes. The
    // cache OWNS those checkpoints — release them only on the
    // keyless (train-fresh) path.
    // the coarse quantizer and the PQ codebooks train on DISJOINT
    // inputs (full vectors vs subvector slices) — run the two
    // trainings concurrently; on the cached path both return
    // immediately and the overlap is free. Results are bit-identical
    // to serial (the trainings share nothing).
    val coarseF = scala.concurrent.Future {
      corpusKey match {
        case Some(ck) =>
          Similarity.kmeansAssignCachedWithCentroids(emb, cells, iters, ck)
        case None =>
          val (a, cOpt) = Similarity.kmeansAssignInternal(emb, cells, iters)
          (a, cOpt.get)
      }
    }(scala.concurrent.ExecutionContext.global)
    // failure on either training leg must not abandon the other:
    // the coarse Future keeps running after a pqTrained throw (burning
    // jobs into a call the caller already saw fail) and whichever leg
    // succeeded holds keyless checkpoints nothing would ever release
    val (codes, pqCents) =
      try Similarity.pqTrained(emb, m, subDim, k, iters, corpusKey)
      catch { case t: Throwable =>
        try {
          val (_, cLeak) = scala.concurrent.Await.result(
            coarseF, scala.concurrent.duration.Duration.Inf)
          if (corpusKey.isEmpty)
            org.apache.spark.sql.GraftShims.uncheckpoint(cLeak)
        } catch { case _: Throwable => () }
        throw t
      }
    val cent =
      try scala.concurrent.Await.result(
        coarseF, scala.concurrent.duration.Duration.Inf)._2
      catch { case t: Throwable =>
        if (corpusKey.isEmpty) {
          org.apache.spark.sql.GraftShims.uncheckpoint(codes)
          org.apache.spark.sql.GraftShims.uncheckpoint(pqCents)
        }
        throw t
      }
    // cell AND codes are narrow per-row argmins against the broadcast
    // trained artifacts (bit-identical to the cached assignment/code
    // frames — both are the same rounded-L2 argmin with cell tiebreak
    // over the same final centroids/codebooks), so the layout is one
    // projection over the scan + the cell repartition. The previous
    // shape pivoted the (sub, vec_id, code) frame and shuffle-joined it
    // plus the assignment back to the corpus by vec_id — three
    // corpus-sized exchanges for values derivable in the projection
    // (guide §2.4).
    // both model-sized artifacts are independent of the corpus-sized
    // assignment write — overlap them (guide §2.6; the writeIvfIndex
    // pattern); the manifest still lands only after everything exists
    val artF = scala.concurrent.Future {
      writeCentroidArtifact(cent, s"$dir/centroids")
      writeCentroidArtifact(pqCents.select("sub", "cell", "c"), s"$dir/pq_centroids")
    }(scala.concurrent.ExecutionContext.global)
    try {
      withNearestCell(emb.select("vec_id", "embedding"), cent)
        .crossJoin(broadcast(pqSubsArray(pqCents)))
        .withColumn("codes", pqCodesColumn(subDim))
        .select("vec_id", "codes", "embedding", "cell")
        .repartition(col("cell")) // one file per cell (see writeIvfIndex)
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell").parquet(s"$dir/assignment")
    } finally scala.concurrent.Await.ready(
      artF, scala.concurrent.duration.Duration.Inf)
    artF.value.get.get // surface an artifact-write failure
    writeIndexManifest(spark = emb.sparkSession, dir = dir,
      fields = Seq("kind" -> "ivfpq", "cells" -> cells.toString,
        "m" -> m.toString, "subDim" -> subDim.toString, "k" -> k.toString))
    // new generation — stale tombstones must not mask the new content
    // (the writeIvfIndex contract)
    clearTombstones(emb.sparkSession, dir)
    if (corpusKey.isEmpty) {
      org.apache.spark.sql.GraftShims.uncheckpoint(cent)
      org.apache.spark.sql.GraftShims.uncheckpoint(codes)
      org.apache.spark.sql.GraftShims.uncheckpoint(pqCents)
    }
  }

  /** Reassemble the stored PQ codebooks: (sub, cell, c: array<double>)
    * — an m×k-sized frame, always broadcast by its consumers. Cached
    * per artifact generation like [[loadIvfCentroids]]; stored pivoted
    * ([[writeCentroidArtifact]]), so the load is a bare read.
    */
  def loadPqCentroids(spark: SparkSession, dir: String): DataFrame =
    cachedArtifactLoad(spark, s"$dir/pq_centroids") {
      spark.read.parquet(s"$dir/pq_centroids").select("sub", "cell", "c")
    }

  /** One-file index manifest: the geometry the index was written with
    * ((kind, cells) for IVF; + (m, subDim, k) for IVF-PQ), persisted as
    * a tiny JSON beside the assignment tree. Serving reads THIS instead
    * of re-deriving geometry from the codebook table — one small-file
    * FS read, zero Spark jobs on the hot path.
    */
  /** Monotonic per-JVM component of the manifest write_id — nanoTime
    * alone can repeat across JVMs on coarse clocks; the pair (nanoTime,
    * counter) is unique per write from this JVM and collision-unlikely
    * across JVMs, which is all the cache key needs.
    */
  private val manifestWriteCounter = new java.util.concurrent.atomic.AtomicLong()

  private[graft] def writeIndexManifest(spark: SparkSession, dir: String,
      fields: Seq[(String, String)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // every full index write gets a fresh nonce: the loaded-artifact
    // cache folds it into its key, so a rewrite that happens to
    // reproduce the (mtime, count, bytes) generation stamp still misses
    val all = fields :+
      ("write_id" -> s"${System.nanoTime()}x${manifestWriteCounter.incrementAndGet()}")
    val json = all.map { case (k, v) =>
      // unquoted only for well-formed integers — the digit-or-dash
      // heuristic emitted invalid JSON for "" and unquoted garbage for
      // values like "1-2"
      "\"" + k + "\":" + (if (v.matches("-?\\d+")) v else "\"" + v + "\"")
    }.mkString("{", ",", "}")
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Tombstone-delete from a stored index (either layout — deletion is
    * assignment-level): the ids land as one tiny id-only parquet file
    * beside the index; both search paths mask them with a broadcast
    * anti-join, and the next WHOLE-INDEX rewrite (a maintenance
    * retrain, or [[compactIvfIndex]]) purges the rows physically and
    * clears the tombstones. Cost model: a delete writes O(ids) bytes
    * and never touches the corpus-sized assignment; serving pays one
    * broadcast anti-join only while tombstones exist; the purge rides
    * rewrites that were already rewriting every row.
    *
    * Contract: a tombstoned id is DEAD until a purge clears it —
    * appending the same id again stays masked (no timestamp ordering
    * between a delete and a later insert; to re-insert, compact first).
    * Selective compaction does not purge (it rewrites only fragmented
    * cells, so it could not clear the tombstone set safely).
    */
  def deleteFromIvfIndex(spark: SparkSession, dir: String,
      ids: DataFrame): Unit = {
    // loud on a typo'd dir — every other lifecycle mutation fails
    // loudly on a bad target, delete must not silently no-op beside it
    require(pathExists(spark, s"$dir/assignment"),
      s"deleteFromIvfIndex: no index at $dir (missing assignment table)")
    val d = ids.select(col("vec_id").cast("long").as("vec_id"))
      .distinct().localCheckpoint()
    // ids may reference rows the index never held (out-of-order CDC:
    // the delete can arrive before its row) — but an EMPTY delete must
    // not write a schema-only file that would flip every future search
    // onto the anti-join plan for nothing
    if (!d.isEmpty) {
      d.coalesce(1) // id lists are tiny; one file per delete call
        .write.mode("append").parquet(s"$dir/tombstones")
    }
    org.apache.spark.sql.GraftShims.uncheckpoint(d)
  }

  /** The live tombstone set — None when no delete has ever happened,
    * so serving plans are untouched on tombstone-free indexes (FS
    * metadata check only).
    *
    * The read is PINNED to the file set the existence check just
    * listed (explicit paths + schema, so planning opens no footer) and
    * tolerates files vanishing before task execution: a concurrent
    * [[compactIvfIndex]] deletes exactly the tombstone files it
    * consumed — those ids are purged from the rows it rewrote, so a
    * query that planned against the old listing can safely treat the
    * vanished files as empty instead of failing mid-flight.
    */
  private def tombstones(spark: SparkSession, dir: String,
      idCol: String = "vec_id"): Option[DataFrame] = {
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    forEachDataFile(spark, s"$dir/tombstones")(f => files += f.getPath.toString)
    if (files.isEmpty) None
    else Some(
      spark.read
        .schema(s"$idCol long")
        .option("ignoreMissingFiles", "true")
        .parquet(files.toSeq: _*)
        .select(idCol).distinct())
  }

  /** Mask tombstoned rows out of an assignment scan — identity when
    * the index has no tombstones.
    */
  private def maskTombstones(spark: SparkSession, dir: String,
      assignment: DataFrame): DataFrame =
    tombstones(spark, dir)
      .map(t => assignment.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(assignment)

  private def clearTombstones(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true): Unit
  }

  /** One deterministic row per vec_id: min embedding (arrays are
    * orderable) — a map-side-combinable aggregate over the batch, so
    * the dedup is batch-proportional. Keeps the appended rows, the
    * drift pre-flight's counts (already per-id via the assignment
    * window), and the decision log's n_batch/n_after all consistent
    * when a batch carries a re-delivered vec_id.
    */
  private def dedupBatch(newEmb: DataFrame): DataFrame =
    newEmb.select("vec_id", "embedding")
      .groupBy("vec_id").agg(min("embedding").as("embedding"))

  /** Fail loudly when an operator is pointed at an index of the other
    * layout: `maintainIvfIndex` on an IVF-PQ tree would retrain it into
    * a plain-IVF tree (destroying the codebooks) or append rows with no
    * codes column (silently invisible to ADC serving). Kind is checked
    * whenever the manifest records it; a legacy pre-manifest index has
    * no kind to check (its callers own the layout, as before).
    */
  private def requireIndexKind(spark: SparkSession, dir: String,
      expected: String, label: String): Unit =
    readIndexManifest(spark, dir).flatMap(_.get("kind")).foreach { kind =>
      require(kind == expected,
        s"$label: index at $dir is kind '$kind', not '$expected' — use " +
          s"the ${kind match {
            case "ivfpq" => "IVF-PQ"
            case "ivfsq8" => "IVF-SQ8"
            case "dedup_text" => "dedup-index"
            case "bpe_tokenizer" => "BPE-tokenizer"
            case _ => "IVF"
          }} operator family")
    }

  /** Read back [[writeIndexManifest]]. None for a pre-manifest (legacy)
    * index — callers fall back to deriving geometry from the stored
    * codebooks.
    */
  private[graft] def readIndexManifest(spark: SparkSession,
      dir: String): Option[Map[String, String]] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      val kv = """"([A-Za-z_]+)":"?([^",}]+)"?""".r
      Some(kv.findAllMatchIn(json).map(mt => mt.group(1) -> mt.group(2)).toMap)
    }
  }

  /** Require the caller-supplied PQ geometry to match the STORED index:
    * manifest fast path (one FS read, no Spark job — the path every
    * index written since the manifest landed takes), codebook-aggregate
    * fallback for legacy indexes. A mismatch would otherwise silently
    * produce garbage instead of an error — `slice()` past the embedding
    * end yields short subvectors and `zip_with` pads the other side
    * with nulls, so wrong-geometry codes/scores still "compute".
    */
  private[graft] def checkPqGeometry(spark: SparkSession, dir: String,
      pqc: => DataFrame, m: Int, subDim: Int): Unit =
    readIndexManifest(spark, dir) match {
      case Some(mf) if mf.contains("m") && mf.contains("subDim") =>
        val (sm, sd) = (mf("m").toInt, mf("subDim").toInt)
        require(sm == m && sd == subDim,
          s"stored PQ geometry (m=$sm, subDim=$sd) does not match " +
            s"caller-supplied (m=$m, subDim=$subDim) — pass the values " +
            "the index was written with")
        // the manifest fast path must not LOSE the loud failure on a
        // missing codebook table (partial restore, failed rewrite): an
        // empty broadcast codebook makes every downstream join silently
        // drop all rows. FS metadata check only — still no Spark job.
        require(pathExists(spark, s"$dir/pq_centroids") &&
            countDataFiles(spark, s"$dir/pq_centroids") > 0,
          s"index at $dir carries a manifest but no PQ codebook data " +
            "files — the pq_centroids table is missing or empty " +
            "(partial restore?)")
      case _ => requirePqGeometry(pqc, m, subDim)
    }

  /** Legacy-index geometry check: m = distinct subspace count, subDim =
    * codeword width, derived from the stored codebooks (m×k rows — the
    * one-row aggregate is cheap, but it IS a Spark job; manifest-bearing
    * indexes skip it via [[checkPqGeometry]]).
    */
  private def requirePqGeometry(pqc: DataFrame, m: Int, subDim: Int): Unit = {
    val r = pqc.agg(
      countDistinct(col("sub")).as("m"),
      min(size(col("c"))).as("sd_min"),
      max(size(col("c"))).as("sd_max")).head()
    // min/size aggregates return NULL over an empty frame — unboxing
    // that would raise an opaque NPE instead of the diagnostic
    require(!r.isNullAt(1) && !r.isNullAt(2),
      "no PQ codebooks found — the pq_centroids table is empty or missing")
    val (sm, sdMin, sdMax) = (r.getLong(0).toInt, r.getInt(1), r.getInt(2))
    require(sm == m && sdMin == subDim && sdMax == subDim,
      s"stored PQ geometry (m=$sm, subDim=$sdMin..$sdMax) does not match " +
        s"caller-supplied (m=$m, subDim=$subDim) — pass the values the " +
        "index was written with")
  }

  /** Compact a stored index's assignment layout back to ONE file per
    * cell. Every [[appendToIvfIndex]]/[[appendToIvfPqIndex]] batch
    * adds one file per touched cell, so a continuously-fed index
    * accumulates files linearly in batch count — and probe cost grows
    * with file count (open/footer per file), not data. Compaction is
    * the standard maintenance move: one shuffle by cell, rewrite via
    * temp-and-swap (reading and overwriting the same path in one job
    * would corrupt it), schema-agnostic so the same op serves the IVF
    * and IVF-PQ layouts. Run it on the [[ivfAppendDrift]] cadence.
    */
  def compactIvfIndex(spark: SparkSession, dir: String): Unit = {
    val tmp = s"$dir/assignment__compact"
    // the full rewrite is the purge point for tombstoned rows — the
    // anti-join rides a pass that was already rewriting every row.
    // The consumed tombstone FILE SET is pinned up front: compaction
    // runs on the append cadence, concurrent with serving, and a
    // delete landing between this listing and the post-swap cleanup
    // must KEEP its tombstone (clearing the whole directory would
    // silently resurrect it).
    val tombFiles = {
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      forEachDataFile(spark, s"$dir/tombstones")(f => buf += f.getPath.toString)
      buf.toSeq
    }
    val src = spark.read.parquet(s"$dir/assignment")
    val masked =
      if (tombFiles.isEmpty) src
      else src.join(
        broadcast(spark.read.parquet(tombFiles: _*).select("vec_id").distinct()),
        Seq("vec_id"), "left_anti")
    masked
      .repartition(col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("cell").parquet(tmp)
    // Swap order matters on a LIVE index (compaction runs on the
    // append cadence, concurrent with serving): rename the old tree
    // ASIDE, rename the compacted tree into place, THEN delete the old
    // one — the index-unreadable window is a single rename, and a
    // crash mid-swap leaves either the old tree recoverable at
    // assignment__old or the new one already live (delete-then-rename
    // would leave NO assignment dir for the whole span and strand the
    // compacted data in the temp dir on a crash). The FS is resolved
    // from the index dir's own URI, not the default FS, so an index on
    // a non-default scheme (s3a://, hdfs://) swaps against the right
    // store.
    checkedSwap(spark, tmp, s"$dir/assignment", "compactIvfIndex")
    // delete ONLY the consumed tombstone files (never the directory):
    // a tombstone written after the mask-read above survives and keeps
    // masking. Crash between swap and this cleanup is safe: tombstones
    // over already-purged ids anti-join nothing.
    if (tombFiles.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      tombFiles.foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), false): Unit)
    }
  }

  /** Rename-aside tree swap with CHECKED renames: `tmp` replaces
    * `dst0`, the displaced tree parks at `dst0 + "__old"` until the
    * forward rename is confirmed, then dies. Hadoop rename signals
    * most failures by returning FALSE, not by throwing — an unchecked
    * rename(tmp, dst) that silently failed after rename(dst, old)
    * succeeded would let the delete(old) destroy the only remaining
    * copy. On a forward-rename failure the old tree is rolled back
    * into place before raising; a crash mid-swap leaves either the
    * old tree recoverable at __old or the new one already live,
    * never neither. FS resolves from dst's own URI (s3a://, hdfs://
    * swap against the right store, not the default FS).
    */
  private def checkedSwap(spark: SparkSession, tmp: String, dst0: String,
      label: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(dst0)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dst0 + "__old")
    fs.delete(old, true) // leftover from a crashed prior swap
    require(fs.rename(dst, old),
      s"$label: rename($dst, $old) failed — target left untouched")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      val rolledBack = fs.rename(old, dst)
      throw new IllegalStateException(
        s"$label: rename($tmp, $dst) failed; " +
          (if (rolledBack) s"previous tree restored at $dst"
           else s"ROLLBACK ALSO FAILED — recover manually from $old") +
          s"; new data remains at $tmp")
    }
    fs.delete(old, true) // both renames confirmed — old copy is redundant
    ()
  }

  /** Per-cell data-file counts from one recursive FS listing — the
    * fragmentation map [[compactIvfIndexSelective]] plans from (cost:
    * file metadata only, no parquet opened).
    */
  private[graft] def cellFileCounts(spark: SparkSession,
      assignPath: String): Map[Long, Int] = {
    val counts = scala.collection.mutable.Map.empty[Long, Int]
    val cellRe = ".*/cell=([0-9]+)/[^/]+$".r
    forEachDataFile(spark, assignPath) { f =>
      f.getPath.toString match {
        case cellRe(c) => counts(c.toLong) = counts.getOrElse(c.toLong, 0) + 1
        case _ => ()
      }
    }
    counts.toMap
  }

  /** Compact ONLY the fragmented cells: cells holding at least
    * `minFilesPerCell` files are read back under a partition-pruned
    * scan, rewritten one-file-per-cell, and swapped in with DYNAMIC
    * partition overwrite — untouched cell directories are never read,
    * never rewritten. [[compactIvfIndex]] rewrites the WHOLE
    * assignment (one shuffle of the entire index); at production scale
    * appends touch a slice of the cells per batch, so full-table
    * compaction pays corpus-sized I/O to fix batch-sized
    * fragmentation. Here cost ∝ the fragmented cells' data. Same
    * schema-agnostic contract (serves IVF and IVF-PQ layouts); the
    * per-partition replace is atomic per cell directory, and a crash
    * mid-write leaves non-replaced cells on their old (complete)
    * files. Returns the number of cells compacted.
    */
  def compactIvfIndexSelective(spark: SparkSession, dir: String,
      minFilesPerCell: Int = 2, fullRewriteAbove: Double = 0.4): Int = {
    val assignPath = s"$dir/assignment"
    val counts = cellFileCounts(spark, assignPath)
    val fragmented = counts
      .filter(_._2 >= minFilesPerCell).keys.toSeq.sorted
    if (fragmented.isEmpty) return 0
    // ADAPTIVE: when most cells are fragmented (full-width appends),
    // the selective path's constant factors lose — it pays the slice
    // twice (materialize + rewrite) plus per-partition commit
    // overhead, measured ~2.3× the full rewrite's per-cell cost at
    // ×100 (21.7 s selective vs 9.4 s full at 95% fragmentation).
    // Break-even sits near 40%; above it, the one-shuffle full
    // rewrite is strictly cheaper. Below it — the skewed-append
    // regime selective exists for — cost ∝ the fragmented slice.
    if (fragmented.size > fullRewriteAbove * counts.size) {
      compactIvfIndex(spark, dir)
      return fragmented.size
    }
    // read back ONLY the fragmented cell partitions (literal partition
    // filter — directory-level pruning, the prunedTouchedRead shape);
    // materialize via localCheckpoint so the dynamic overwrite never
    // reads and replaces the same directories in one job
    val slice = spark.read.parquet(assignPath)
      .filter(col("cell").isin(fragmented: _*))
      .localCheckpoint()
    slice
      .repartition(col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(assignPath)
    org.apache.spark.sql.GraftShims.uncheckpoint(slice)
    fragmented.size
  }

  /** Count data files under a tree (skips _SUCCESS / hidden files) —
    * the compaction-cadence signal: appends add one file per touched
    * cell per batch, so the file count grows linearly in batch count
    * while cells stay fixed, and probe cost follows file count.
    */
  private[graft] def countDataFiles(spark: SparkSession, path: String): Int = {
    var n = 0
    forEachDataFile(spark, path)(_ => n += 1)
    n
  }

  /** The composed index-maintenance operator — the production "a new
    * batch arrived" decision in ONE call:
    *  1. drift-check the batch against the stored index
    *     ([[ivfAppendDrift]], batch assigned with the FROZEN
    *     centroids);
    *  2. if the PSI crosses `threshold` → RETRAIN on stored ∪ batch.
    *     The new index is built into a sibling tree while the stored
    *     vectors stream out of the old one (never read-and-overwritten
    *     in one job), then swapped in with the [[compactIvfIndex]]
    *     checked-rename discipline — a crash mid-swap leaves either
    *     the old index recoverable or the new one live, never neither;
    *  3. else → APPEND against the frozen centroids
    *     ([[appendToIvfIndex]]) and, once the accumulated append
    *     slivers exceed `compactFilesPerCell` files per cell, fold the
    *     layout back to one file per cell ([[compactIvfIndex]]).
    * Cell count for the retrain comes from the index's own manifest
    * (the geometry it was WRITTEN with), not the caller — `cells` is
    * only the pre-manifest-index fallback.
    *
    * Returns a ONE-ROW decision log — branch taken, PSI, row/file
    * counts before and after — so maintenance runs are auditable with
    * a plain query over their collected logs.
    */
  def maintainIvfIndex(spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double = 0.25, cells: Int = 8, iters: Int = 2,
      compactFilesPerCell: Int = 4): DataFrame = {
    import spark.implicits._
    requireIndexKind(spark, dir, "ivf", "maintainIvfIndex")
    val storedCells = readIndexManifest(spark, dir)
      .flatMap(_.get("cells")).map(_.toInt)
    val o = maintainCore(spark, batch, dir, threshold, compactFilesPerCell,
      extraDue = false,
      cadenceCells = storedCells.getOrElse(
        spark.read.parquet(s"$dir/centroids").select("cell")
          .distinct().count().toInt),
      retrainWrite = (union, tmp) => manifestTargetCellSize(spark, dir) match {
        // a SIZED index re-derives cells from the union (the fixed-size
        // invariant survives the index's own growth); a probe-layout
        // index keeps its stored cell count
        case Some(sz) => writeIvfIndexSized(union, tmp, sz, iters); ()
        case None => writeIvfIndex(union, tmp, storedCells.getOrElse(cells), iters)
      },
      append = (u, a) => appendAssignedIvf(u, a, dir),
      label = "maintainIvfIndex")
    Seq((o.action, o.psi, o.due, o.nStored, o.nBatch, o.nAfter,
        o.filesBefore, o.filesAfter, o.compacted))
      .toDF("action", "psi", "retrain_due", "n_stored_before", "n_batch",
        "n_after", "files_before", "files_after", "compacted")
  }

  private case class MaintainOutcome(action: String, psi: Double,
      due: Boolean, nStored: Long, nBatch: Long, nAfter: Long,
      filesBefore: Int, filesAfter: Int, compacted: Boolean)

  /** The branch-and-log skeleton shared by [[maintainIvfIndex]] and
    * [[maintainIvfPqIndex]] — ONE implementation of the decision loop
    * so the two tiers' logs cannot drift apart. Tier-specific parts
    * come in as values: the extra drift tripwire (the PQ code PSI),
    * the cadence cell count, and the two writers.
    */
  private def maintainCore(spark: SparkSession, batch: DataFrame,
      dir: String, threshold: Double, compactFilesPerCell: Int,
      extraDue: Boolean, cadenceCells: => Int,
      retrainWrite: (DataFrame, String) => Unit,
      append: (DataFrame, DataFrame) => Unit, label: String): MaintainOutcome = {
    val assignPath = s"$dir/assignment"
    // DRIVER-SIDE drift verdict: the stored per-cell counts and the
    // centroid grid are generation-cached driver maps, so the whole
    // pre-flight costs ONE batch pass — instead of the cells-sized
    // DataFrame chain (multi-join + window + broadcast: a dozen tiny
    // driver jobs per drop, the replay storm's dominant fixed cost).
    // driftVerdictDriverSide reproduces ivfAppendDrift's arithmetic
    // bit-for-bit (spec-pinned), so the decision log's oracle hashes
    // are unchanged. The deduped batch and its assignment are
    // checkpointed ONCE and shared by the drift counts, the tombstone
    // audit, and the append/retrain writer — previously every append
    // re-deduped and re-assigned the batch the drift had just scored.
    // (incomingMap is BATCH-cells-sized — bounded by the micro-batch,
    // never the index — so it is collected on both branches below.)
    //
    // GEOMETRY GUARD: the driver maps hold one entry per cell, so they
    // are only legal while cells ≤ maxDriverMapEntries. Above the bound
    // the pre-flight takes the distributed branch — one aggregate over
    // the assignment per drop (bit-identical verdict via the shared
    // psiFromTermSum), index-proportional cost, and no generation
    // seeding (there is no map to seed).
    val cent = loadIvfCentroids(spark, dir)
    val driverMapsFit = indexCellGeometry(spark, dir) <= maxDriverMapEntries
    val uniq = dedupBatch(batch).localCheckpoint()
    val assignedBatch = Similarity.assignWithCentroids(uniq, cent)
      .select("vec_id", "cell").localCheckpoint()
    val incomingMap = assignedBatch
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (psi, coarseDue, tStoredPhys, storedMapOpt) =
      if (driverMapsFit) {
        val gridCells = centroidCellIds(spark, dir)
        val storedMap = storedCellCounts(spark, dir)
        val (p, _, d) =
          driftVerdictDriverSide(gridCells, storedMap, incomingMap, threshold)
        (p, d, gridCells.iterator.map(storedMap.getOrElse(_, 0L)).sum,
          Some(storedMap))
      } else {
        val (p, d, tS) = driftVerdictDistributed(spark, cent, assignPath,
          incomingMap, threshold)
        (p, d, tS, None)
      }
    // LIVE counts for the log: the drift frame counts physical rows
    // (footer-only by design — it cannot see tombstones). Only while
    // deletes are pending, make the audit EXACT: subtract the MASKED
    // PHYSICAL rows (plain inner join against the tiny distinct
    // tombstone set — no distinct on the assignment side, because a
    // tombstoned id that was later re-appended has TWO masked physical
    // rows and both must come off the physical n_stored), and count the
    // batch's live ids with a batch-sized anti-join. Tombstoned ids the
    // index never held (out-of-order CDC deletes) simply match nothing.
    // Zero extra jobs when no delete ever happened. Both branches then
    // land on the same n_after = live stored + live batch: the append
    // masks at serve time, the retrain purges.
    val nBatch = incomingMap.valuesIterator.sum // as delivered (per id)
    val (nTombLive, nBatchLive) = tombstones(spark, dir) match {
      case None => (0L, nBatch)
      case Some(t) =>
        val tl = spark.read.parquet(assignPath).select("vec_id")
          .join(broadcast(t), "vec_id").count()
        val bl = uniq
          .join(broadcast(t), Seq("vec_id"), "left_anti").count()
        (tl, bl)
    }
    val nStored = tStoredPhys - nTombLive
    val touched = incomingMap.size // every entry counts ≥ 1 batch row
    val due = coarseDue || extraDue
    val filesBefore = countDataFiles(spark, assignPath)
    var compacted = false
    val (action, filesAfter) = if (due) {
      // tombstones win over ANY pending content (the deleteFromIvfIndex
      // contract): mask the stored side AND the batch side, then the
      // rebuilt index starts clean and the tombstones die with it
      val union = maskTombstones(spark, dir,
        spark.read.parquet(assignPath).select("vec_id", "embedding")
          .unionByName(uniq))
      val tmp = dir + "__retrain"
      // the writer materializes the union INTO the sibling tree —
      // every read of the old assignment completes before the swap
      retrainWrite(union, tmp)
      // the swap replaces the WHOLE index dir: the tombstones die with
      // the old tree (the rebuilt one starts clean — both union sides
      // were masked above). NOTE the single-writer contract: a delete
      // landing DURING the retrain window is lost with the old tree;
      // maintenance is a single-writer operation, unlike
      // compactIvfIndex whose cleanup is pinned to the file set it
      // consumed and therefore tolerates concurrent deletes.
      checkedSwap(spark, tmp, dir, label)
      ("retrain", countDataFiles(spark, assignPath))
    } else {
      append(uniq, assignedBatch)
      // one appended file per touched cell (the append layout
      // invariant) — DERIVE the post-append count instead of
      // re-listing the whole tree twice; only a compaction (which
      // rewrites an unknown file set) re-lists for the log
      val appended = filesBefore + touched
      if (appended >= compactFilesPerCell * cadenceCells) {
        // SELECTIVE: only fragmented cells rewrite — cost ∝ the
        // appended slivers, never the whole index
        compactIvfIndexSelective(spark, dir, minFilesPerCell = 2)
        compacted = true
        ("append", countDataFiles(spark, assignPath))
      } else {
        // seed the post-append generation's stored-count cache
        // arithmetically — both sides are already driver maps, so the
        // NEXT drop's pre-flight skips the whole-index count scan.
        // (A compaction above rewrote physical rows — its generation is
        // left unseeded and the next pre-flight rescans once. On the
        // over-bound distributed branch there is no map to seed.)
        storedMapOpt.foreach { storedMap =>
          seedCellCounts(spark, dir,
            (storedMap.keySet ++ incomingMap.keySet).iterator.map(c =>
              c -> (storedMap.getOrElse(c, 0L) + incomingMap.getOrElse(c, 0L)))
              .toMap)
        }
        ("append", appended)
      }
    }
    // the per-drop checkpoints are fully consumed (the append/retrain
    // writes completed above) — release their blocks before returning
    org.apache.spark.sql.GraftShims.uncheckpoint(assignedBatch)
    org.apache.spark.sql.GraftShims.uncheckpoint(uniq)
    // both branches add exactly the batch's LIVE rows (append is a
    // union masked at serve time; retrain trains on the masked
    // stored ∪ batch) — no post-action table count
    MaintainOutcome(action, psi, due, nStored, nBatch, nStored + nBatchLive,
      filesBefore, filesAfter, compacted)
  }

  /** [[maintainIvfIndex]] for the COMPRESSED tier — and the first
    * operator whose geometry comes wholly from the index itself: cells
    * / m / subDim / k are read from the manifest (the values the index
    * was WRITTEN with), so the maintenance caller can't hold a stale
    * geometry. Two drift tripwires gate the branch:
    * coarse cell populations ([[ivfAppendDrift]]) AND per-subspace
    * code populations ([[ivfPqCodeDrift]] — catches subvector shift
    * the coarse PSI can't see); EITHER crossing `threshold` retrains
    * both tiers on stored ∪ batch (sibling-tree build +
    * checked-rename swap), otherwise the batch appends against the
    * frozen artifacts with the same file-count compaction cadence.
    * One-row decision log carries both PSIs.
    */
  def maintainIvfPqIndex(spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double = 0.25, iters: Int = 2,
      compactFilesPerCell: Int = 4): DataFrame = {
    import spark.implicits._
    requireIndexKind(spark, dir, "ivfpq", "maintainIvfPqIndex")
    val (cells, m, subDim, k) = readIndexManifest(spark, dir) match {
      case Some(f) if Seq("cells", "m", "subDim", "k").forall(f.contains) =>
        (f("cells").toInt, f("m").toInt, f("subDim").toInt, f("k").toInt)
      case _ =>
        // legacy pre-manifest index: derive the WRITTEN geometry from
        // the stored artifacts (two bounded aggregates — cells and
        // m·k rows, subDim from the pivoted vector width). Hardcoded
        // defaults here would silently retrain e.g. a 32-cell index
        // down to 8 cells.
        val g = spark.read.parquet(s"$dir/pq_centroids")
          .agg(countDistinct(col("sub")).as("m"),
            countDistinct(col("cell")).as("k"),
            max(size(col("c"))).cast("long").as("subDim")).head()
        require(g.getLong(0) > 0,
          s"no PQ codebooks found at $dir — the pq_centroids table is " +
            "empty; not an IVF-PQ index?")
        val nc = spark.read.parquet(s"$dir/centroids")
          .agg(countDistinct(col("cell"))).head().getLong(0).toInt
        (nc, g.getLong(0).toInt, g.getLong(2).toInt, g.getLong(1).toInt)
    }
    // DRIVER-SIDE code verdict (the coarse twin's discipline): stored
    // per-(sub, code) counts and the codebook grid are generation-
    // cached maps; the batch's encoding is ONE collected job. The
    // per-sub PSI formula is [[driftVerdictDriverSide]] verbatim with
    // the sub's code set as the grid (k_sub plays n_cells) —
    // bit-identical to ivfPqCodeDrift's window form (spec-pinned).
    val pqc = loadPqCentroids(spark, dir)
    checkPqGeometry(spark, dir, pqc, m, subDim)
    val codeGrid = pqCodeGrid(spark, dir)
    val storedCode = storedCodeCounts(spark, dir)
    // dedupe + encode ONCE per drop: the checkpointed per-id codes feed
    // the drift counts here AND the append write below (previously the
    // append re-encoded the batch the drift had just scored)
    val uniq = dedupBatch(batch).localCheckpoint()
    val codesPerId = pqEncode(uniq, pqc, m, subDim).localCheckpoint()
    val incomingCode = codesPerId
      .groupBy("sub", "code").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val subVerdicts = (0 until m).map { s0 =>
      driftVerdictDriverSide(codeGrid.getOrElse(s0, Seq.empty),
        storedCode.collect { case ((s, c), n) if s == s0 => c -> n },
        incomingCode.collect { case ((s, c), n) if s == s0 => c -> n },
        threshold)
    }
    val psiCodeMax = subVerdicts.map(_._1).max
    val codeDue = subVerdicts.exists(_._3) // null-calibrated per sub
    val o = maintainCore(spark, uniq, dir, threshold, compactFilesPerCell,
      extraDue = codeDue,
      cadenceCells = cells,
      retrainWrite = (union, tmp) => manifestTargetCellSize(spark, dir) match {
        case Some(sz) =>
          writeIvfPqIndexSized(union, tmp, sz, iters, m, subDim, k); ()
        case None => writeIvfPqIndex(union, tmp, cells, iters, m, subDim, k)
      },
      append = (u, a) => appendAssignedPq(u, a, codesPerId, dir),
      label = "maintainIvfPqIndex")
    // both per-drop checkpoints are fully consumed by maintainCore
    org.apache.spark.sql.GraftShims.uncheckpoint(codesPerId)
    org.apache.spark.sql.GraftShims.uncheckpoint(uniq)
    if (o.action == "append" && !o.compacted)
      seedCodeCounts(spark, dir,
        (storedCode.keySet ++ incomingCode.keySet).iterator.map(kk =>
          kk -> (storedCode.getOrElse(kk, 0L) + incomingCode.getOrElse(kk, 0L)))
          .toMap)
    Seq((o.action, o.psi, psiCodeMax, o.due, o.nStored, o.nBatch, o.nAfter,
        o.filesBefore, o.filesAfter, o.compacted))
      .toDF("action", "psi_coarse", "psi_code_max", "retrain_due",
        "n_stored_before", "n_batch", "n_after",
        "files_before", "files_after", "compacted")
  }

  /** Fold a new vector batch into a stored IVF-PQ index WITHOUT
    * retraining — the [[appendToIvfIndex]] contract extended to the
    * compressed tier: the batch coarse-assigns against the STORED
    * centroids AND encodes against the STORED per-subspace codebooks
    * (both broadcast), then appends into the cell-partitioned layout
    * (one new file per touched cell). Cost is two broadcast passes
    * over the batch, never a Lloyd's rerun; [[searchIvfPqIndex]]
    * serves the union immediately. Pair with [[ivfAppendDrift]] as
    * the retrain tripwire — it reads the same assignment layout.
    */
  def appendToIvfPqIndex(newEmb: DataFrame, dir: String,
      m: Int = 4, subDim: Int = 16): Unit = {
    val spark = newEmb.sparkSession
    requireIndexKind(spark, dir, "ivfpq", "appendToIvfPqIndex")
    // dedupe FIRST (the appendToIvfIndex key contract) — here a
    // duplicated vec_id would additionally corrupt the codes column:
    // collect_list over two rows per id yields a 2m-long codes array
    val uniq = dedupBatch(newEmb)
    val cent = loadIvfCentroids(spark, dir)
    val pqc = loadPqCentroids(spark, dir)
    checkPqGeometry(spark, dir, pqc, m, subDim)
    appendAssignedPq(uniq,
      Similarity.assignWithCentroids(uniq, cent).select("vec_id", "cell"),
      pqEncode(uniq, pqc, m, subDim), dir)
  }

  /** Per-id PQ encoding of a (deduped) batch against the STORED
    * codebooks: (sub, vec_id, code) — shared by the append write and
    * the maintain loop's code-drift counts, so a maintained drop
    * encodes ONCE.
    */
  private def pqEncode(uniq: DataFrame, pqc: DataFrame,
      m: Int, subDim: Int): DataFrame =
    (0 until m).map { s0 =>
      val sub = uniq.select(col("vec_id"),
        slice(col("embedding"), s0 * subDim + 1, subDim).as("embedding"))
      Similarity.assignWithCentroids(sub,
          pqc.filter(col("sub") === s0).select("cell", "c"))
        .select(lit(s0).as("sub"), col("vec_id"), col("cell").as("code"))
    }.reduce(_ unionByName _)

  /** [[appendAssignedIvf]]'s PQ twin over pre-computed (uniq, coarse
    * assignment, per-id codes).
    */
  private def appendAssignedPq(uniq: DataFrame, assigned: DataFrame,
      codesPerId: DataFrame, dir: String): Unit = {
    val codeArr = codesPerId.groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("ps"))
      .select(col("vec_id"), expr("transform(ps, p -> p.code)").as("codes"))
    assigned
      .join(codeArr, "vec_id")
      .join(uniq, "vec_id")
      .select("vec_id", "codes", "embedding", "cell")
      .repartition(col("cell")) // one appended file per touched cell
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assignment")
  }

  /** Code-level drift pre-flight for [[appendToIvfPqIndex]] — the
    * compressed-tier sibling of [[ivfAppendDrift]]: per (subspace,
    * code), the stored population vs the incoming batch's would-be
    * population (encoded with the STORED codebooks, no retrain), a
    * smoothed PSI per subspace, and a per-subspace retrain_due flag.
    * Catches subvector-distribution shift that leaves the coarse
    * cells balanced (the coarse PSI would stay quiet) but degrades
    * ADC quality — the codebook no longer covers where the new
    * vectors live. Everything after the two grouped counts is
    * m×k-sized; the PSI carrier mirrors [[ivfAppendDrift]].
    */
  /** [[cellCountCache]]'s compressed-tier sibling: per-(subspace, code)
    * PHYSICAL populations of a stored IVF-PQ assignment, cached per
    * generation and seeded arithmetically after un-compacted appends —
    * the code-drift pre-flight otherwise re-explodes the whole codes
    * column per drop. m×k-sized driver map.
    */
  private val codeCountCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), Map[(Int, Long), Long]](
      maxEntries = 32, release = _ => ())

  locally {
    graft.SessionCaches.register(
      evict = s => codeCountCache.removeIf(_._1 eq s, releaseRemoved = false),
      sweep = () => codeCountCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def storedCodeCounts(spark: SparkSession,
      dir: String): Map[(Int, Long), Long] = {
    graft.SessionCaches.watch(spark)
    val key = assignGenKey(spark, dir)
    codeCountCache.get(key).getOrElse {
      val m = spark.read.parquet(s"$dir/assignment")
        .select(posexplode(col("codes")).as(Seq("sub", "code")))
        .groupBy("sub", "code").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      codeCountCache.putIfAbsent(key, m)
    }
  }

  private def seedCodeCounts(spark: SparkSession, dir: String,
      counts: Map[(Int, Long), Long]): Unit = {
    codeCountCache.putIfAbsent(assignGenKey(spark, dir), counts)
    ()
  }

  /** Per-subspace codebook grids (sub → its code ids), cached per
    * pq_centroids generation — [[centroidCellIds]]'s compressed-tier
    * sibling, m×k-sized.
    */
  private val pqGridCache =
    new graft.BoundedLruCache[(SparkSession, String, Long, String), Map[Int, Seq[Long]]](
      maxEntries = 32, release = _ => ())

  locally {
    graft.SessionCaches.register(
      evict = s => pqGridCache.removeIf(_._1 eq s, releaseRemoved = false),
      sweep = () => pqGridCache.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  private def pqCodeGrid(spark: SparkSession, dir: String): Map[Int, Seq[Long]] = {
    graft.SessionCaches.watch(spark)
    val writeId = readIndexManifest(spark, dir)
      .flatMap(_.get("write_id")).getOrElse("")
    val key = (spark, s"$dir/pq_centroids",
      artifactGeneration(spark, s"$dir/pq_centroids"), writeId)
    pqGridCache.get(key).getOrElse {
      val g = loadPqCentroids(spark, dir).select("sub", "cell")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2).toSeq.sorted }
      pqGridCache.putIfAbsent(key, g)
    }
  }

  def ivfPqCodeDrift(spark: SparkSession, batch: DataFrame, dir: String,
      m: Int = 4, subDim: Int = 16, threshold: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark2 = spark
    import spark2.implicits._
    val pqc = loadPqCentroids(spark, dir)
    checkPqGeometry(spark, dir, pqc, m, subDim)
    val stored = storedCodeCounts(spark, dir).toSeq
      .map { case ((s, c), n) => (s, c, n) }
      .toDF("sub", "code", "n_stored")
    val incoming = (0 until m).map { s0 =>
      val sub = batch.select(col("vec_id"),
        slice(col("embedding"), s0 * subDim + 1, subDim).as("embedding"))
      Similarity.assignWithCentroids(sub,
          pqc.filter(col("sub") === s0).select("cell", "c"))
        .select(lit(s0).as("sub"), col("cell").as("code"))
    }.reduce(_ unionByName _)
      .groupBy("sub", "code").agg(count(lit(1)).as("n_new"))
    val grid = pqc.select(col("sub"), col("cell").as("code"))
    val cells = grid
      .join(stored, Seq("sub", "code"), "left")
      .join(incoming, Seq("sub", "code"), "left")
      .withColumn("n_stored", coalesce(col("n_stored"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val wSub = Window.partitionBy("sub") // m×k-sized frame only
    val pS = (col("n_stored") + lit(1)) / (col("t_stored") + col("k_sub"))
    val pN = (col("n_new") + lit(1)) / (col("t_new") + col("k_sub"))
    cells
      .withColumn("k_sub", count(lit(1)).over(wSub))
      .withColumn("t_stored", sum("n_stored").over(wSub))
      .withColumn("t_new", sum("n_new").over(wSub))
      .withColumn("term",
        round((pN - pS) * log(pN / pS), 8).cast("decimal(18,8)"))
      .withColumn("psi", round(sum("term").over(wSub).cast("double"), 6))
      .withColumn("psi_term", round(col("term").cast("double"), 6))
      // null-calibrated per subspace (the ivfAppendDrift rule): a
      // small batch against k codes reads (k−1)(1/t_new + 1/t_stored)
      // of smoothed PSI with no drift at all
      .withColumn("psi_null", round(
        (col("k_sub") - 1).cast("double") *
          (lit(1.0) / greatest(col("t_new"), lit(1L)) +
            lit(1.0) / greatest(col("t_stored"), lit(1L))), 6))
      .withColumn("retrain_due", col("psi") > lit(threshold) + col("psi_null"))
      .select("sub", "code", "n_stored", "n_new", "psi_term", "psi",
        "psi_null", "retrain_due")
      .orderBy("sub", "code")
  }

  /** Two-stage search over a stored IVF-PQ index ([[writeIvfPqIndex]]):
    * (1) probe — queries rank the stored coarse centroids, each
    * probing its `nprobe` nearest cells (the serving-time recall
    * knob, same contract as [[searchIvfIndex]]);
    * (2) ADC — each query builds its m×k lookup table against the
    * stored codebooks (broadcast both ways), and every vector in the
    * probed cells is scored as the exact DECIMAL sum of its m table
    * entries, reading ONLY the codes column of the pruned partitions;
    * (3) rerank — the top `cand` per query re-score by exact cosine
    * against the embedding column of the same pruned partitions
    * (broadcast candidate list). The corpus embedding table is never
    * scanned beyond the nQueries query rows, and the full-width
    * embedding column is only decoded for candidates' cells.
    */
  def searchIvfPqIndex(spark: SparkSession, emb: DataFrame, dir: String,
      nQueries: Int = 10, k: Int = 3, cand: Int = 10,
      m: Int = 4, subDim: Int = 16, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cent = loadIvfCentroids(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        Similarity.toDouble(col("embedding")).as("qv"))
    val pw = Window.partitionBy("qid").orderBy(col("pd"), col("cell"))
    val probes = q.select("qid", "qv").crossJoin(broadcast(cent))
      .withColumn("pd", Similarity.l2sq(col("qv"), col("c")))
      .withColumn("pn", row_number().over(pw))
      .filter(col("pn") <= nprobe)
      .select("qid", "cell")
    // per-query ADC lookup tables: nQueries × m × k rows — tiny
    val pqc = loadPqCentroids(spark, dir)
    checkPqGeometry(spark, dir, pqc, m, subDim)
    val qsub = (0 until m).map { s0 =>
      q.select(col("qid"),
        lit(s0).as("sub"),
        Similarity.toDouble(slice(col("qe"), s0 * subDim + 1, subDim)).as("qsv"))
    }.reduce(_ unionByName _)
    val lut = qsub.join(pqc, "sub")
      .select(col("qid"), col("sub"), col("cell").as("code"),
        Similarity.l2sq(col("qsv"), col("c")).as("dist"))
    // probed-subdirectory read from the bounded probe list — DPP
    // degenerates on this join shape (see searchIvfIndex), and both
    // serving stages must scan (and LIST) only the probed cells.
    // The collected rows double as the serving join's local relation
    // (the searchIvfIndex one-probe-computation note).
    import spark.implicits._
    val probeRows = probes.select("qid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probesLocal = probeRows.toDF("qid", "cell")
    val probedCells = probeRows.map(_._2).distinct
    val assignment = maskTombstones(spark, dir,
      readProbedCells(spark, s"$dir/assignment", probedCells))
    // stage 2: codes-only projection of the probed cells; the ADC sum
    // is exact DECIMAL so ranking never touches a folded double
    val adc = assignment.select("vec_id", "codes", "cell")
      .join(broadcast(probesLocal), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("dist").cast("decimal(18,6)")).as("adist"))
    val cw = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val candidates = adc.withColumn("crnk", row_number().over(cw))
      .filter(col("crnk") <= cand)
      .select("qid", "vec_id")
    // stage 3: exact rerank from the co-located vectors, broadcast on
    // the (nQueries × cand)-sized candidate list
    val rer = assignment.select("vec_id", "embedding")
      .join(broadcast(candidates.join(q.select("qid", "qe"), "qid")), "vec_id")
      .withColumn("cos", Similarity.cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    rer.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  /** Search a stored IVF index: queries rank the STORED centroids
    * (rounded L2, cell tiebreak — the training metric), each probing
    * its `nprobe` nearest cells, then score the assignment scan
    * FILTERED to the probed cells. The vectors live IN the cell
    * partitions ([[writeIvfIndex]] co-locates them), so a probe never
    * joins the corpus-sized embedding table — the only scan of `emb`
    * is the nQueries-bounded query side. `nprobe` is the serving-time
    * recall knob, the stored twin of
    * [[Similarity.ivfMultiProbeTopK]]'s: result-identical to the
    * in-memory multiprobe at the same nprobe (spec-proven), nprobe=1
    * reduces to [[Similarity.ivfTopK]]. The probed-cell literal
    * filter is a ≤ nQueries×nprobe list — still bounded by the query
    * batch, never by data.
    */
  /** Persist a trained IVF-SQ8 index — the int8 serving tier
    * ([[Similarity.sq8TopK]]'s scheme) under the IVF layout: ONE
    * cell-partitioned assignment table
    * (vec_id, q: array<int>, n2, ma, embedding) plus the coarse
    * centroids beside it. The columnar format makes the quantized scan
    * a PROJECTION: serving reads only (vec_id, q, n2) of the probed
    * cells — the 4×-smaller tier — while the embedding column stays
    * co-located for exact rerank and for maintenance retrains. Codes
    * come from the ONE quantization scheme ([[Similarity.sq8Codes]],
    * shared with the in-memory tier and the export), so stored serving
    * cannot diverge from [[Similarity.ivfSq8TopK]].
    */
  def writeIvfSq8Index(emb: DataFrame, dir: String, cells: Int = 8,
      iters: Int = 2, corpusKey: Option[String] = None): Unit = {
    require(iters >= 2, "a stored IVF-SQ8 index needs trained centroids (iters >= 2)")
    val cent = (corpusKey match {
      case Some(ck) =>
        Similarity.kmeansAssignCachedWithCentroids(emb, cells, iters, ck)._2
      case None => Similarity.kmeansAssignInternal(emb, cells, iters)._2.get
    })
    // cell + SQ8 codes are BOTH narrow per-row expressions (argmin over
    // the broadcast centroids / per-vector max-abs quantization), so
    // the whole layout is one projection over the scan + the cell
    // repartition — the previous two vec_id shuffle-joins bought
    // nothing (guide §2.4; see writeIvfIndex)
    // overlap the model-sized artifact with the corpus-sized
    // assignment write (guide §2.6; the writeIvfIndex pattern)
    val centF = scala.concurrent.Future {
      writeCentroidArtifact(cent, s"$dir/centroids")
    }(scala.concurrent.ExecutionContext.global)
    try {
      withNearestCell(Similarity.withSq8Codes(emb.select("vec_id", "embedding")), cent)
        .select("vec_id", "q", "n2", "ma", "embedding", "cell")
        .repartition(col("cell")) // one file per cell (see writeIvfIndex)
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell").parquet(s"$dir/assignment")
    } finally scala.concurrent.Await.ready(
      centF, scala.concurrent.duration.Duration.Inf)
    centF.value.get.get // surface an artifact-write failure
    writeIndexManifest(spark = emb.sparkSession, dir = dir,
      fields = Seq("kind" -> "ivfsq8", "cells" -> cells.toString))
    // a full (re)write is a new generation — stale tombstones must not
    // mask the new content (the writeIvfIndex contract)
    clearTombstones(emb.sparkSession, dir)
    if (corpusKey.isEmpty)
      org.apache.spark.sql.GraftShims.uncheckpoint(cent)
  }

  /** Fold a new vector batch into a stored IVF-SQ8 index WITHOUT
    * retraining: coarse-assign against the STORED centroids and
    * quantize with the per-vector max-abs scheme (no codebook to go
    * stale — unlike PQ, SQ8 appends never need code-drift tripwires
    * beyond the coarse PSI). One broadcast pass over the batch, one
    * appended file per touched cell.
    */
  def appendToIvfSq8Index(newEmb: DataFrame, dir: String): Unit = {
    val spark = newEmb.sparkSession
    requireIndexKind(spark, dir, "ivfsq8", "appendToIvfSq8Index")
    val uniq = dedupBatch(newEmb)
    val cent = loadIvfCentroids(spark, dir)
    appendAssignedSq8(uniq,
      Similarity.assignWithCentroids(uniq, cent).select("vec_id", "cell"), dir)
  }

  /** [[appendAssignedIvf]]'s SQ8 twin: quantize + write over the
    * pre-computed pair (the per-vector max-abs codes need no stored
    * artifact, so only the assignment is shared).
    */
  private def appendAssignedSq8(uniq: DataFrame, assigned: DataFrame,
      dir: String): Unit =
    assigned
      .join(Similarity.sq8Codes(uniq), "vec_id")
      .join(uniq, "vec_id")
      .select("vec_id", "q", "n2", "ma", "embedding", "cell")
      .repartition(col("cell")) // one appended file per touched cell
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assignment")

  /** Search a stored IVF-SQ8 index: queries rank the STORED centroids
    * (rounded L2, cell tiebreak — the training metric), each probing
    * its `nprobe` nearest cells, then the int8 codes of ONLY those
    * cell partitions score against the on-the-fly-quantized query
    * codes — exact 64-bit integer sums under one rounded IEEE tree,
    * the [[Similarity.ivfSq8TopK]] math verbatim, so stored serving is
    * result-identical to the in-memory tier at the same nprobe
    * (spec-proven; the two share one oracle). The scan projects
    * (vec_id, q, n2) — the embedding column of the index is never
    * read; the only scan of `emb` is the nQueries-bounded query side.
    */
  def searchIvfSq8Index(spark: SparkSession, emb: DataFrame, dir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    requireIndexKind(spark, dir, "ivfsq8", "searchIvfSq8Index")
    val cent = loadIvfCentroids(spark, dir)
    val qRows = emb.filter(col("vec_id") < nQueries)
    val q = qRows.select(col("vec_id").as("qid"),
      Similarity.toDouble(col("embedding")).as("qv"))
    val qCodes = Similarity.sq8Codes(qRows)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val pw = Window.partitionBy("qid").orderBy(col("pd"), col("cell"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("pd", Similarity.l2sq(col("qv"), col("c")))
      .withColumn("pn", row_number().over(pw))
      .filter(col("pn") <= nprobe)
      .select("qid", "cell", "pn")
    // literal partition filter from the bounded probe list (the
    // searchIvfIndex contract — DPP degenerates on this join shape);
    // the collected rows double as the serving join's local relation
    import spark.implicits._
    val probeRows = probes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val probesLocal = probeRows.toDF("qid", "cell", "pn")
    val probedCells = probeRows.map(_._2).distinct
    val assignment = maskTombstones(spark, dir,
      readProbedCells(spark, s"$dir/assignment", probedCells)
        .select("vec_id", "q", "n2", "cell"))
    val dotInt = aggregate(
      zip_with(col("qq"), col("q"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = assignment
      .join(broadcast(probesLocal.join(qCodes, "qid")), "cell")
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

  /** [[maintainIvfIndex]] for the SQ8 tier: same drift-gated
    * branch-and-log skeleton ([[maintainCore]]), with the retrain
    * rebuilding the int8 layout via [[writeIvfSq8Index]] and appends
    * folding in via [[appendToIvfSq8Index]]. Only the coarse PSI gates
    * the branch — the per-vector max-abs scheme has no trained
    * codebook to drift (the PQ code-PSI tripwire has no SQ8 analogue).
    * Geometry (cells) comes from the manifest, the values the index
    * was WRITTEN with.
    */
  def maintainIvfSq8Index(spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double = 0.25, iters: Int = 2,
      compactFilesPerCell: Int = 4): DataFrame = {
    import spark.implicits._
    requireIndexKind(spark, dir, "ivfsq8", "maintainIvfSq8Index")
    val storedCells = readIndexManifest(spark, dir)
      .flatMap(_.get("cells")).map(_.toInt)
    val o = maintainCore(spark, batch, dir, threshold, compactFilesPerCell,
      extraDue = false,
      cadenceCells = storedCells.getOrElse(
        spark.read.parquet(s"$dir/centroids").select("cell")
          .distinct().count().toInt),
      retrainWrite = (union, tmp) => manifestTargetCellSize(spark, dir) match {
        case Some(sz) => writeIvfSq8IndexSized(union, tmp, sz, iters); ()
        case None => writeIvfSq8Index(union, tmp, storedCells.getOrElse(8), iters)
      },
      append = (u, a) => appendAssignedSq8(u, a, dir),
      label = "maintainIvfSq8Index")
    Seq((o.action, o.psi, o.due, o.nStored, o.nBatch, o.nAfter,
        o.filesBefore, o.filesAfter, o.compacted))
      .toDF("action", "psi", "retrain_due", "n_stored_before", "n_batch",
        "n_after", "files_before", "files_after", "compacted")
  }

  /** Read ONLY the probed cell partitions of an assignment layout, as
    * per-subdirectory reads under `basePath` (the partition column
    * stays in the schema). A plain `spark.read.parquet(assignment)`
    * LISTS THE WHOLE TREE before partition pruning ever applies — with
    * cells ∝ N (the fixed-cell-SIZE production layout) that listing
    * was the stored-serving term that grew across the data decade
    * (measured 1.6×/decade at ×10→×100) while the probed scan itself
    * stayed constant-sized. Here serving lists ≤ nQueries×nprobe
    * directories — constant in the corpus. Cells whose directory does
    * not exist (a trained centroid that won no vectors) are skipped
    * with bounded exists() probes; if none exist, fall back to the
    * full-tree read filtered empty (schema-correct, effectively never
    * taken).
    */
  private def readProbedCells(spark: SparkSession, assignPath: String,
      cells: Seq[Long]): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(assignPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = cells.distinct
      .map(c => new org.apache.hadoop.fs.Path(base, s"cell=$c"))
      .filter(fs.exists).map(_.toString)
    if (paths.isEmpty)
      spark.read.parquet(assignPath).filter(lit(false))
    else
      spark.read.option("basePath", assignPath).parquet(paths: _*)
  }

  def searchIvfIndex(spark: SparkSession, emb: DataFrame, dir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cent = loadIvfCentroids(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
    val pw = Window.partitionBy("qid").orderBy(col("pd"), col("cell"))
    val probes = q.select("qid", "qv").crossJoin(broadcast(cent))
      .withColumn("pd", Similarity.l2sq(col("qv"), col("c")))
      .withColumn("pn", row_number().over(pw))
      .filter(col("pn") <= nprobe)
      .select("qid", "cell")
    // ≤ nQueries (qid, cell, qe) rows — THE broadcast side: the
    // cell-partitioned index scan streams against it (hash join), so
    // the big side never shuffles and the corpus embedding table is
    // never joined. The probed-cell list is collected to the driver
    // (bounded by nQueries, never by data — the upsertPartitioned
    // precedent) and applied as a LITERAL partition filter: Spark's
    // dynamic partition pruning degenerates to
    // `dynamicpruningexpression(true)` on this join shape (verified
    // on the executed plan), which would silently scan EVERY cell.
    // ONE probe computation: the probed-cell literal filter already
    // collects the (bounded, ≤ nQueries×nprobe) probe list — reuse
    // those rows as a local relation for the serving join instead of
    // recomputing the probe ranking (query-side parquet scan +
    // centroid broadcast + window) a second time inside the
    // broadcast-build. Collected rows are deterministic, so the join
    // input is identical.
    import spark.implicits._
    val probeRows = probes.select("qid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probesLocal = probeRows.toDF("qid", "cell")
    val cand = probesLocal.join(q.select("qid", "qe"), "qid")
    val probedCells = probeRows.map(_._2).distinct
    val assignment = maskTombstones(spark, dir,
      readProbedCells(spark, s"$dir/assignment", probedCells))
    val scored = assignment
      .join(broadcast(cand), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", Similarity.cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "cell", "rnk", "vec_id", "cos")
      .orderBy("qid", "rnk")
  }

  // ==== stored incremental-dedup text index ==========================
  //
  // The on-disk form of the existing-corpus index Dedup.incrementalDedup
  // builds (exact fingerprints, distinct shingles, MinHash band rows) —
  // the durability the session cache can't give: a restarted driver
  // reloads the index from parquet instead of re-shingling and
  // re-hashing the full corpus before it can classify the next batch.
  // Same manifest/append/compact lifecycle as the IVF family.
  //
  // Layout (all three tables partitioned so classify prunes):
  //  - fingerprints/fpb=XX/  (fp, doc_id)    — RAW rows, fpb = first two
  //    hex chars of the md5 (256 buckets). Raw instead of the cached
  //    path's pre-aggregated fp → min(doc_id) so appends stay
  //    append-only; the min folds at classify time, scoped to the
  //    batch's fingerprint space.
  //  - shingles/db=N/        (doc_id, s)     — distinct word n-grams,
  //    db = doc_id mod 256. Verification reads ONLY the buckets holding
  //    candidate partners (≤256 literal partition values, driver-safe).
  //  - bands/band=B/         (bv, doc_id)    — UNCAPPED band rows (a
  //    fixed `bands` per doc — linear storage); the lshBucketCap
  //    population cap applies at CLASSIFY time over the probed buckets.
  //    Capping on read instead of on write is what makes the stored
  //    index equal-by-construction to rebuilding on the full accepted
  //    corpus: the cap keeps the lowest doc_ids per bucket, and that
  //    set is the same whether computed over one build or over
  //    build + appends, in ANY append order. (The cached path caps at
  //    build because its corpus is fixed for the session.)
  //
  // Cost model per classify: batch-side shingling/hashing is
  // batch-proportional; index reads are one fingerprint-bucket-pruned
  // scan, one band scan semi-joined to the batch's buckets, and one
  // shingle scan pruned to candidate doc buckets — columnar slim-row
  // scans with rowgroup stats (tables are written sorted), never a
  // recompute of the corpus. Verification fan-in stays bounded by the
  // read-time cap exactly as in the cached path.
  //
  // Append contract: append each accepted doc EXACTLY once (classify
  // already says which docs are new — the caller appends that split).
  // A re-appended doc_id would double its stored shingle rows and
  // corrupt its Jaccard sizes; compactDedupIndex restores the distinct
  // invariants as defense in depth.

  // INTEGER buckets on both partition grids, deliberately: parquet
  // partition-value type inference reads "00".."ff" STRING buckets back
  // as integers whenever an index's bucket set happens to be all-
  // numeric (a small index can hit this), silently breaking the
  // leading-zero directory names and the isin pruning; crc32/pmod
  // buckets are type-stable under inference
  private def dedupFpBucket(fp: org.apache.spark.sql.Column) =
    pmod(crc32(fp.cast("string")), lit(256L))

  private def dedupFpRows(docs: DataFrame): DataFrame =
    Dedup.exactFpRows(docs).withColumn("fpb", dedupFpBucket(col("fp")))

  private def dedupShingleRows(docs: DataFrame): DataFrame =
    Dedup.shingles(docs).withColumn("db", pmod(col("doc_id"), lit(256L)))

  private def dedupIndexManifest(spark: SparkSession, dir: String): Unit =
    writeIndexManifest(spark, dir, Seq(
      "kind" -> "dedup_text",
      "shingle_n" -> "3",
      "bands" -> (Dedup.minhashSeeds / Dedup.minhashBandSize).toString,
      "band_cap" -> Dedup.lshBucketCap.toString))

  /** Build the stored dedup index at `dir` from the accepted corpus —
    * one shingling pass feeds both the shingle table and the band
    * rows. Each table lands one file per partition (the writeIvfIndex
    * layout rule: repartition on the partition column first).
    */
  def writeDedupIndex(existing: DataFrame, dir: String): Unit = {
    val spark = existing.sparkSession
    val sh = dedupShingleRows(existing).localCheckpoint()
    // static overwrite pinned per-write (the writeIvfIndex rule): a
    // session configured for dynamic partition overwrite must not turn
    // this full rebuild into a touched-partitions-only one
    sh.repartition(col("db")).sortWithinPartitions("db", "doc_id", "s")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("db").parquet(s"$dir/shingles")
    dedupFpRows(existing)
      .repartition(col("fpb")).sortWithinPartitions("fpb", "fp")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("fpb").parquet(s"$dir/fingerprints")
    Dedup.bandRowsOf(sh.drop("db"))
      .repartition(col("band")).sortWithinPartitions("band", "bv", "doc_id")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("band").parquet(s"$dir/bands")
    // a full rebuild is a new generation: stale tombstones from the
    // previous index must not mask docs the new corpus legitimately
    // contains (the clearTombstones rule every IVF-family build
    // follows) — without this, a rebuilt-over index classifies exact
    // copies of previously-deleted doc_ids as 'new' forever
    clearTombstones(spark, dir)
    dedupIndexManifest(spark, dir)
    org.apache.spark.sql.GraftShims.uncheckpoint(sh)
  }

  /** Append an accepted batch to the stored dedup index — three
    * batch-proportional appends, no stored row rewritten. After the
    * append the index is equal-by-construction to [[writeDedupIndex]]
    * on the union corpus (raw fingerprints min-fold at read; shingles
    * are per-doc and doc_ids are new; the band cap applies at read).
    */
  def appendToDedupIndex(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    requireIndexKind(spark, dir, "dedup_text", "appendToDedupIndex")
    require(pathExists(spark, s"$dir/bands"),
      s"appendToDedupIndex: no dedup index at $dir (missing bands table)")
    val sh = dedupShingleRows(batch).localCheckpoint()
    sh.repartition(col("db")).sortWithinPartitions("db", "doc_id", "s")
      .write.mode("append").partitionBy("db").parquet(s"$dir/shingles")
    dedupFpRows(batch)
      .repartition(col("fpb")).sortWithinPartitions("fpb", "fp")
      .write.mode("append").partitionBy("fpb").parquet(s"$dir/fingerprints")
    Dedup.bandRowsOf(sh.drop("db"))
      .repartition(col("band")).sortWithinPartitions("band", "bv", "doc_id")
      .write.mode("append").partitionBy("band").parquet(s"$dir/bands")
    // fresh write_id: any generation-keyed consumer of this index must
    // miss its cache after an append
    dedupIndexManifest(spark, dir)
    org.apache.spark.sql.GraftShims.uncheckpoint(sh)
  }

  /** Takedown-delete from the stored dedup index: the doc ids land as
    * one tiny id-only parquet file beside the index (the
    * [[deleteFromIvfIndex]] shape — licensing/PII removals are
    * O(ids) writes, never a corpus-sized rewrite). Classification
    * masks tombstoned docs BEFORE the read-time band cap and before
    * the fingerprint min-fold, so a masked index classifies
    * identically to one REBUILT on the corpus minus the deleted docs:
    * a bucket whose capped slots held a deleted doc promotes the next
    * lowest doc_id exactly as the rebuild would, and an exact-dup
    * batch doc whose only stored twin was deleted falls through to
    * near/new. [[compactDedupIndex]] purges the rows physically and
    * consumes the tombstones. Re-adding a deleted doc_id requires a
    * compact between the delete and the re-append (tombstone-wins,
    * as in the IVF family — there is no sequence ordering between
    * them).
    */
  def deleteFromDedupIndex(spark: SparkSession, dir: String,
      docIds: DataFrame): Unit = {
    requireIndexKind(spark, dir, "dedup_text", "deleteFromDedupIndex")
    require(pathExists(spark, s"$dir/bands"),
      s"deleteFromDedupIndex: no dedup index at $dir (missing bands table)")
    val d = docIds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    // an empty delete must not write a schema-only file that would
    // flip every future classify onto the masking plan for nothing
    if (!d.isEmpty) {
      d.coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
      // fresh write_id: generation-keyed consumers must miss their
      // cache — the index's served content just changed
      dedupIndexManifest(spark, dir)
    }
    org.apache.spark.sql.GraftShims.uncheckpoint(d)
  }

  /** The live tombstone set of a stored dedup index — None when no
    * delete has ever happened, so tombstone-free classify plans carry
    * no masking joins (FS metadata check only). Pinned to the listed
    * file set and tolerant of files vanishing before execution, for
    * the same reason as the IVF [[tombstones]] reader: a concurrent
    * compact deletes exactly the files it consumed.
    */
  private def dedupTombstones(spark: SparkSession,
      dir: String): Option[DataFrame] =
    tombstones(spark, dir, idCol = "doc_id")

  /** Classify a new batch against the STORED index — the restart-safe
    * twin of [[Dedup.incrementalDedup]]: same verdict schema
    * (doc_id, verdict ∈ exact|near|new, dup_of, jaccard), same
    * verification core ([[Dedup.classifyCore]]), the index read from
    * parquet instead of a session cache. Identical output to the
    * cached path on the same corpus by construction. Tombstoned docs
    * ([[deleteFromDedupIndex]]) are masked out of both the exact and
    * the near path — before the band cap, so capped buckets promote
    * exactly as a rebuild on the filtered corpus would.
    */
  def classifyWithDedupIndex(spark: SparkSession, batch: DataFrame,
      dir: String, threshold: Double = 0.5): DataFrame = {
    requireIndexKind(spark, dir, "dedup_text", "classifyWithDedupIndex")
    require(pathExists(spark, s"$dir/bands"),
      s"classifyWithDedupIndex: no dedup index at $dir (missing bands table)")
    // version-skew guard: the batch is shingled/banded with THIS
    // binary's constants — if they differ from the build-time geometry
    // the manifest records, batch band values never match stored ones
    // and every near-dup silently classifies 'new'. Fail loudly
    // instead (legacy manifests without the fields skip the check).
    readIndexManifest(spark, dir).foreach { m =>
      def chk(k: String, cur: Long): Unit = m.get(k).foreach(v =>
        require(v.toLong == cur,
          s"classifyWithDedupIndex: index at $dir was built with $k=$v " +
            s"but this binary uses $k=$cur — rebuild the index or run " +
            "the matching engine version"))
      chk("shingle_n", 3L)
      chk("bands", (Dedup.minhashSeeds / Dedup.minhashBandSize).toLong)
      chk("band_cap", Dedup.lshBucketCap.toLong)
    }
    val bFp = batch.select(col("doc_id"), md5(col("text")).as("fp"))
      .localCheckpoint()
    // takedown masking: identity when no delete ever happened; else a
    // broadcast anti-join on the tiny tombstone set, applied to the
    // stored side of BOTH match paths (below) before any fold or cap
    val tombOpt = dedupTombstones(spark, dir)
    def mask(stored: DataFrame): DataFrame = tombOpt
      .map(t => stored.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .getOrElse(stored)
    // fingerprint store pruned to the batch's fp buckets (≤256 literal
    // values — bounded by the bucket grid, never by the batch), then
    // scoped to the batch's exact fingerprints before the min fold so
    // the aggregate is collision-sized, not bucket-sized (the mask
    // rides the collision-sized set too)
    val fpbs = bFp.select(dedupFpBucket(col("fp")).as("fpb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val exFp = mask(spark.read.parquet(s"$dir/fingerprints")
        .filter(col("fpb").isin(fpbs: _*))
        .join(bFp.select("fp").distinct(), Seq("fp"), "left_semi"))
      .groupBy("fp").agg(min("doc_id").as("ex_exact"))
    val bSh = Dedup.shingles(batch).localCheckpoint()
    val bBands = Dedup.bandRowsOf(bSh).localCheckpoint()
    // stored band rows in batch-touched buckets only, MASKED before
    // the read-time population cap (== the build-time cap a rebuild
    // on the filtered corpus would apply to these rows: a deleted doc
    // that held a capped slot frees it for the next lowest doc_id)
    val exCapped = Dedup.capBandRows(
      mask(spark.read.parquet(s"$dir/bands")
        .join(bBands.select("band", "bv").distinct(), Seq("band", "bv"),
          "left_semi")))
    val cands = bBands.as("q").join(exCapped.as("e"),
        col("q.band") === col("e.band") && col("q.bv") === col("e.bv"))
      .select(col("q.doc_id").as("doc_a"), col("e.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint() // two consumers: bucket collect + verification
    // shingle store pruned to candidate partners' doc buckets (≤256
    // literal partition values), then to the candidate docs themselves;
    // each kept doc keeps its FULL shingle set (classifyCore contract).
    // No tombstone mask needed here: candidates come from the MASKED
    // band rows above, so a deleted doc can never appear as a doc_b
    val dbs = cands.select(pmod(col("doc_b"), lit(256L)).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val shStore = spark.read.parquet(s"$dir/shingles")
    val exSh = (if (dbs.isEmpty) shStore.filter(lit(false))
                else shStore.filter(col("db").isin(dbs: _*)))
      .select("doc_id", "s")
      .join(cands.select(col("doc_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
    val result = Dedup.classifyCore(bFp, exFp, bSh, exSh, cands, threshold)
    Seq(bFp, bSh, bBands, cands)
      .foreach(org.apache.spark.sql.GraftShims.uncheckpoint)
    result
  }

  /** The production ingest loop as ONE operator: classify the batch
    * against the stored index, append the ACCEPTED split (verdict
    * 'new' — exact and near dups are dropped, the whole point of
    * ingest-time dedup), return the per-doc verdicts. Sequencing is
    * safe because [[Dedup.classifyCore]] materializes the verdict
    * frame eagerly (localCheckpoint) — the append below cannot leak
    * into the classification that decided it. Called per micro-batch
    * this GROWS the index between triggers, so a later batch's copy
    * of an earlier batch's accepted doc classifies exact/near — the
    * sequential semantics the ingest-loop oracle unrolls batch by
    * batch. Cost per call: classify (batch-proportional probes of the
    * pruned index) + an accepted-sized append; never a corpus scan.
    */
  def maintainDedupIndex(spark: SparkSession, batch: DataFrame,
      dir: String, threshold: Double = 0.5): DataFrame = {
    val verdicts = classifyWithDedupIndex(spark, batch, dir, threshold)
    // materialized once: the semi-join otherwise re-runs for the
    // emptiness check AND each of the append's table derivations,
    // tripling the batch scan the per-trigger cost model bills once
    val accepted = batch
      .join(verdicts.filter(col("verdict") === "new").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .localCheckpoint()
    // an all-dup batch appends nothing — and must not touch the
    // manifest either (the index content did not change)
    if (!accepted.isEmpty)
      appendToDedupIndex(accepted.select("doc_id", "text"), dir)
    org.apache.spark.sql.GraftShims.uncheckpoint(accepted)
    verdicts
  }

  /** Compact the stored dedup index: rewrite each table back to the
    * one-file-per-partition layout (appends add a file per call),
    * restore the distinct invariants (defense in depth against a
    * violated append contract), and physically PURGE tombstoned docs
    * ([[deleteFromDedupIndex]]) — the anti-join rides a pass that was
    * already rewriting every row, and the consumed tombstone file set
    * is pinned up front so a delete landing mid-compact keeps its
    * tombstone (the [[compactIvfIndex]] rule). Same rename-aside swap
    * discipline — the index stays serveable through the rewrite, and
    * a crash leaves either tree recoverable; a crash between the
    * swaps and the tombstone cleanup is safe (tombstones over
    * already-purged ids anti-join nothing).
    */
  def compactDedupIndex(spark: SparkSession, dir: String): Unit = {
    requireIndexKind(spark, dir, "dedup_text", "compactDedupIndex")
    val tombFiles = {
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      forEachDataFile(spark, s"$dir/tombstones")(f => buf += f.getPath.toString)
      buf.toSeq
    }
    val tombs =
      if (tombFiles.isEmpty) None
      else Some(spark.read.parquet(tombFiles: _*).select("doc_id").distinct())
    def rewrite(table: String, keys: Seq[String], part: String): Unit = {
      val tmp = s"$dir/${table}__compact"
      val src = spark.read.parquet(s"$dir/$table")
      tombs.fold(src)(t => src.join(broadcast(t), Seq("doc_id"), "left_anti"))
        .dropDuplicates(keys)
        .repartition(col(part)).sortWithinPartitions(keys.map(col): _*)
        .write.mode("overwrite").option("partitionOverwriteMode", "static")
        .partitionBy(part).parquet(tmp)
      checkedSwap(spark, tmp, s"$dir/$table", "compactDedupIndex")
    }
    rewrite("shingles", Seq("db", "doc_id", "s"), "db")
    rewrite("fingerprints", Seq("fpb", "fp", "doc_id"), "fpb")
    rewrite("bands", Seq("band", "bv", "doc_id"), "band")
    if (tombFiles.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      tombFiles.foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), false): Unit)
    }
    dedupIndexManifest(spark, dir)
  }

  // ───────────────────────── stored BPE tokenizer ─────────────────────

  private def bpeManifest(spark: SparkSession, dir: String,
      rounds: Int, batchSize: Int, nMerges: Long): Unit =
    writeIndexManifest(spark, dir, Seq(
      "kind" -> "bpe_tokenizer",
      "rounds" -> rounds.toString,
      "batch_size" -> batchSize.toString,
      "n_merges" -> nMerges.toString))

  /** Persist a trained tokenizer as a versioned artifact: the batched
    * trainer's merge table ([[graft.operators.TextOps.bpeTrainMergesBatched]],
    * (iter, round, rk, pair_left, pair_right, merged, n)) as one
    * parquet file under `dir/merges` plus the manifest. A tokenizer is
    * trained ONCE and then applied to the full corpus (and every future
    * batch) — without the stored artifact each encode query retrains,
    * which at 100 TB is a full extra training pass per consumer. The
    * table is merges-sized (≤ rounds × batchSize rows; 32k for a
    * production vocabulary), so one file is the correct layout.
    */
  def writeBpeTokenizer(docs: DataFrame, dir: String,
      rounds: Int = 3, batchSize: Int = 3): Unit = {
    val spark = docs.sparkSession
    val merges = TextOps.bpeTrainMergesBatched(docs, rounds, batchSize)
      .localCheckpoint()
    val n = merges.count()
    // fail at WRITE time, not at some later consumer's load: a trainer
    // that learned nothing (no adjacent symbol pairs anywhere in the
    // vocabulary) would store an empty artifact, which the artifact
    // cache rejects as corrupt on every load
    require(n > 0, "writeBpeTokenizer: trainer learned no merges — " +
      "the corpus vocabulary has no adjacent symbol pairs")
    merges.orderBy("iter").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
    bpeManifest(spark, dir, rounds, batchSize, n)
    org.apache.spark.sql.GraftShims.uncheckpoint(merges)
  }

  /** Load the stored merge table, cached per artifact generation
    * ([[cachedArtifactLoad]]) — repeated encodes against an unchanged
    * tokenizer skip the read. Feeds
    * [[graft.operators.TextOps.bpeEncodeBatched]] directly.
    */
  def loadBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    requireIndexKind(spark, dir, "bpe_tokenizer", "loadBpeMerges")
    require(pathExists(spark, s"$dir/merges"),
      s"loadBpeMerges: no tokenizer artifact at $dir (missing merges table)")
    cachedArtifactLoad(spark, s"$dir/merges") {
      spark.read.parquet(s"$dir/merges")
    }
  }

  /** Encode a corpus with the STORED tokenizer — the production
    * train-once/apply-everywhere path: one merges-sized artifact read
    * (cached per generation), then the batched encode's single
    * vocab-sized pass over `docs`. Never retrains.
    */
  def encodeWithBpeTokenizer(spark: SparkSession, docs: DataFrame,
      dir: String): DataFrame =
    TextOps.bpeEncodeBatched(docs, loadBpeMerges(spark, dir))

  /** CONTINUE training the stored tokenizer on a new corpus — the
    * domain-shift leg of the artifact lifecycle (a code-heavy or
    * multilingual batch arrives; the vocabulary must grow without
    * recounting the original corpus). The stored merges are applied to
    * the new corpus's vocabulary first ([[graft.operators.TextOps.bpeTrainBatchedFrom]]),
    * then `rounds` more batched rounds run THERE; the new merge rows
    * append to `dir/merges` with iter continuing from `n_merges` and
    * round from the manifest's `rounds` (manifest fields, not stored
    * maxima — a phase that exhausted early still hands the next phase
    * its full round budget, keeping the numbering restart-derivable).
    * Extending on the SAME corpus is bit-identical to one longer
    * single-shot train (DriftBpeSpec). The driver-side collect is
    * merges-sized (the training output bound), never corpus-sized.
    */
  def extendBpeTokenizer(newDocs: DataFrame, dir: String,
      rounds: Int = 3, batchSize: Int = 3): Unit = {
    val spark = newDocs.sparkSession
    val stored = loadBpeMerges(spark, dir).orderBy("iter").collect()
    val init = stored.toSeq.map(r =>
      (r.getAs[String]("pair_left"), r.getAs[String]("pair_right")))
    val m = readIndexManifest(spark, dir).getOrElse(Map.empty)
    val iterOffset = m.get("n_merges").map(_.toInt).getOrElse(stored.length)
    val roundOffset = m.get("rounds").map(_.toInt).getOrElse(0)
    val newMerges = TextOps.bpeTrainBatchedFrom(newDocs, init, rounds,
      batchSize, iterOffset, roundOffset).localCheckpoint()
    val n = newMerges.count()
    if (n > 0)
      newMerges.orderBy("iter").coalesce(1)
        .write.mode("append").parquet(s"$dir/merges")
    // manifest rewrite (fresh write_id) even when the batch learned
    // nothing: the recorded round budget advanced, and the next
    // extension must number its rounds after THIS one's
    bpeManifest(spark, dir, roundOffset + rounds, batchSize, iterOffset + n)
    org.apache.spark.sql.GraftShims.uncheckpoint(newMerges)
  }
}
