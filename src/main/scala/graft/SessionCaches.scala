package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle registry for session-scoped caches ([[Tables]] stocks
  * derivations, [[operators.Similarity]] trained quantizers): each cache
  * registers a targeted per-session evictor plus a sweep for entries
  * whose context has stopped, so a long-lived multi-tenant JVM never
  * pins a dead session's object graph — and a live session's
  * persisted/checkpointed blocks can be released explicitly when a
  * tenant is done.
  *
  * Two paths, because Spark has two end-of-life shapes:
  *  - `SparkSession.newSession()` wrappers die logically while their
  *    shared context lives on → callers use [[evictSession]], which
  *    must actively unpersist blocks;
  *  - a stopped CONTEXT already dropped every block with its executors
  *    → the ApplicationEnd listener ([[watch]]) runs [[sweepStopped]],
  *    which only needs to drop the JVM references.
  */
object SessionCaches {

  private final case class Hooks(evict: SparkSession => Unit, sweep: () => Unit)
  private val hooks = new java.util.concurrent.ConcurrentLinkedQueue[Hooks]()
  private val watched = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register a cache's eviction hooks (done once, in the cache owner's
    * object initializer).
    */
  def register(evict: SparkSession => Unit, sweep: () => Unit): Unit = {
    hooks.add(Hooks(evict, sweep)): Unit
  }

  /** Drop every registered cache's entries for `spark` and release
    * their storage (unpersist/uncheckpoint) — the multi-tenant
    * "this session is done" call.
    */
  def evictSession(spark: SparkSession): Unit = hooks.forEach(h => h.evict(spark))

  /** Drop entries whose owning context has stopped. Their blocks died
    * with the executors; this releases the driver-side references.
    */
  def sweepStopped(): Unit = hooks.forEach(h => h.sweep())

  /** Hook `spark`'s context once: application end triggers the sweep,
    * so sequential sessions in one JVM (bench harnesses, notebooks
    * restarting Spark) don't accumulate dead cache entries.
    */
  def watch(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (watched.add(sc.applicationId)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          sweepStopped()
      })
    }
  }
}

/** Session-scoped pool for TERMINAL localCheckpoints — frames the
  * returned plan keeps reading from, so the call site can never release
  * them itself. Keyed by (session, call-site label, input plan
  * semantics): a repeated call over the same input reuses one block set
  * (and skips the materialization job), superseded ones release on
  * LRU eviction or session end — the vocabPrune-class leak closed
  * generically for the operators whose terminal frame is data-sized
  * ([[operators.Graph]] edge sets, [[operators.Basket]] incidence,
  * the streaming near-dup verify's shingle table).
  */
object CheckpointPool {
  import org.apache.spark.sql.DataFrame

  // sized for several tenants × five-plus call sites × a few distinct
  // inputs each: eviction is the leak BACKSTOP, not a working-set cap —
  // an evicted entry's blocks are released under any caller still
  // holding the old frame (the BoundedLruCache contract), so the bound
  // sits well above any realistic concurrent working set
  private val pool =
    new BoundedLruCache[(SparkSession, String, Int, Long), DataFrame](
      maxEntries = 64,
      release = df =>
        if (!df.sparkSession.sparkContext.isStopped)
          org.apache.spark.sql.GraftShims.uncheckpoint(df))

  locally {
    SessionCaches.register(
      evict = s => pool.removeIf(_._1 eq s,
        releaseRemoved = !s.sparkContext.isStopped),
      sweep = () => pool.removeIf(_._1.sparkContext.isStopped,
        releaseRemoved = false))
  }

  /** File-level generation stamp of every file-source leaf in `plan`:
    * Spark's `InMemoryFileIndex` equality (and therefore
    * `semanticHash`) compares ROOT PATHS only, so two reads of the same
    * directory hash equal even after its files were rewritten — a
    * plan-keyed cache would serve the old snapshot. Folding (mtime,
    * count, bytes) over each leaf's root paths makes a same-path
    * rewrite a cache MISS (the Sink artifact-cache precedent). One FS
    * listing per call, no file opened; commutative fold, so listing
    * order can't flip the stamp. Plans with no file leaves stamp 0.
    */
  def planGeneration(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    var stamp = 0L
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fsRel: HadoopFsRelation =>
            fsRel.location.rootPaths.foreach { p =>
              val fs = p.getFileSystem(conf)
              if (fs.exists(p)) {
                val it = fs.listFiles(p, true)
                while (it.hasNext) {
                  val f = it.next()
                  val name = f.getPath.getName
                  if (!name.startsWith("_") && !name.startsWith("."))
                    stamp += f.getModificationTime * 31 + f.getLen + 1
                }
              }
            }
          case _ =>
        }
      case _ =>
    }
    stamp
  }

  /** Checkpoint `plan` once per (session, label, plan, file generation)
    * and reuse. The build runs outside the lock; a lost putIfAbsent
    * race releases the loser. Plans whose leaves are themselves
    * checkpoints (unique LogicalRDD ids) get per-call keys — the pool
    * then degrades to a bounded FIFO of block sets, which is the
    * backstop this exists for.
    *
    * A winning insert also evicts any SUPERSEDED generation of the
    * same (session, label, plan): a streaming consumer re-reading a
    * growing directory mints a new generation per micro-batch, and the
    * old ones can never be hit again (the file set only grows) — left
    * to global LRU pressure they would pin up to the pool bound of
    * corpus-sized block sets and evict other operators' live entries.
    * The eviction PARKS the superseded entry for one turnover instead
    * of releasing inline (a concurrent holder mid-job on the old
    * generation keeps its blocks until the next supersession), so the
    * steady-state footprint is live + ONE parked generation GLOBALLY:
    * the deferred slot is shared across labels and with cap-overflow
    * eviction, so a supersession on ANY label (or a cap overflow)
    * releases the previously parked generation — the mid-job-holder
    * cushion is one global turnover, which under concurrent labels can
    * be shorter than a same-label turnover (best-effort by design; the
    * real protection for long-held frames is the cap sizing).
    * Same-label entries over DIFFERENT plans (other directories) are
    * untouched, so alternating inputs under one label still coexist.
    */
  def cached(label: String)(plan: DataFrame): DataFrame = {
    val spark = plan.sparkSession
    SessionCaches.watch(spark)
    val semHash = plan.queryExecution.analyzed.semanticHash()
    val gen = planGeneration(plan)
    val key = (spark, label, semHash, gen)
    pool.get(key).getOrElse {
      val built = plan.localCheckpoint()
      val winner = pool.putIfAbsent(key, built)
      if (winner ne built)
        org.apache.spark.sql.GraftShims.uncheckpoint(built)
      else
        // PARK the superseded generation (one-turnover deferred release,
        // the pool's release fn already no-ops on a stopped context) —
        // an inline release here could yank blocks from under a
        // concurrent consumer that fetched the old generation and is
        // still mid-job on it
        pool.removeIfDeferred(k => (k._1 eq spark) && k._2 == label &&
          k._3 == semHash && k._4 != gen)
      winner
    }
  }
}

/** Access-ordered LRU cache bounded at `maxEntries` — the storage-safety
  * companion to [[SessionCaches]]: session-scoped caches of
  * localCheckpoint'ed frames ([[operators.Similarity]] quantizer/PQ,
  * [[operators.Dedup]] pair lists) previously grew without bound for the
  * session's lifetime, pinning one set of checkpoint blocks per distinct
  * (corpus, geometry) key. This bounds the footprint: inserting past the
  * cap evicts the least-recently-used entry and hands it to `release`
  * (uncheckpoint/unpersist), which runs OUTSIDE the lock.
  *
  * Eviction contract: a caller that still holds an evicted frame sees
  * its blocks released — subsequent actions on it fail rather than
  * silently recompute (checkpoint lineage is truncated). Caps are
  * therefore sized well above any realistic concurrent working set;
  * eviction is a leak backstop, not a hot path. As an extra cushion
  * against the get-then-evicted race (a frame fetched by one thread
  * while another thread's insert evicts it), release is DEFERRED by
  * one eviction generation: the blocks behind generation g's evictees
  * are freed when generation g+1 evicts — a holder would have to stay
  * mid-computation across two full cap-overflow cycles to observe a
  * released block. Worst-case extra footprint: one generation
  * (typically a single entry).
  */
final class BoundedLruCache[K, V](maxEntries: Int, release: V => Unit) {
  require(maxEntries > 0, "maxEntries must be positive")
  // accessOrder=true: get() refreshes recency, so the evictee is the
  // least-recently-USED key, not merely the oldest insertion
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true)
  // evictees awaiting release until the next eviction generation —
  // KEYED, so removeIf can match a session's parked values (a session
  // whose only pool state is a parked frame must not stay pinned until
  // an unrelated future turnover)
  private var deferred = List.empty[(K, V)]

  def get(k: K): Option[V] = synchronized { Option(m.get(k)) }

  def size: Int = synchronized { m.size() }

  /** putIfAbsent semantics plus the LRU bound: returns the value that
    * won (the existing one on a lost race — the caller releases its
    * loser). Values evicted by the bound are parked for one generation
    * and released after the lock is dropped, so a slow unpersist never
    * blocks unrelated keys.
    */
  def putIfAbsent(k: K, v: V): V = {
    var toRelease = List.empty[V]
    val winner = synchronized {
      val prev = m.get(k)
      if (prev != null) prev
      else {
        m.put(k, v)
        var evicted = List.empty[(K, V)]
        while (m.size() > maxEntries) {
          val it = m.entrySet().iterator()
          val e = it.next()
          evicted ::= (e.getKey -> e.getValue)
          it.remove()
        }
        if (evicted.nonEmpty) {
          // release the PREVIOUS generation, park this one
          toRelease = deferred.map(_._2)
          deferred = evicted
        }
        v
      }
    }
    toRelease.foreach(release)
    winner
  }

  /** Remove entries whose key matches `p` — live AND parked: the
    * deferred generation keeps its keys, so a session-end call releases
    * exactly its own parked frames too (a session whose only pool state
    * is a parked superseded frame must not stay pinned until an
    * unrelated future turnover). `releaseRemoved` = false when the
    * owning context already stopped (its blocks died with the
    * executors; only the JVM references need dropping — matching parked
    * references are dropped without a release for the same reason).
    */
  /** [[removeIf]] that PARKS the removed values in the deferred
    * generation instead of releasing inline — for supersession
    * evictions of entries a concurrent holder may still be reading
    * (e.g. one consumer mid-job on a pooled frame while another's
    * winning insert advances the file generation). Parking swaps
    * generations exactly like the cap-overflow path: the PRIOR
    * deferred generation is released, the new evictees take its
    * place — same one-turnover cushion, same one-generation worst-case
    * extra footprint, so a long-running supersession stream still
    * keeps only one stale generation pinned.
    */
  def removeIfDeferred(p: K => Boolean): Unit = {
    var toRelease = List.empty[V]
    synchronized {
      var parked = List.empty[(K, V)]
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (p(e.getKey)) {
          parked ::= (e.getKey -> e.getValue)
          it.remove()
        }
      }
      if (parked.nonEmpty) {
        toRelease = deferred.map(_._2)
        deferred = parked
      }
    }
    toRelease.foreach(release)
  }

  def removeIf(p: K => Boolean, releaseRemoved: Boolean): Unit = {
    var removed = List.empty[V]
    synchronized {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (p(e.getKey)) {
          if (releaseRemoved) removed ::= e.getValue
          it.remove()
        }
      }
      // parked values are keyed, so this removal matches them EXACTLY:
      // a session-end call releases its own parked frames (previously
      // they stayed pinned until an unrelated future turnover) and a
      // stopped-context sweep drops their references without a release
      // (the blocks died with the executors) — other sessions' parked
      // cushion is untouched either way
      val (hit, kept) = deferred.partition(e => p(e._1))
      deferred = kept
      if (releaseRemoved) removed = removed ++ hit.map(_._2)
    }
    removed.foreach(release)
  }
}
