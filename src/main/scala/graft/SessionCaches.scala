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
