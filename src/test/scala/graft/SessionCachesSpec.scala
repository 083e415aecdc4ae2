package graft

import org.apache.spark.storage.StorageLevel
import graft.operators.Similarity

/** Cache lifecycle: the session-scoped stocks and trained-quantizer
  * caches must evict per tenant (releasing blocks while the context
  * lives) and must not let one tenant's eviction touch another's
  * entries — the multi-tenant JVM contract.
  */
class SessionCachesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stocks cache: per-session entries, tenant eviction unpersists only that tenant") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val a1 = Tables.stocks(s1, sfDir)
    val a2 = Tables.stocks(s2, sfDir)
    // cached: repeated fetch is the same frame, persisted
    assert(Tables.stocks(s1, sfDir) eq a1)
    assert(a1.storageLevel != StorageLevel.NONE)
    assert(a2.storageLevel != StorageLevel.NONE)

    SessionCaches.evictSession(s1)
    // s1's entry is gone (a fresh fetch re-derives) and its blocks are
    // released; s2's entry is untouched
    assert(a1.storageLevel == StorageLevel.NONE)
    assert(!(Tables.stocks(s1, sfDir) eq a1))
    assert(Tables.stocks(s2, sfDir) eq a2)
    assert(a2.storageLevel != StorageLevel.NONE)
    SessionCaches.evictSession(s1)
    SessionCaches.evictSession(s2)
  }

  test("quantizer cache: tenant eviction releases the checkpoint and forces retrain") {
    import org.apache.spark.sql.GraftShims
    val s1 = spark.newSession()
    val emb = Tables.embeddings(s1, sfDir)
    val q1 = Similarity.kmeansAssignCached(emb, 8, 2, "spec-corpus")
    assert(Similarity.kmeansAssignCached(emb, 8, 2, "spec-corpus") eq q1)
    // the trained assignment is a checkpointed frame with live blocks
    // (checked on q1's own RDD — the context-global persistent-RDD
    // census races with concurrently-running suites)
    assert(GraftShims.checkpointStorageLevel(q1).exists(_ != StorageLevel.NONE),
      "training must have checkpointed the assignment")

    SessionCaches.evictSession(s1)
    assert(GraftShims.checkpointStorageLevel(q1).contains(StorageLevel.NONE),
      "eviction must release the quantizer checkpoint blocks")
    val q2 = Similarity.kmeansAssignCached(emb, 8, 2, "spec-corpus")
    assert(!(q2 eq q1), "a fresh fetch after eviction must retrain")
    SessionCaches.evictSession(s1)
  }

  test("sweepStopped keeps entries whose context is alive") {
    val s = spark.newSession()
    val a = Tables.stocks(s, sfDir)
    SessionCaches.sweepStopped()
    assert(Tables.stocks(s, sfDir) eq a)
    SessionCaches.evictSession(s)
  }
}
