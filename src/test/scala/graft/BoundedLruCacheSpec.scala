package graft

import org.scalatest.funsuite.AnyFunSuite

/** Eviction mechanics of [[BoundedLruCache]] — the bound that keeps the
  * session-scoped checkpoint caches (Similarity quantizer/PQ, Dedup
  * pairs) from pinning one block set per distinct key forever.
  */
class BoundedLruCacheSpec extends AnyFunSuite {

  private def cacheWithLog(max: Int) = {
    val released = scala.collection.mutable.ArrayBuffer[String]()
    (new BoundedLruCache[String, String](max, released += _), released)
  }

  test("inserting past the cap evicts the least-recently-used and releases it") {
    val (c, released) = cacheWithLog(2)
    c.putIfAbsent("a", "va")
    c.putIfAbsent("b", "vb")
    assert(c.size == 2 && released.isEmpty)
    c.putIfAbsent("c", "vc")
    assert(c.size == 2)
    assert(released.toSeq == Seq("va"), "eldest entry must be released")
    assert(c.get("a").isEmpty && c.get("b").contains("vb") && c.get("c").contains("vc"))
  }

  test("get refreshes recency — the evictee is least-recently-USED") {
    val (c, released) = cacheWithLog(2)
    c.putIfAbsent("a", "va")
    c.putIfAbsent("b", "vb")
    c.get("a") // a is now more recent than b
    c.putIfAbsent("c", "vc")
    assert(released.toSeq == Seq("vb"))
    assert(c.get("a").contains("va") && c.get("b").isEmpty)
  }

  test("putIfAbsent on an existing key returns the incumbent, no eviction") {
    val (c, released) = cacheWithLog(2)
    c.putIfAbsent("a", "va")
    val winner = c.putIfAbsent("a", "LOSER")
    assert(winner == "va")
    assert(c.size == 1 && released.isEmpty)
  }

  test("removeIf releases only when asked") {
    val (c, released) = cacheWithLog(4)
    c.putIfAbsent("s1-a", "v1")
    c.putIfAbsent("s1-b", "v2")
    c.putIfAbsent("s2-a", "v3")
    c.removeIf(_.startsWith("s1"), releaseRemoved = true)
    assert(released.toSet == Set("v1", "v2") && c.size == 1)
    c.removeIf(_.startsWith("s2"), releaseRemoved = false)
    assert(released.size == 2 && c.size == 0, "stopped-context path must not release")
  }

  test("release runs for every value evicted by a burst of inserts") {
    val (c, released) = cacheWithLog(3)
    (1 to 10).foreach(i => c.putIfAbsent(s"k$i", s"v$i"))
    assert(c.size == 3)
    assert(released.toSet == (1 to 7).map(i => s"v$i").toSet)
  }
}
