package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Cache semantics of [[CachedLookupTable]] (reference
 * `lookup.cache.max-rows` / `lookup.cache.ttl`): hit suppression,
 * miss caching, LRU eviction at max-rows, and write-TTL expiry — all
 * against a counting fake table and an injected clock. */
class CachedLookupSpec extends AnyFunSuite {

  private class CountingTable extends LookupJoin.LookupTable[Long, String] {
    var calls = 0
    override def lookup(k: Long): Option[String] = {
      calls += 1
      if (k >= 0) Some(s"v$k") else None
    }
  }

  test("repeat lookups of a cached key never reach the store; misses cache too") {
    val inner = new CountingTable
    val t = new CachedLookupTable(inner, maxRows = 8, ttlMs = 1000L, clock = () => 0L)
    t.open()
    assert(t.lookup(1L).contains("v1") && t.lookup(1L).contains("v1") && t.lookup(1L).contains("v1"))
    assert(inner.calls == 1, "second and third hits must be served from cache")
    // a missing key's EMPTY result is cached as well (reference
    // behavior: hot missing keys must not hammer the dimension store)
    assert(t.lookup(-5L).isEmpty && t.lookup(-5L).isEmpty)
    assert(inner.calls == 2, "the miss should have been cached")
  }

  test("LRU evicts the least-recently-USED key once max-rows is exceeded") {
    val inner = new CountingTable
    val t = new CachedLookupTable(inner, maxRows = 2, ttlMs = 1000L, clock = () => 0L)
    t.open()
    t.lookup(1L); t.lookup(2L) // cache = {1, 2}
    t.lookup(1L)               // touch 1 → LRU order now 2, 1
    t.lookup(3L)               // evicts 2 (least recently used), not 1
    assert(inner.calls == 3)
    t.lookup(1L)               // still cached
    assert(inner.calls == 3, "key 1 must have survived the eviction")
    t.lookup(2L)               // was evicted → store call
    assert(inner.calls == 4)
  }

  test("entries expire ttl after WRITE and refresh on the next lookup") {
    val inner = new CountingTable
    var now = 0L
    val t = new CachedLookupTable(inner, maxRows = 8, ttlMs = 100L, clock = () => now)
    t.open()
    t.lookup(1L)
    now = 99L
    t.lookup(1L)
    assert(inner.calls == 1, "entry still fresh at ttl - 1")
    now = 100L
    t.lookup(1L)
    assert(inner.calls == 2, "entry must expire exactly at the write TTL")
    now = 150L
    t.lookup(1L) // refreshed at t=100, fresh again until 200
    assert(inner.calls == 2)
  }
}
