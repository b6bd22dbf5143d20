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

  test("randomized: cache is transparent over a static table and never amplifies store traffic") {
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 50) {
      val inner = new CountingTable
      var now = 0L
      val maxRows = 1 + rnd.nextInt(8)
      val ttl = 1L + rnd.nextInt(200)
      val t = new CachedLookupTable(inner, maxRows, ttl, clock = () => now)
      t.open()
      val keySpace = 1 + rnd.nextInt(12)
      val n = 30 + rnd.nextInt(70)
      for (_ <- 0 until n) {
        now += rnd.nextInt(40)
        val k = rnd.nextInt(keySpace).toLong - 2 // includes miss keys (< 0)
        val got = t.lookup(k)
        val want = if (k >= 0) Some(s"v$k") else None
        assert(got == want,
          s"case $case_ (seed $seed): cached lookup($k) = $got, direct = $want " +
          s"[maxRows=$maxRows ttl=$ttl]")
      }
      assert(inner.calls <= n, "cache amplified store traffic")
    }
  }

  test("randomized: with capacity >= key space and no expiry, store traffic is one call per distinct key") {
    val seed = 77L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 20) {
      val inner = new CountingTable
      val keySpace = 1 + rnd.nextInt(10)
      val t = new CachedLookupTable(inner, maxRows = keySpace + 2,
        ttlMs = Long.MaxValue / 2, clock = () => 0L)
      t.open()
      val ks = Vector.fill(40 + rnd.nextInt(60))(rnd.nextInt(keySpace).toLong)
      ks.foreach(t.lookup)
      assert(inner.calls == ks.distinct.size,
        s"case $case_ (seed $seed): expected exactly one store call per " +
        s"distinct key, got ${inner.calls} for ${ks.distinct.size} keys")
    }
  }

  /** Inner table whose value changes every time the clock moves — the
   * returned value encodes the read time, so staleness is observable. */
  private class VersionedTable(clock: () => Long)
    extends LookupJoin.LookupTable[Long, String] {
    override def lookup(k: Long): Option[String] = Some(s"$k@${clock()}")
  }

  test("randomized: every served value is at most ttl old (reference staleness contract)") {
    val seed = 4242L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 30) {
      var now = 0L
      val ttl = 10L + rnd.nextInt(150)
      val t = new CachedLookupTable(new VersionedTable(() => now),
        maxRows = 1 + rnd.nextInt(6), ttlMs = ttl, clock = () => now)
      t.open()
      for (_ <- 0 until 80) {
        now += rnd.nextInt(30)
        val k = rnd.nextInt(8).toLong
        val readAt = t.lookup(k).get.split('@')(1).toLong
        assert(now - readAt < ttl,
          s"case $case_ (seed $seed): served a value read at $readAt when " +
          s"now=$now, ttl=$ttl — staleness bound violated")
      }
    }
  }
}
