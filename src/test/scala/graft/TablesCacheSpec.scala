package graft

/** Lifecycle of the memoized table readers: per-session identity reuse,
  * explicit eviction, and — the leak case — automatic purge of a stopped
  * session's entries (each cached DataFrame strongly references its
  * session, so without the purge a JVM cycling through sessions pins every
  * dead one forever).
  *
  * The stop test really stops the shared context (in OSS Spark that IS the
  * session end-of-life signal) and then rebuilds an identical session via
  * the suite builder; it is the LAST test in this suite and suites run
  * sequentially in the forked JVM, so later suites' `getOrCreate` simply
  * adopts the fresh context. */
class TablesCacheSpec extends SparkSuite {

  test("readers are memoized per (session, sf, table) and evict drops exactly this session") {
    Tables.evict(spark)
    val a = Tables.lineitem(spark, sf001)
    assert(Tables.lineitem(spark, sf001) eq a, "second read must return the memoized frame")
    val other = spark.newSession()
    val b = Tables.lineitem(other, sf001)
    assert(!(b eq a), "a sibling session must get its own reader")
    assert(Tables.cachedReadersFor(spark) == 1 && Tables.cachedReadersFor(other) == 1)
    Tables.evict(spark)
    assert(Tables.cachedReadersFor(spark) == 0, "evict must drop this session's entries")
    assert(Tables.cachedReadersFor(other) == 1, "evict must not touch sibling sessions")
    assert(!(Tables.lineitem(spark, sf001) eq a), "post-evict read must rebuild the reader")
    Tables.evict(other)
    Tables.evict(spark)
  }

  test("a stopped session's cache entries are purged on the next read") {
    val old = spark
    Tables.evict(old)
    Tables.lineitem(old, sf001)
    Tables.orders(old, sf001)
    assert(Tables.cachedReadersFor(old) == 2)
    // the artifact memos (edge table / inverted index / merge table) hold
    // the same session-keyed lifecycle contract as the readers
    queries.VectorOps.ngramEdges(old, sf001)
    assert(queries.VectorOps.edgeMemoEntriesFor(old) == 1)
    old.stop()
    val fresh = newSharedSession()
    assert(!(fresh eq old), "getOrCreate after stop must build a new session")
    Tables.lineitem(fresh, sf001)
    assert(Tables.cachedReadersFor(old) == 0,
      "the stopped session's entries must be gone after any later read")
    assert(Tables.cachedReadersFor(fresh) == 1)
    queries.VectorOps.ngramEdges(fresh, sf001)
    assert(queries.VectorOps.edgeMemoEntriesFor(old) == 0,
      "the stopped session's memoized edge table must purge on the next access")
    assert(queries.VectorOps.edgeMemoEntriesFor(fresh) == 1)
    Tables.evict(fresh)
  }
}
