package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registered per-query caches — the cache-lifecycle twin of
  * [[SessionConfs]].
  *
  * Query functions cache intermediates that feed the LAZY plan they return
  * (candidate sets, deduped baskets, loop-invariant edge frames), so the
  * function itself can never unpersist them: the cache is first read when
  * the CALLER runs an action. Left unmanaged, a long-lived session running
  * the whole board (Bench's 205-query passes, Verify, the 10×/100× sweeps)
  * accumulates every query's cached blocks until the store fills — at the
  * 100× corpus that killed the default 8 GiB driver with
  * UNABLE_TO_ACQUIRE_MEMORY on the 200th query, which is exactly how a
  * production driver dies after days, not minutes.
  *
  * The contract mirrors SessionConfs: query code registers instead of
  * calling bare `.cache()` (`Caches.registered(df)` — same return-the-
  * cached-frame shape), and the HARNESS, which owns the action, calls
  * `drain(session)` once the materializing action completes. Within a
  * query the cache works exactly as before (all consumers of the single
  * action share it); across queries nothing accumulates. A caller that
  * never drains gets today's behavior — drain is a release valve, not a
  * correctness dependency.
  *
  * Deliberately NOT drained: [[Tables]]' memoized readers (logical plans,
  * no storage) and [[graft.queries.VectorOps]]' `ngramEdges` memo
  * (localCheckpoint blocks owned by the ContextCleaner, shared by seven
  * graph consumers by design).
  *
  * Keys carry the owning session so concurrent sessions (test suites, a
  * multi-tenant driver) drain independently; `unpersist(blocking = false)`
  * keeps drain O(registry size) driver-side — block eviction proceeds
  * asynchronously on the executors.
  */
object Caches {
  private val live =
    new scala.collection.concurrent.TrieMap[(SparkSession, Long), DataFrame]
  private val ids = new AtomicLong

  /** Cache `df` and register it for the session's next [[drain]]. */
  def registered(df: DataFrame): DataFrame = {
    val c = df.cache()
    live.put((df.sparkSession, ids.incrementAndGet()), c)
    c
  }

  /** Unpersist every cache registered on `s` since the last drain. */
  def drain(s: SparkSession): Unit =
    live.keysIterator.filter(_._1 eq s).toList
      .foreach(k => live.remove(k).foreach(_.unpersist(blocking = false)))

  private[graft] def liveCount(s: SparkSession): Int =
    live.keysIterator.count(_._1 eq s)
}
