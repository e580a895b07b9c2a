package graft

import java.util.concurrent.locks.ReentrantLock

import org.apache.spark.sql.SparkSession

/** Scoped, concurrency-safe session-conf overrides for the iterative
  * operators (connected components, PageRank, BPE training) that tune
  * `spark.sql.adaptive.enabled` / `spark.sql.shuffle.partitions` around a
  * driver loop.
  *
  * A bare save/set/`finally`-restore is correct single-threaded but races
  * when two queries share one `SparkSession`: thread B can snapshot thread
  * A's scoped value as its "original" and restore it permanently, leaving
  * the session degraded (e.g. stuck at 1 shuffle partition) after both
  * finish. `withConf` closes that hole with a per-session [[ReentrantLock]]
  * held across set-body-restore, so scoped sections on the same session
  * serialize (sections on different sessions run fully in parallel, and the
  * lock is reentrant so nested scopes on one thread compose — the inner
  * scope restores the outer scope's values, which is exactly lexical
  * scoping).
  *
  * Contract for `body`: every action whose plan must see the scoped values
  * runs inside `body`, and any frame that escapes is materialized first
  * (the in-repo loops `localCheckpoint()` their results) — a lazily
  * returned plan would be re-planned under the restored conf.
  *
  * Lock keys are weak ([[java.util.WeakHashMap]] with identity-equal
  * `SparkSession` keys) so a stopped, dereferenced session's lock entry is
  * collectable — the registry never pins sessions.
  */
object SessionConfs {
  private val locks = new java.util.WeakHashMap[SparkSession, ReentrantLock]()

  private def lockFor(s: SparkSession): ReentrantLock = locks.synchronized {
    var l = locks.get(s)
    if (l == null) { l = new ReentrantLock(); locks.put(s, l) }
    l
  }

  /** Run `body` with `kvs` set on `s`'s session conf, restoring the prior
    * values (or unsetting never-set keys back to their defaults) afterwards,
    * serialized against every other `withConf` section on the same session. */
  def withConf[T](s: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val lock = lockFor(s)
    lock.lock()
    try {
      val saved = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    } finally lock.unlock()
  }
}
