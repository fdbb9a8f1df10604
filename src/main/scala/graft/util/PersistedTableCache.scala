package graft.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded LRU cache of persisted DataFrames, shared by operators that
  * reuse an expensive intermediate (shingle tables, MinHash signatures)
  * across several consumers and repeated query builds.
  *
  * Invariants the cache enforces (vs. a bare map of `persist()` handles):
  *  - **Session-scoped entries.** The key includes the owning session
  *    object itself, so a DataFrame persisted under one session is
  *    never handed to a different session sharing the JVM.
  *  - **Bounded.** At most `maxEntries` live entries; the least-recently-used
  *    entry is `unpersist`ed on eviction, so a long-lived session calling an
  *    operator over many distinct inputs/params can't accumulate cached
  *    blocks forever.
  *  - **Stale eviction.** Entries whose SparkContext has stopped are dropped
  *    (and skipped for unpersist) inside the same lock that serves lookups —
  *    no check-then-act window where a stopped entry is returned.
  *
  * All operations take one coarse lock. The default contract is that only
  * *plan construction* happens under it (persist() is lazy), never job
  * execution — with one sanctioned exception: a builder whose value IS an
  * eagerly-computed result (DedupQueries.clusterLabels runs the iterative
  * connected-components jobs) may hold the lock through those jobs. Note
  * the cost honestly: the lock is GLOBAL, so an eager build also blocks
  * lookups of unrelated entries for its duration — acceptable in this
  * engine's effectively single-tenant sessions; per-key striping
  * (computeIfAbsent on a future per entry) is the upgrade path if cache
  * users ever run concurrently.
  */
final class PersistedTableCache(maxEntries: Int,
                                level: StorageLevel = StorageLevel.MEMORY_AND_DISK) {
  require(maxEntries > 0, "maxEntries must be positive")

  // insertion-ordered; LRU maintained by remove+re-put on access. Keyed by
  // the session REFERENCE itself (SparkSession uses default reference
  // equality), not a hash of it — identity hash codes are not unique, and
  // a collision would hand one session's cached plan to another.
  private val entries = mutable.LinkedHashMap[(SparkSession, String), DataFrame]()

  private def isLive(df: DataFrame): Boolean =
    !df.sparkSession.sparkContext.isStopped

  private def unpersistQuietly(df: DataFrame): Unit =
    try { if (isLive(df)) df.unpersist(blocking = false) }
    catch { case scala.util.control.NonFatal(_) => () }

  /** Look up `key` under `session`'s namespace, building and persisting on
    * miss. `build` runs under the cache lock — it must only construct a plan.
    */
  def getOrElseUpdate(session: SparkSession, key: String)
                     (build: => DataFrame): DataFrame = synchronized {
    val fullKey = (session, key)
    entries.filterInPlace((_, df) => isLive(df))
    entries.remove(fullKey) match {
      case Some(df) =>
        entries.put(fullKey, df) // LRU touch
        df
      case None =>
        val df = build.persist(level)
        entries.put(fullKey, df)
        while (entries.size > maxEntries) {
          val (oldKey, old) = entries.head
          entries.remove(oldKey)
          unpersistQuietly(old)
        }
        df
    }
  }

  /** Live entry count (for tests). */
  def size: Int = synchronized { entries.count { case (_, df) => isLive(df) } }

  /** Drop and unpersist everything (for tests). */
  def clear(): Unit = synchronized {
    entries.valuesIterator.foreach(unpersistQuietly)
    entries.clear()
  }
}
