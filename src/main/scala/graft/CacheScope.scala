package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Registry for the intermediate `persist()`s operators create mid-pipeline
 * (minhash/simhash signature tables, LSH sign projections, quality scores).
 *
 * Those persists exist so a multi-consumer subtree is computed once per
 * query, but a returned DataFrame is lazy — the operator itself has no
 * "after the action" point at which to unpersist, so in a long-lived session
 * repeated invocations would accumulate cached blocks until LRU pressure.
 * Operators therefore register every intermediate here, and whoever RUNS the
 * query (Verify/Bench do this per query; library users should too) calls
 * [[releaseAll]] once the consuming action finishes. Releasing early is
 * safe — an unpersisted intermediate recomputes, never corrupts.
 */
object CacheScope {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for the next release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(df)
    df
  }

  /** Unpersist (non-blocking) every intermediate registered since the last
    * call. Idempotent; tolerates already-stopped sessions. */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) {
      try df.unpersist(false) catch { case _: Throwable => () }
      df = reg.poll()
    }
  }

  /** Currently registered (not yet released) intermediates — test hook. */
  def pendingCount: Int = reg.size()
}
