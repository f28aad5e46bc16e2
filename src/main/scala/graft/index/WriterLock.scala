package graft.index

import org.apache.spark.sql.SparkSession

/**
 * Shared writer-lease discipline for the stored artifacts that are NOT the
 * ANN index (whose compactor carries the original inline copy of this
 * logic, `StreamingIngest.compact`): the text index and the dedup index
 * serialize their append/compact writers through the same `_compact.lock`
 * lease so an append can never write into a generation root that a
 * concurrent compaction is folding (the batch would silently vanish at the
 * version swap), and two compactors can never race on the same version
 * number.
 *
 * Semantics are identical to the ANN compactor's (the reference's
 * `aminsert` advisory-lock analog, build.rs:487-490):
 *  - acquisition is create-exclusive + RE-READ via
 *    [[graft.streaming.StreamingIngest.acquireLease]], safe on object
 *    stores where exclusive create is not atomic;
 *  - a crashed writer's stale lease is stolen by overwrite after
 *    `graft.compact.lockTimeoutMs` (default 1h);
 *  - a live concurrent writer makes the caller FAIL FAST with
 *    [[IllegalStateException]] — surfaced, never swallowed, because
 *    silently skipping would lose appends or let batches grow unbounded
 *    behind a stuck writer.
 *
 * Readers never take the lease: generations are immutable once installed
 * and resolution is by max version name, so reads stay lock-free.
 */
object WriterLock {

  /** Run `f` while holding `path`'s writer lease; release on exit (only if
    * still held — a timeout steal by another writer must not have ITS fresh
    * lease deleted by us). */
  def withLease[T](spark: SparkSession, path: String)(f: => T): T = {
    import graft.streaming.StreamingIngest.{acquireLease, holdsLease}
    val lock = new org.apache.hadoop.fs.Path(s"$path/_compact.lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    val timeoutMs =
      spark.conf.get("graft.compact.lockTimeoutMs", "3600000").toLong
    val verifyDelayMs =
      spark.conf.get("graft.compact.lockVerifyDelayMs", "0").toLong
    val ownerId = java.util.UUID.randomUUID().toString
    var acquired =
      acquireLease(fs, lock, ownerId, exclusiveCreate = true, verifyDelayMs)
    if (!acquired) {
      val stale = try {
        System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > timeoutMs
      } catch { case _: java.io.FileNotFoundException => true }
      // steal by OVERWRITE + re-read, never delete-then-create (two
      // stealers interleaving a delete could both verify)
      if (stale)
        acquired = acquireLease(fs, lock, ownerId, exclusiveCreate = false,
          verifyDelayMs)
    }
    if (!acquired)
      throw new IllegalStateException(
        s"another writer holds $lock (stolen only after " +
          s"graft.compact.lockTimeoutMs=${timeoutMs}ms); retry the " +
          "append/compact once it completes")
    try f
    finally if (holdsLease(fs, lock, ownerId)) fs.delete(lock, false)
  }
}
