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
  def withLease[T](spark: SparkSession, path: String)(f: => T): T =
    withLeaseVerified(spark, path)(_ => f)

  /**
   * Like [[withLease]], but hands `f` a RE-VERIFY thunk to call immediately
   * before each irreversible step (a table write, the version-install
   * rename): it re-reads the lock file and throws [[IllegalStateException]]
   * if the lease is no longer ours. This closes the stale-steal race — two
   * writers that both observe a 1h-stale lock can interleave
   * overwrite+re-read and BOTH believe they won (the overwrite steal is not
   * atomic); the loser's re-verify at its install point aborts it before it
   * can swap a generation or write into one being folded. The steal path
   * additionally waits a jittered settle (min 50–250 ms even when
   * `lockVerifyDelayMs` is 0) so two same-instant stealers are unlikely to
   * interleave write/verify symmetrically in the first place.
   */
  def withLeaseVerified[T](spark: SparkSession, path: String)(
      f: (() => Unit) => T): T = {
    import graft.streaming.StreamingIngest.{acquireLease, holdsLease, jvmLeases}
    val lock = new org.apache.hadoop.fs.Path(s"$path/_compact.lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    // same-process writers serialize on the JVM gate FIRST: the file
    // lease's create-exclusive is not atomic on local FS / object stores,
    // so two threads of one JVM could otherwise both verify (see
    // StreamingIngest.jvmLeases). Fail fast like any other contention.
    // Key on the FULLY QUALIFIED path — two spellings of one artifact
    // ("idx" vs "/work/idx" vs "file:/work/idx") must gate as one.
    val gateKey = fs.makeQualified(lock).toUri.toString
    if (!jvmLeases.add(gateKey))
      throw new IllegalStateException(
        s"another writer in this process holds $lock; retry the " +
          "append/compact once it completes")
    try withJvmGateHeld(spark, path, lock, fs)(f)
    finally jvmLeases.remove(gateKey)
  }

  private def withJvmGateHeld[T](spark: SparkSession, path: String,
      lock: org.apache.hadoop.fs.Path, fs: org.apache.hadoop.fs.FileSystem)(
      f: (() => Unit) => T): T = {
    import graft.streaming.StreamingIngest.{acquireLease, holdsLease}
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
      // stealers interleaving a delete could both verify); the steal
      // verify always waits — a zero-delay overwrite+re-read gives two
      // concurrent stealers a symmetric window to both pass
      if (stale) {
        val stealDelay = math.max(verifyDelayMs,
          50L + scala.util.Random.nextInt(200))
        acquired = acquireLease(fs, lock, ownerId, exclusiveCreate = false,
          stealDelay)
      }
    }
    if (!acquired)
      throw new IllegalStateException(
        s"another writer holds $lock (stolen only after " +
          s"graft.compact.lockTimeoutMs=${timeoutMs}ms); retry the " +
          "append/compact once it completes")
    val verify: () => Unit = () =>
      if (!holdsLease(fs, lock, ownerId))
        throw new IllegalStateException(
          s"writer lease on $lock lost (stolen as stale by another " +
            "writer); aborting before the irreversible step")
    try f(verify)
    finally if (holdsLease(fs, lock, ownerId)) fs.delete(lock, false)
  }
}
