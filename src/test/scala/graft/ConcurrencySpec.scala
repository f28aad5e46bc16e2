package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.index.{DiskannIndex, DiskannParams}
import graft.operators.{Dedup, TextIndex}
import graft.streaming.StreamingIngest

/**
 * Multi-threaded writer/reader races against the three stored artifacts —
 * the reference's concurrency suite re-expressed
 * (tests/test_concurrent_inserts.py:20-195: concurrent inserts, racing
 * mixed ops). The WriterLock lease serializes writers by FAILING FAST, so
 * writer threads retry on IllegalStateException — the documented client
 * contract. Assertions target the lost-update failure modes the lease and
 * the marker protocol exist to prevent: no lost batch, no double-fold, no
 * duplicated ids, deletes neither resurrected nor over-applied.
 */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val terms = Seq("vector", "query", "dup")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  /** Run `body` retrying on writer-lease contention (the fail-fast
    * IllegalStateException) — the documented concurrent-writer protocol. */
  private def withRetry(maxMs: Long = 180000L)(body: => Unit): Unit = {
    val deadline = System.currentTimeMillis() + maxMs
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        // retryable: lease contention (fail-fast IllegalStateException —
        // a compaction can hold the lease for many seconds of Spark jobs,
        // so the budget is time-based, not attempt-based), and reader
        // races with a generation swap (file-not-found / Spark-wrapped IO
        // during the one-predecessor grace window). Assertion failures are
        // NEVER retried.
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Exception if System.currentTimeMillis() < deadline =>
          Thread.sleep(100L)
      }
    }
  }

  private def inThread(name: String)(body: => Unit): (Thread, java.util.concurrent.atomic.AtomicReference[Throwable]) = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      try body catch { case e: Throwable => err.set(e) }
    }, name)
    t.start()
    (t, err)
  }

  private def joinAll(ts: Seq[(Thread, java.util.concurrent.atomic.AtomicReference[Throwable])]): Unit = {
    ts.foreach(_._1.join(300000))
    ts.foreach { case (t, e) =>
      assert(!t.isAlive, s"thread ${t.getName} hung")
      assert(e.get() == null, s"thread ${t.getName} failed: ${e.get()}")
    }
  }

  // -------------------------------------------- stale-lease steal protocol
  // The same-JVM gate (StreamingIngest.jvmLeases) serializes in-process
  // writers BEFORE the file lease is contended, so these tests exercise the
  // cross-process steal machinery directly — acquireLease / holdsLease with
  // distinct ownerIds on one lock file, the reference's multi-process
  // concurrent-writer shape (tests/test_concurrent_inserts.py:20-195).

  private def lockFsFor(path: String) = {
    val lock = new org.apache.hadoop.fs.Path(s"$path/_compact.lock")
    (lock.getFileSystem(spark.sessionState.newHadoopConf()), lock)
  }

  test("stale-lease steal: two owners racing an overwrite-steal leave exactly one holder") {
    val base = "/tmp/graft_test_index/conc_lease_race"
    deleteRec(new java.io.File(base))
    new java.io.File(base).mkdirs()
    val (fs, lock) = lockFsFor(base)
    // a crashed writer's stale lease is already on disk
    assert(StreamingIngest.acquireLease(fs, lock, "dead-writer"))
    var roundsWithHolder = 0
    for (round <- 1 to 20) {
      // both stealers overwrite (exclusiveCreate=false simulates the object
      // store where create is never exclusive) from a common start line
      val gate = new java.util.concurrent.CountDownLatch(1)
      val resA = new java.util.concurrent.atomic.AtomicBoolean(false)
      val resB = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ts = Seq(
        inThread(s"stealA$round") { gate.await()
          resA.set(StreamingIngest.acquireLease(fs, lock, "owner-A",
            exclusiveCreate = false, verifyDelayMs = 5L)) },
        inThread(s"stealB$round") { gate.await()
          resB.set(StreamingIngest.acquireLease(fs, lock, "owner-B",
            exclusiveCreate = false, verifyDelayMs = 5L)) })
      gate.countDown()
      joinAll(ts)
      // acquireLease alone may let BOTH believe they won (interleaved
      // write/re-read — exactly the non-atomic steal hazard): the contract
      // is that the PRE-INSTALL re-verify disambiguates. The safety
      // invariant is AT MOST ONE holder at that point — zero holders is
      // legal too (interleaved overwrites can tear the local-FS read, e.g.
      // a checksum sidecar from the loser's write; both writers then abort
      // at their verify and retry, which is safe), but never two.
      val aHolds = StreamingIngest.holdsLease(fs, lock, "owner-A")
      val bHolds = StreamingIngest.holdsLease(fs, lock, "owner-B")
      assert(!(aHolds && bHolds),
        s"round $round: two writers both hold the lease at verify time")
      if (aHolds || bHolds) roundsWithHolder += 1
      // a sole verified acquirer must still be the holder — its steal was
      // uncontested at re-read time and nothing overwrote it since
      if (resA.get() && !resB.get())
        assert(aHolds, s"round $round: sole verified acquirer A lost the lease")
      if (resB.get() && !resA.get())
        assert(bHolds, s"round $round: sole verified acquirer B lost the lease")
      // reset to the stale state for the next round
      fs.delete(lock, false)
      assert(StreamingIngest.acquireLease(fs, lock, "dead-writer"))
    }
    // liveness sanity: the steal is not perpetually futile
    assert(roundsWithHolder > 0, "no round ever produced a lease holder")
  }

  test("withLeaseVerified: a writer whose lease is stolen mid-fold aborts at verify and never deletes the thief's lease") {
    val base = "/tmp/graft_test_index/conc_lease_verify"
    deleteRec(new java.io.File(base))
    new java.io.File(base).mkdirs()
    val (fs, lock) = lockFsFor(base)
    val reachedVerify = new java.util.concurrent.CountDownLatch(1)
    val stolen = new java.util.concurrent.CountDownLatch(1)
    val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ts = Seq(inThread("victim") {
      try graft.index.WriterLock.withLeaseVerified(spark, base) { verify =>
        reachedVerify.countDown()
        // wait until the "other process" has overwritten our lease
        assert(stolen.await(60, java.util.concurrent.TimeUnit.SECONDS))
        verify() // must throw: the irreversible step may not proceed
        fail("verify() passed after the lease was stolen")
      } catch {
        case _: IllegalStateException => aborted.set(true)
      }
    })
    assert(reachedVerify.await(60, java.util.concurrent.TimeUnit.SECONDS))
    // another PROCESS (simulated: direct file overwrite, invisible to this
    // JVM's gate) steals the lease as stale and re-verifies it
    assert(StreamingIngest.acquireLease(fs, lock, "thief",
      exclusiveCreate = false))
    stolen.countDown()
    joinAll(ts)
    assert(aborted.get(), "victim must abort with IllegalStateException")
    // the victim's exit path must NOT delete the thief's fresh lease
    assert(StreamingIngest.holdsLease(fs, lock, "thief"),
      "loser's cleanup deleted the thief's lease")
  }

  test("withLeaseVerified: a stale lock past lockTimeoutMs is stolen and the writer proceeds") {
    val base = "/tmp/graft_test_index/conc_lease_stale"
    deleteRec(new java.io.File(base))
    new java.io.File(base).mkdirs()
    val (fs, lock) = lockFsFor(base)
    assert(StreamingIngest.acquireLease(fs, lock, "crashed-writer"))
    // backdate the lock beyond the steal horizon
    val old = System.currentTimeMillis() - 7200_000L
    fs.setTimes(lock, old, old)
    var ran = false
    graft.index.WriterLock.withLeaseVerified(spark, base) { verify =>
      verify() // we are the thief and the only writer: verify passes
      ran = true
    }
    assert(ran, "stale lock must be stolen, not block the writer")
    assert(!fs.exists(lock), "winner must release the lease on exit")
  }

  test("cross-process lease: a subprocess holder makes this process fail fast; release unblocks") {
    val base = "/tmp/graft_test_index/conc_lease_xproc"
    deleteRec(new java.io.File(base))
    new java.io.File(base).mkdirs()
    // the forked test JVM carries the full classpath + module flags Spark
    // needs on JDK 17 — reuse both for the child process
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val moduleArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-modules"))
    val cmd = Seq(javaBin) ++ moduleArgs ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.tools.LeaseProbe", "hold", base, "15000")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      // synchronize on the child's HELD line, not on timing
      var line = reader.readLine()
      while (line != null && !line.contains("HELD")) line = reader.readLine()
      assert(line != null, "subprocess never acquired the lease")
      // the FILE lease (not the same-JVM gate) must make this process fail
      // fast: the lock is fresh (not stale), owned by another pid
      val e = intercept[IllegalStateException] {
        graft.index.WriterLock.withLease(spark, base) { fail("entered under a foreign lease") }
      }
      assert(e.getMessage.contains("another writer"), e.getMessage)
      // interrupt the hold: the child's sleep dies, its finally releases the
      // lease, and this process can then acquire it
      p.destroy()
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally if (p.isAlive) p.destroyForcibly()
    // child killed mid-hold may have leaked its lease file (a crashed
    // writer): steal it through the documented horizon instead of waiting 1h
    spark.conf.set("graft.compact.lockTimeoutMs", "1")
    try {
      Thread.sleep(5)
      var ran = false
      graft.index.WriterLock.withLease(spark, base) { ran = true }
      assert(ran, "lease not acquirable after the foreign holder died")
    } finally spark.conf.unset("graft.compact.lockTimeoutMs")
  }

  test("ANN index: racing delta appends / deletes / compactions / searches lose nothing") {
    val path = "/tmp/graft_test_index/conc_ann"
    deleteRec(new java.io.File(path))
    // 8-dim deterministic base, 200 rows
    def vecs(lo: Long, hi: Long) = spark.range(lo, hi).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(vecs(0, 200), "row_id", "vec", None, path,
      DiskannParams(metric = "l2", storage = "plain", numNeighbors = 16,
        searchListSize = 32))

    val appenders = (0 until 3).map { a =>
      inThread(s"append-$a") {
        (0 until 3).foreach { b =>
          val lo = 1000L + a * 300 + b * 100
          StreamingIngest.appendBatchToDelta(path)(vecs(lo, lo + 50), b)
          Thread.sleep(30)
        }
      }
    }
    val deleter = inThread("delete") {
      Thread.sleep(40)
      withRetry()(DiskannIndex.deleteRows(spark, path, Set(5L, 6L)))
      Thread.sleep(60)
      withRetry()(DiskannIndex.deleteRows(spark, path, Set(7L)))
    }
    val compactor = inThread("compact") {
      (0 until 3).foreach { _ =>
        Thread.sleep(80)
        withRetry()(StreamingIngest.compact(spark, path))
      }
    }
    val searcher = inThread("search") {
      val q = Seq((0L, Array.fill(8)(0.5f))).toDF("qid", "qvec")
      (0 until 8).foreach { _ =>
        // a generation swap can GC a root this reader already resolved
        // (one-predecessor grace window) — retrying is the reader contract
        withRetry() {
          val hits = StreamingIngest.searchFresh(spark, path, q, 5, 32, 16)
            .collect()
          assert(hits.length == 5)
        }
        Thread.sleep(25)
      }
    }
    joinAll(appenders :+ deleter :+ compactor :+ searcher)

    // final fold, then audit: every appended row present EXACTLY once,
    // every deleted row gone
    withRetry()(StreamingIngest.compact(spark, path))
    val root = DiskannIndex.resolveRoot(spark, path)
    val ids = spark.read.parquet(s"$root/nodes").select($"row_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == ids.distinct.length, "duplicated row_ids after races")
    val expect = ((0L until 200L) ++
      (0 until 3).flatMap(a => (0 until 3).flatMap { b =>
        val lo = 1000L + a * 300 + b * 100; lo until lo + 50
      })).toSet -- Set(5L, 6L, 7L)
    assert(ids.toSet == expect,
      s"lost/extra rows: missing=${(expect -- ids.toSet).take(5)} " +
        s"extra=${(ids.toSet -- expect).take(5)}")
    assert(DiskannIndex.loadTombstones(spark, path).isEmpty)
  }

  test("text index: racing appends / compactions / searches fold every batch once") {
    val path = "/tmp/graft_test_index/conc_text"
    deleteRec(new java.io.File(path))
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy(_._1)
    val (base, rest) = all.splitAt(all.length / 2)
    TextIndex.buildTextIndex(base.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", path)
    // 4 disjoint slices, one appender thread per two slices
    val slices = rest.grouped(math.max(rest.length / 4, 1)).toSeq.take(4)
    val appenders = slices.zipWithIndex.map { case (slice, i) =>
      inThread(s"append-$i") {
        withRetry() {
          TextIndex.appendTextIndex(slice.toSeq.toDF("doc_id", "text"),
            "doc_id", "text", path, batchId = i + 1L)
        }
      }
    }
    val compactor = inThread("compact") {
      (0 until 3).foreach { _ =>
        Thread.sleep(60)
        withRetry()(TextIndex.compactTextIndex(spark, path))
      }
    }
    val searcher = inThread("search") {
      (0 until 6).foreach { _ =>
        withRetry() {
          TextIndex.bm25SearchIndexed(spark, path, terms, n = 10).collect()
        }
        Thread.sleep(40)
      }
    }
    joinAll(appenders :+ compactor :+ searcher)
    withRetry()(TextIndex.compactTextIndex(spark, path))

    val root = TextIndex.resolveRoot(spark, path)
    val nDocs = spark.read.parquet(s"$root/corpusstats")
      .agg(sum($"n")).head().getLong(0)
    val expected = base.length + slices.map(_.length).sum
    assert(nDocs == expected, s"docs lost or double-folded: $nDocs != $expected")
    val post = spark.read.parquet(s"$root/postings").select($"id", $"term")
    assert(post.count() == post.distinct().count(),
      "duplicate posting rows after racing writers")
    // and the served result equals a clean one-shot build
    val fullPath = "/tmp/graft_test_index/conc_text_full"
    TextIndex.buildTextIndex(
      (base ++ slices.flatten).toSeq.toDF("doc_id", "text"),
      "doc_id", "text", fullPath)
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = TextIndex.bm25SearchIndexed(spark, fullPath, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, "raced index diverged from a clean build")
  }

  test("dedup index: racing stream appends / compactions keep ids unique, markers consistent") {
    val path = "/tmp/graft_test_index/conc_dedup"
    deleteRec(new java.io.File(path))
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy(_._1)
    val (base, rest) = all.splitAt(all.length / 2)
    Dedup.buildDedupIndex(base.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", path)
    val slices = rest.grouped(math.max(rest.length / 3, 1)).toSeq.take(3)
    val appenders = slices.zipWithIndex.map { case (slice, i) =>
      inThread(s"sappend-$i") {
        withRetry() {
          Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(
            slice.toSeq.toDF("doc_id", "text"), i.toLong)
        }
      }
    }
    val compactor = inThread("compact") {
      (0 until 3).foreach { _ =>
        Thread.sleep(50)
        withRetry()(Dedup.compactDedupIndex(spark, path))
      }
    }
    joinAll(appenders :+ compactor)
    withRetry()(Dedup.compactDedupIndex(spark, path))

    val root = DiskannIndex.resolveRoot(spark, path)
    val sigs = spark.read.parquet(s"$root/signatures").select($"id")
    assert(sigs.count() == sigs.distinct().count(),
      "duplicated signature ids after racing writers")
    assert(sigs.count() == base.length + slices.map(_.length).sum)
    // every committed stream batch has its marker (no orphaned protocol
    // state: marker present => batch committed; batch present => marker,
    // since all appenders completed)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    slices.indices.foreach { i =>
      val phys = Dedup.STREAM_BATCH_BASE + i
      assert(fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/_stream/b$phys")),
        s"orphaned (missing) stream marker for batch $i")
    }
  }
}
