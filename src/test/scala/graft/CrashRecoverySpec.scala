package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Layout, TextAnalysis, TextIndex}

/**
 * Crash-window recovery for the stored artifacts: the failure modes are a
 * writer dying BETWEEN the non-atomic steps of an append — data files
 * committed but manifest/marker missing — and a compaction later running
 * over that half-state. Each test simulates the crash by constructing the
 * exact on-disk state the dead writer leaves and asserts the recovery
 * contract: nothing silently lost, nothing duplicated on replay.
 */
class CrashRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val terms = Seq("vector", "query", "dup")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  // ---------------------------------------------------------------- text

  test("text compaction carries an unmarked stream batch; replay never duplicates") {
    val path = "/tmp/graft_test_index/crash_text"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val third = (hi - lo) / 3
    val part1 = docs.filter($"doc_id" <= lo + third)
    val part2 = docs.filter($"doc_id" > lo + third && $"doc_id" <= lo + 2 * third)
    val part3 = docs.filter($"doc_id" > lo + 2 * third)
      .select($"doc_id", $"text")

    TextIndex.buildTextIndex(part1, "doc_id", "text", path)
    TextIndex.appendTextIndex(part2, "doc_id", "text", path, batchId = 1L)
    // stream batch 0 commits its tables AND its marker…
    TextIndex.appendBatchIdempotent("doc_id", "text", path)(
      part3.toDF("doc_id", "text"), 0L)
    // …then we simulate the crash window by deleting the marker: the exact
    // state a writer leaves when it dies after the table writes commit but
    // before the marker create (the checkpoint WILL replay this batch)
    val phys = TextIndex.STREAM_BATCH_BASE + 0L
    val marker = new org.apache.hadoop.fs.Path(s"$path/_stream/b$phys")
    assert(fsOf(path).delete(marker, false))

    // compaction must fold batches 0+1 but CARRY the unmarked stream batch
    // verbatim — folding it would leave the replay nothing to clean and a
    // re-append would double every doc
    assert(TextIndex.compactTextIndex(spark, path))
    val root = TextIndex.resolveRoot(spark, path)
    val batches = spark.read.parquet(s"$root/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet
    assert(batches == Set(0L, phys),
      s"expected fold-to-0 plus carried stream batch, got $batches")

    // the replay finds its batch dirs, delete-and-rewrites, marks — and the
    // final index equals a clean one-shot build of the whole corpus
    TextIndex.appendBatchIdempotent("doc_id", "text", path)(
      part3.toDF("doc_id", "text"), 0L)
    assert(fsOf(path).exists(marker), "replay did not restore the marker")
    val nDocs = spark.read.parquet(s"$root/corpusstats")
      .agg(sum($"n")).head().getLong(0)
    assert(nDocs == docs.count(), s"doc count $nDocs after replay")
    val fullPath = "/tmp/graft_test_index/crash_text_full"
    TextIndex.buildTextIndex(docs, "doc_id", "text", fullPath)
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = TextIndex.bm25SearchIndexed(spark, fullPath, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, "recovered index diverged from a clean build")

    // a marked-everything compaction then folds the carried batch normally
    assert(TextIndex.compactTextIndex(spark, path))
    val after = spark.read.parquet(
        s"${TextIndex.resolveRoot(spark, path)}/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet
    assert(after == Set(0L))
  }

  test("fold with unmarked batch + pending tombstones keeps stats exact through the eventual VACUUM") {
    // the failure this pins down: a fold that runs while tombstones are
    // FORCED pending (unmarked stream batch present) must NOT physically
    // drop the tombstoned postings — if it did, the eventual clean VACUUM
    // would find nothing to subtract and corpusstats would over-count the
    // deleted docs forever (wrong idf/avgdl in every later BM25 score)
    val path = "/tmp/graft_test_index/crash_text_stats"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val third = (hi - lo) / 3
    val part1 = docs.filter($"doc_id" <= lo + third)
    val part2 = docs.filter($"doc_id" > lo + third && $"doc_id" <= lo + 2 * third)
    val part3 = docs.filter($"doc_id" > lo + 2 * third)
      .select($"doc_id", $"text")
    TextIndex.buildTextIndex(part1, "doc_id", "text", path)
    TextIndex.appendTextIndex(part2, "doc_id", "text", path, batchId = 1L)
    TextIndex.appendBatchIdempotent("doc_id", "text", path)(
      part3.toDF("doc_id", "text"), 0L)
    val phys = TextIndex.STREAM_BATCH_BASE + 0L
    assert(fsOf(path).delete(
      new org.apache.hadoop.fs.Path(s"$path/_stream/b$phys"), false))
    val victim = part1.select($"doc_id").head().getLong(0)
    TextIndex.deleteDocs(spark, path, Seq(victim))
    // fold (batches 0+1 -> 0, stream batch carried, tombstone PENDING)
    assert(TextIndex.compactTextIndex(spark, path))
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).nonEmpty,
      "tombstone must stay pending while the unmarked batch exists")
    // victim is read-masked but its stats still count (pre-VACUUM contract)
    val served = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(_.getLong(0))
    assert(!served.contains(victim))
    // replay the stream batch (restores its marker), then the clean VACUUM
    TextIndex.appendBatchIdempotent("doc_id", "text", path)(
      part3.toDF("doc_id", "text"), 0L)
    assert(TextIndex.compactTextIndex(spark, path))
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).isEmpty)
    // post-VACUUM serving must equal a clean build over corpus-minus-victim
    // — over-counted stats (the bug) would shift every idf/avgdl here
    val cleanPath = "/tmp/graft_test_index/crash_text_stats_clean"
    TextIndex.buildTextIndex(docs.filter($"doc_id" =!= victim),
      "doc_id", "text", cleanPath)
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = TextIndex.bm25SearchIndexed(spark, cleanPath, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want,
      "stats drifted: the pending-tombstone fold corrupted corpus totals")
  }

  // --------------------------------------------------------------- dedup

  test("dedup compaction carries an unmarked stream batch; replay never duplicates") {
    val path = "/tmp/graft_test_index/crash_dedup"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    val part1 = docs.filter($"doc_id" <= lo + half)
    val part2 = docs.filter($"doc_id" > lo + half).select($"doc_id", $"text")

    Dedup.buildDedupIndex(part1, "doc_id", "text", path)
    Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(
      part2.toDF("doc_id", "text"), 0L)
    val phys = Dedup.STREAM_BATCH_BASE + 0L
    val marker = new org.apache.hadoop.fs.Path(s"$path/_stream/b$phys")
    assert(fsOf(path).delete(marker, false))
    // register a tombstone too: with an unmarked batch present the
    // compaction must LEAVE it pending, not half-consume it
    val victim = part1.select($"doc_id").head().getLong(0)
    graft.index.DiskannIndex.deleteRows(spark, path, Set(victim))

    // only ONE foldable batch, and the unmarked batch blocks tombstone
    // consumption — so this compaction is correctly a NO-OP (false): it
    // must neither fold the unmarked batch nor half-consume the registry
    assert(!Dedup.compactDedupIndex(spark, path),
      "compaction folded state it was required to leave for the replay")
    val root = graft.index.DiskannIndex.resolveRoot(spark, path)
    val batches = spark.read.parquet(s"$root/signatures")
      .select($"batch".cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(batches == Set(0L, phys), s"got $batches")
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).nonEmpty,
      "tombstones consumed while an unmarked batch was pending")

    // replay: delete-and-rewrite the carried batch, mark it
    Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(
      part2.toDF("doc_id", "text"), 0L)
    assert(fsOf(path).exists(marker))
    val sigs = spark.read.parquet(s"$root/signatures").select($"id")
    assert(sigs.count() == sigs.distinct().count(), "duplicated ids after replay")
    assert(sigs.distinct().count() == docs.count())

    // now fully marked: the next compaction folds everything AND consumes
    // the tombstone
    assert(Dedup.compactDedupIndex(spark, path))
    val root2 = graft.index.DiskannIndex.resolveRoot(spark, path)
    val finalIds = spark.read.parquet(s"$root2/signatures")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(!finalIds.contains(victim), "tombstoned id survived the fold")
    assert(finalIds.size == docs.count().toInt - 1)
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).isEmpty)
  }

  // -------------------------------------------------------------- layout

  test("prunedReadStored reads data files missing from the manifest (orphan safety net)") {
    val base = "/tmp/graft_test_index/crash_layout"
    deleteRec(new java.io.File(base))
    val zpath = s"$base/table"
    val df = spark.range(1000).select($"id",
      ($"id" % 97).cast("double").as("a"), ($"id" % 31).cast("double").as("b"))
    Layout.zorderWrite(df, Seq("a", "b"), zpath, nFiles = 4)
    Layout.writeZonemap(spark, zpath, Seq("a", "b"))
    // simulate a crashed zorderAppend: data files land, manifest write dies
    val extra = spark.range(1000, 1200).select($"id",
      ($"id" % 97).cast("double").as("a"), ($"id" % 31).cast("double").as("b"))
    extra.write.mode("append").parquet(zpath)
    val ranges = Seq(("a", 0.0, 200.0), ("b", 0.0, 200.0)) // match-all box
    val got = Layout.prunedReadStored(spark, zpath, ranges)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got.size == 1200,
      s"orphaned slice silently pruned out: ${got.size} of 1200 rows")
    // and a SELECTIVE box still prunes while keeping orphans filtered right
    val sel = Layout.prunedReadStored(spark, zpath, Seq(("a", 5.0, 5.0)))
      .select($"id").collect().map(_.getLong(0)).toSet
    val want = (0L until 1200L).filter(i => i % 97 == 5).toSet
    assert(sel == want)
  }

  test("zorderAppend with sliceId is idempotent and crash-recoverable") {
    val base = "/tmp/graft_test_index/crash_layout_slice"
    deleteRec(new java.io.File(base))
    val zpath = s"$base/table"
    val df = spark.range(500).select($"id",
      ($"id" % 53).cast("double").as("a"), ($"id" % 17).cast("double").as("b"))
    Layout.zorderWrite(df, Seq("a", "b"), zpath, nFiles = 2)
    Layout.writeZonemap(spark, zpath, Seq("a", "b"))
    val slice = spark.range(500, 700).select($"id",
      ($"id" % 53).cast("double").as("a"), ($"id" % 17).cast("double").as("b"))
    Layout.zorderAppend(slice, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("day1"))
    val ranges = Seq(("a", 0.0, 100.0), ("b", 0.0, 100.0))
    def readAll() = Layout.prunedReadStored(spark, zpath, ranges)
      .select($"id").collect().map(_.getLong(0)).toSeq
    val once = readAll()
    assert(once.length == 700 && once.toSet.size == 700)

    // same sliceId again: done-marker makes it a pure no-op
    Layout.zorderAppend(slice, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("day1"))
    assert(readAll().length == 700, "re-run duplicated the slice")

    // crash AFTER install+manifest but BEFORE the done-marker: the re-run
    // must scrub the half-committed slice (files AND manifest rows) and
    // redo it exactly once
    val fs = fsOf(zpath)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$zpath/_slice_day1"), false))
    Layout.zorderAppend(slice, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("day1"))
    val after = readAll()
    assert(after.length == 700 && after.toSet.size == 700,
      s"crash replay duplicated rows: ${after.length}")
    val zm = spark.read.parquet(s"${zpath}_zonemap")
    assert(zm.count() == zm.select($"file").distinct().count())
  }

  test("zorderAppend slice recovery never scrubs a sibling whose id shares a prefix (a vs a_b)") {
    val base = "/tmp/graft_test_index/crash_layout_slice_prefix"
    deleteRec(new java.io.File(base))
    val zpath = s"$base/table"
    val df = spark.range(300).select($"id",
      ($"id" % 53).cast("double").as("a"), ($"id" % 17).cast("double").as("b"))
    Layout.zorderWrite(df, Seq("a", "b"), zpath, nFiles = 2)
    Layout.writeZonemap(spark, zpath, Seq("a", "b"))
    // slice "a_b" commits fully first
    val sliceAB = spark.range(300, 500).select($"id",
      ($"id" % 53).cast("double").as("a"), ($"id" % 17).cast("double").as("b"))
    Layout.zorderAppend(sliceAB, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("a_b"))
    // then slice "a" runs (a fresh run IS the leftover-scrub path: it must
    // not classify slice_a_b's committed files as its own crashed leftovers)
    val sliceA = spark.range(500, 700).select($"id",
      ($"id" % 53).cast("double").as("a"), ($"id" % 17).cast("double").as("b"))
    Layout.zorderAppend(sliceA, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("a"))
    val ranges = Seq(("a", 0.0, 100.0), ("b", 0.0, 100.0))
    def readAll() = Layout.prunedReadStored(spark, zpath, ranges)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(readAll() == (0L until 700L).toSet,
      "slice 'a' install scrubbed sibling slice 'a_b' data")
    // crash-replay of "a" (marker lost): scrub+redo must still only touch
    // slice "a"'s own files and manifest rows
    val fs = fsOf(zpath)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$zpath/_slice_a"), false))
    Layout.zorderAppend(sliceA, Seq("a", "b"), zpath, nFiles = 2,
      sliceId = Some("a"))
    assert(readAll() == (0L until 700L).toSet,
      "crash replay of slice 'a' lost or duplicated sibling rows")
    val zm = spark.read.parquet(s"${zpath}_zonemap")
    assert(zm.count() == zm.select($"file").distinct().count())
  }

  // ---------------------------------------------------- rag chunk replay

  test("staging scrub: an actively-growing 'stale' dir survives (clock skew), a dead one goes") {
    val path = "/tmp/graft_test_index/scrub_settle"
    deleteRec(new java.io.File(path))
    new java.io.File(path).mkdirs()
    // two staging dirs wearing timestamps older than the stale horizon: one
    // is genuinely dead, the other belongs to a LIVE writer whose clock is
    // skewed — it keeps writing files during the scrubber's settle window
    val born = System.currentTimeMillis() - 2 * 3600 * 1000L
    val deadDir = new java.io.File(s"$path/_deltatmp_${born}_dead")
    val liveDir = new java.io.File(s"$path/_deltatmp_${born}_live")
    assert(deadDir.mkdirs() && liveDir.mkdirs())
    java.nio.file.Files.writeString(
      deadDir.toPath.resolve("part-0"), "stale")
    // the live writer uses the REAL committer layout: all activity happens
    // under `_temporary/...` task dirs, the staging root itself never
    // changes — the case a top-level contents fingerprint cannot see (it
    // would scrub the live writer every time)
    val liveTask = new java.io.File(
      s"$liveDir/_temporary/0/_temporary/attempt_x_0/")
    assert(liveTask.mkdirs())
    @volatile var keepWriting = true
    val writer = new Thread(() => {
      var i = 0
      while (keepWriting) {
        try java.nio.file.Files.writeString(
          liveTask.toPath.resolve(s"part-$i"), "x" * (i + 1))
        catch { case _: java.io.IOException => () } // dir raced away = fail below
        i += 1
        Thread.sleep(20)
      }
    })
    writer.start()
    try {
      spark.conf.set("graft.compact.scrubSettleMs", "400")
      val batch = Seq((1L, Array(0.1f, 0.2f))).toDF("row_id", "vec")
      graft.streaming.StreamingIngest.appendBatchToDelta(path)(batch, 0L)
    } finally {
      keepWriting = false
      writer.join(5000)
      spark.conf.unset("graft.compact.scrubSettleMs")
    }
    assert(!deadDir.exists(), "dead staging dir must be scrubbed")
    assert(liveDir.exists(),
      "actively-growing staging dir scrubbed — live skewed writer destroyed")
    // the batch itself landed despite the survivor
    assert(spark.read.parquet(s"$path/delta").count() == 1)
    // once the writer is genuinely idle for the horizon, the next scrub
    // reclaims it
    val batch2 = Seq((2L, Array(0.3f, 0.4f))).toDF("row_id", "vec")
    graft.streaming.StreamingIngest.appendBatchToDelta(path)(batch2, 1L)
    assert(!liveDir.exists(), "idle stale dir must be reclaimed on the next scrub")
  }

  test("rag_context_pack replays bit-identically against a freshly built chunk index") {
    // kill any cached chunk index for this sf so the query path exercises a
    // FRESH build (the round-8 red row was a stale-artifact hazard)
    val dir = new java.io.File("/tmp/graft_index")
    if (dir.isDirectory)
      dir.listFiles().filter(_.isDirectory).foreach(d =>
        Option(d.listFiles()).foreach(_.filter(_.getName.startsWith("chunkidx"))
          .foreach(deleteRec)))
    val q = SparkEntry.queries("rag_context_pack")(spark,
      "/root/testdata/sf0.001")
    val got = q.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq

    // independent replay: chunk the corpus, score each term through the
    // VERIFIED one-shot scorer, round+sum as BigDecimal (the index's
    // summation contract), top-20, greedy 300-token pack — no TextIndex
    // code in the loop
    val chunks = TextAnalysis.slidingChunks(docs, "doc_id", "text",
        chunkSize = 200, stride = 150)
      .select(($"id" * 100000L + $"chunk_ix").as("chunk_id"), $"chunk_text")
      .cache()
    val perTerm = terms.map { t =>
      TextAnalysis.bm25(chunks, "chunk_id", "chunk_text", Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    val top = perTerm.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter(_._2 > 0)
      .toSeq.sortBy { case (id, s) => (-s, id) }
      .take(20)
    val nTok = chunks.filter($"chunk_id".isin(top.map(_._1): _*))
      .select($"chunk_id",
        size(TextAnalysis.tokens($"chunk_text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.unpersist()
    var cum = 0L
    val want = top.flatMap { case (id, s) =>
      cum += nTok(id)
      if (cum <= 300L) Some((id, s.toDouble, nTok(id), cum)) else None
    }
    assert(got == want,
      s"rag_context_pack diverged from the independent replay\n" +
        s"got : $got\nwant: $want")
  }
}
