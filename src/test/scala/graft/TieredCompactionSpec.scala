package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis, TextIndex}

/**
 * LSM-style tiered compaction for the batched stored artifacts: a tier
 * fold must cost O(appended data) — the base generation is REFERENCED
 * through tiermeta, never rewritten — while serving stays byte-identical
 * to a clean full build, and the full fold (VACUUM) must collapse a
 * tiered lineage back to a self-contained generation.
 */
class TieredCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val terms = Seq("vector", "query", "dup")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  private def bm25Expected(corpus: org.apache.spark.sql.DataFrame,
      excluded: Set[Long], n: Int): Seq[(Long, Double)] = {
    val kept = corpus.filter(!$"doc_id".isin(excluded.toSeq.map(Long.box): _*))
    val perTerm = terms.map { t =>
      TextAnalysis.bm25(kept, "doc_id", "text", Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    perTerm.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter(_._2 > 0)
      .map { case (id, s) => (id, s.toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(n)
  }

  test("text tier fold: base referenced (not rewritten), serving identical, full fold collapses") {
    val path = "/tmp/graft_test_index/tier_text"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val q = (hi - lo) / 5
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + 2 * q),
      "doc_id", "text", path)
    (1 to 3).foreach { i =>
      TextIndex.appendTextIndex(
        docs.filter($"doc_id" > lo + (i + 1) * q &&
          $"doc_id" <= lo + (i + 2) * q), "doc_id", "text", path, i.toLong)
    }

    // fingerprint the base data files: the tier fold must not touch them
    val flatPostings = new java.io.File(s"$path/postings")
    def baseFp(dir: java.io.File): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(dir).map(f => (f.getPath, f.length(), f.lastModified())).toSet
    }
    val before = baseFp(flatPostings)

    assert(TextIndex.compactTextIndex(spark, path, tiered = true))
    val root = TextIndex.resolveRoot(spark, path)
    assert(root.contains("/versions/v"))
    // tier generation: tiermeta points at the flat root (rel = "")
    assert(TextIndex.tierBase(spark, root).contains(path),
      s"tiermeta should reference the flat base, got " +
        s"${TextIndex.tierBase(spark, root)}")
    // base data untouched — the O(appended-data) claim
    assert(baseFp(flatPostings) == before, "tier fold rewrote the base")
    // local dirs carry ONLY the folded tier (batch=1)
    val localBatches = spark.read.parquet(s"$root/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet
    assert(localBatches == Set(1L), s"local batches: $localBatches")
    // serving: identical to a clean full build
    val allDocs = docs.filter($"doc_id" <= lo + 5 * q)
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == bm25Expected(allDocs, Set.empty, 15),
      "tiered serving diverged from the clean oracle")

    // second wave: more appends, tier fold AGAIN — base ref copied, only
    // local tier + new batches folded; chain depth stays 1
    TextIndex.appendTextIndex(docs.filter($"doc_id" > lo + 5 * q),
      "doc_id", "text", path, batchId = 2L)
    assert(TextIndex.compactTextIndex(spark, path, tiered = true))
    val root2 = TextIndex.resolveRoot(spark, path)
    assert(root2 != root)
    assert(TextIndex.tierBase(spark, root2).contains(path),
      "tier-over-tier must keep referencing the ORIGINAL base")
    assert(baseFp(flatPostings) == before, "second tier fold touched the base")
    val got2 = TextIndex.bm25SearchIndexed(spark, path, terms, n = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == bm25Expected(docs, Set.empty, 15))

    // nextBatchId spans base + tier (union view)
    assert(TextIndex.nextBatchId(spark, path) == 2L)

    // tombstone + tiered request: degrades to the FULL fold (VACUUM),
    // producing a self-contained generation with the dead doc dropped
    val victim = got2.head._1
    TextIndex.deleteDocs(spark, path, Seq(victim))
    assert(TextIndex.compactTextIndex(spark, path, tiered = true))
    val root3 = TextIndex.resolveRoot(spark, path)
    assert(TextIndex.tierBase(spark, root3).isEmpty,
      "VACUUM fold must produce a self-contained generation")
    val batches3 = spark.read.parquet(s"$root3/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet
    assert(batches3 == Set(0L))
    val got3 = TextIndex.bm25SearchIndexed(spark, path, terms, n = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got3 == bm25Expected(docs, Set(victim), 15))
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).isEmpty)
  }

  test("text tier fold GC keeps the referenced base across generations") {
    val path = "/tmp/graft_test_index/tier_text_gc"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + half),
      "doc_id", "text", path)
    // full fold #1 so the BASE itself is an installed generation
    TextIndex.appendTextIndex(
      docs.filter($"doc_id" > lo + half && $"doc_id" <= lo + half + 20),
      "doc_id", "text", path, 1L)
    assert(TextIndex.compactTextIndex(spark, path))
    val baseGen = TextIndex.resolveRoot(spark, path)
    assert(baseGen.contains("/versions/v"))
    // three waves of append + tier fold: every new tier gen references
    // baseGen, and GC must never delete it
    var off = half + 20
    (1 to 3).foreach { i =>
      TextIndex.appendTextIndex(
        docs.filter($"doc_id" > lo + off && $"doc_id" <= lo + off + 20),
        "doc_id", "text", path, i.toLong)
      TextIndex.appendTextIndex(
        docs.filter($"doc_id" > lo + off + 20 && $"doc_id" <= lo + off + 40),
        "doc_id", "text", path, (i + 10).toLong)
      assert(TextIndex.compactTextIndex(spark, path, tiered = true))
      off += 40
      assert(new java.io.File(baseGen).isDirectory,
        s"GC deleted the referenced base after wave $i")
      assert(TextIndex.tierBase(spark,
        TextIndex.resolveRoot(spark, path)).contains(baseGen))
    }
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = bm25Expected(docs.filter($"doc_id" <= lo + off), Set.empty, 10)
    assert(got == expect)
  }

  test("tiered serving keeps planning-time bucket pruning on BOTH tier and base scans") {
    val path = "/tmp/graft_test_index/tier_text_prune"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + half),
      "doc_id", "text", path)
    TextIndex.appendTextIndex(
      docs.filter($"doc_id" > lo + half && $"doc_id" <= lo + half + 30),
      "doc_id", "text", path, 1L)
    TextIndex.appendTextIndex(docs.filter($"doc_id" > lo + half + 30),
      "doc_id", "text", path, 2L)
    assert(TextIndex.compactTextIndex(spark, path, tiered = true))
    val res = TextIndex.bm25SearchIndexed(spark, path, terms, n = 10)
    val scans = res.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // postings + termstats, each a union of (base, tier) => 4 pruned scans
    val pruned = scans.filter(_.partitionFilters.nonEmpty)
    assert(pruned.size >= 4,
      s"expected >=4 pruned scans across the tier union, got ${pruned.size}")
    val nBk = terms.map(TextIndex.termBucketOf(_, 64)).distinct.size
    pruned.foreach(s =>
      assert(s.selectedPartitions.partitionCount <= nBk,
        s"scan read ${s.selectedPartitions.partitionCount} partitions, " +
          s"query touches only $nBk buckets"))
  }

  test("SQL: VACUUM INDEX WITH (tier=true) tier-folds a bare text path") {
    import org.apache.spark.sql.SparkSession
    val path = "/tmp/graft_test_index/tier_text_sql"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + half),
      "doc_id", "text", path)
    TextIndex.appendTextIndex(
      docs.filter($"doc_id" > lo + half && $"doc_id" <= lo + half + 30),
      "doc_id", "text", path, 1L)
    TextIndex.appendTextIndex(docs.filter($"doc_id" > lo + half + 30),
      "doc_id", "text", path, 2L)
    val prev = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
      val vac = s2.sql(s"VACUUM INDEX ON '$path' WITH (tier=true)").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(vac("vacuumed") == "true", vac.toString)
      val root = TextIndex.resolveRoot(s2, path)
      assert(TextIndex.tierBase(s2, root).contains(path),
        "SQL tier vacuum did not install a tier generation")
      // unknown option still fails loudly
      val e = intercept[Exception](
        s2.sql(s"VACUUM INDEX ON '$path' WITH (tiered=true)").collect())
      assert(e.getMessage.contains("tier"))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("streaming autoCompact: ingest tier-folds itself, serving stays exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = "/tmp/graft_test_index/tier_text_stream"
    val ckpt = s"$path.ckpt"
    deleteRec(new java.io.File(path)); deleteRec(new java.io.File(ckpt))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + half),
      "doc_id", "text", path)
    val rows = docs.filter($"doc_id" > lo + half)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // threshold 3: the 4th micro-batch's commit (local batches = 4 > 3)
    // triggers the tier fold inside the batch callback
    spark.conf.set("graft.compact.textMaxBatches", "3")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextIndex.startTextIngest(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", path, ckpt, autoCompact = true)
    try {
      rows.grouped(math.max(rows.length / 5, 1)).foreach { g =>
        mem.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally { q.stop(); spark.conf.unset("graft.compact.textMaxBatches") }
    val root = TextIndex.resolveRoot(spark, path)
    assert(TextIndex.tierBase(spark, root).isDefined,
      "autoCompact never tier-folded despite exceeding the batch threshold")
    // every streamed doc present exactly once, scores equal a clean build
    val nDocs = graft.index.TierManifest.tableDfAt(spark, root, "corpusstats")
      .agg(sum($"n")).head().getLong(0)
    assert(nDocs == docs.count(), s"docs lost/duplicated: $nDocs")
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == bm25Expected(docs, Set.empty, 15))
  }

  test("dedup tier fold: base referenced, probe identical, VACUUM collapses") {
    val path = "/tmp/graft_test_index/tier_dedup"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val half = (hi - lo) / 2
    val corpus1 = docs.filter($"doc_id" <= lo + half)
    Dedup.buildDedupIndex(corpus1, "doc_id", "text", path)
    val rest = docs.filter($"doc_id" > lo + half)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val (a, b) = rest.splitAt(rest.length / 2)
    Dedup.appendDedupIndex(a.toSeq.toDF("doc_id", "text"), path,
      "doc_id", "text", 1L)
    Dedup.appendDedupIndex(b.toSeq.toDF("doc_id", "text"), path,
      "doc_id", "text", 2L)

    assert(Dedup.compactDedupIndex(spark, path, tiered = true))
    val root = graft.index.DiskannIndex.resolveRoot(spark, path)
    assert(graft.index.TierManifest.tierBase(spark, root).contains(path))
    val localBatches = spark.read.parquet(s"$root/bands")
      .select($"batch".cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(localBatches == Set(1L))
    // probe a batch whose twin lives in the BASE and one in the TIER —
    // both must match through the union view
    val twinBase = corpus1.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val twinTier = a.head
    val probe = Seq((9000L, twinBase._2), (9001L, twinTier._2))
      .toDF("doc_id", "text")
    val got = Dedup.nearDupAgainstDedupIndex(spark, path, probe,
        "doc_id", "text", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.contains((9000L, twinBase._1)) &&
      got.contains((9001L, twinTier._1)), s"probe missed twins: $got")

    // tombstone the base twin; tiered request degrades to full VACUUM
    Dedup.deleteFromDedupIndex(spark, path, Seq(twinBase._1))
    assert(Dedup.compactDedupIndex(spark, path, tiered = true))
    val root2 = graft.index.DiskannIndex.resolveRoot(spark, path)
    assert(graft.index.TierManifest.tierBase(spark, root2).isEmpty)
    val got2 = Dedup.nearDupAgainstDedupIndex(spark, path, probe,
        "doc_id", "text", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(!got2.exists(_._2 == twinBase._1), "folded takedown resurrected")
    assert(got2.contains((9001L, twinTier._1)))
    val sigs = spark.read.parquet(s"$root2/signatures").select($"id")
    assert(sigs.count() == docs.count() - 1)
    assert(sigs.count() == sigs.distinct().count())
  }
}
