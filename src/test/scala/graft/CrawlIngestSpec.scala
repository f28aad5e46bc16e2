package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions.{col, reverse}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.CrawlIngest

/** The streaming crawl bridge: WARC segment discovery → quality gate →
  * dedup probe → documents + dedup state, exactly-once across micro-batch
  * replays (foreachBatch is at-least-once; the per-store markers and the
  * replay-stable probe must make it exactly-once). */
class CrawlIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(warcType: String, uri: String, payload: String,
      contentType: String, extra: Seq[String] = Nil): Array[Byte] = {
    val p = payload.getBytes(UTF_8)
    val h = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-05-06T07:08:09Z\r\n" +
      extra.map(_ + "\r\n").mkString +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(UTF_8)
    h ++ p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def html(uri: String, text: String): Array[Byte] =
    rec("response", uri, s"<html><body><p>$text</p></body></html>",
      "text/html")

  /** One gzip member per record — the Common Crawl segment framing. */
  private def writeSegment(path: java.io.File,
      recs: Seq[Array[Byte]]): Unit = {
    val out = new java.io.FileOutputStream(path)
    recs.foreach { r =>
      val g = new GZIPOutputStream(out); g.write(r); g.finish()
    }
    out.close()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  private val seedText =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val goodA =
    "Organic gardening is a rewarding hobby that anyone with patience " +
      "and a small plot of land can enjoy through the seasons."
  private val goodB =
    "Mountain weather changes quickly and hikers should always carry " +
      "warm layers even on a sunny summer morning."
  private val twinText =
    "Libraries remain one of the few public spaces where anyone can " +
      "sit and read for hours without spending any money at all."

  test("crawl bridge: two micro-batches (one replayed) land exactly-once") {
    val base = new java.io.File("/tmp/graft_test_crawl")
    deleteRec(base)
    val segments = new java.io.File(base, "segments"); segments.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val textPath = s"$base/text_index"
    val ckpt = s"$base/ckpt"

    // corpus state the probe runs against: one seeded document — in both
    // the dedup index and the BM25 text index the bridge keeps in lockstep
    Dedup.buildDedupIndex(
      Seq((9000L, seedText)).toDF("doc_id", "text"), "doc_id", "text",
      dedupPath)
    graft.operators.TextIndex.buildTextIndex(
      Seq((9000L, seedText)).toDF("doc_id", "text"), "doc_id", "text",
      textPath, nBuckets = 8)
    // ANN leg: seed a small stub-embedding index the bridge appends into
    val annPath = s"$base/ann_index"
    graft.index.DiskannIndex.build(
      (0 until 4).map(i => (9000L + i, s"$seedText seed $i"))
        .toDF("doc_id", "text")
        .select(col("doc_id").as("row_id"),
          CrawlIngest.stubTextEmbedding(col("text")).as("vec")),
      "row_id", "vec", None, annPath,
      graft.index.DiskannParams(metric = "cosine"))

    // segment A (batch 0): one keeper, one low-quality drop (digit soup),
    // one near-dup of the SEED (one trailing token added: J ~= 12/13)
    writeSegment(new java.io.File(segments, "segA.warc.gz"), Seq(
      html("http://x.test/a1", goodA),
      html("http://x.test/a2",
        "84 3921 555 0193 7777 1234 9876 5432 1111 2222"),
      html("http://x.test/a3", seedText + " today")))

    val q = CrawlIngest.startCrawlIngest(spark, segments.getAbsolutePath,
      docsPath, dedupPath, ckpt, textIndexPath = Some(textPath),
      annIndexPath = Some(annPath))
    try {
      q.processAllAvailable()
      val r0 = spark.read.parquet(docsPath)
        .select("url", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(r0.keySet == Set("http://x.test/a1"),
        s"batch 0 landed ${r0.keySet}")
      assert(r0("http://x.test/a1") == goodA)

      // segment B (batch 1): one keeper, one corpus near-dup (the exact
      // text batch 0 landed, different url), and two identical in-batch
      // twins of which exactly one may survive
      writeSegment(new java.io.File(segments, "segB.warc.gz"), Seq(
        html("http://x.test/b1", goodB),
        html("http://x.test/b2", goodA),
        html("http://x.test/b3", twinText),
        html("http://x.test/b4", twinText)))
      q.processAllAvailable()
    } finally q.stop()

    def state(): Seq[String] = spark.read.parquet(docsPath)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    val after = state()
    val twins = after.filter(u => u == "http://x.test/b3" || u == "http://x.test/b4")
    assert(twins.size == 1, s"in-batch twins must collapse to one: $after")
    assert(after.toSet ==
      Set("http://x.test/a1", "http://x.test/b1", twins.head),
      s"batch 1 landed $after")

    // the text index landed the same survivors: goodB's distinctive term
    // resolves to exactly one doc, and the corpus doc count tracks the
    // documents table (+1 for the seed)
    def bm25Docs(): Long = spark.read.parquet(
      s"${graft.operators.TextIndex.resolveRoot(spark, textPath)}/corpusstats")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    val hikers = graft.operators.TextIndex.bm25SearchIndexed(spark, textPath,
      Seq("hikers")).collect()
    assert(hikers.length == 1, s"bm25 'hikers' hits: ${hikers.length}")
    assert(bm25Docs() == after.size + 1L,
      s"text index doc count ${bm25Docs()} vs documents ${after.size}+seed")

    // ANN leg: the landed keeper is vector-searchable through the
    // freshness-honoring path, at its own stub embedding, distance ~0
    val goodBId = spark.read.parquet(docsPath)
      .filter(col("url") === "http://x.test/b1")
      .head().getAs[Long]("doc_id")
    def annTop1(): (Long, Double) = {
      val r = graft.streaming.StreamingIngest.searchFresh(spark, annPath,
        Seq((0L, goodB)).toDF("qid", "text")
          .select(col("qid"),
            CrawlIngest.stubTextEmbedding(col("text")).as("qvec")),
        k = 1, searchListSize = 64, rescore = 64).head()
      (r.getAs[Long]("row_id"), r.getAs[Double]("dist"))
    }
    val (annId, annDist) = annTop1()
    assert(annId == goodBId && annDist < 1e-6,
      s"ANN leg missed the landed doc: $annId at $annDist (want $goodBId)")

    // full replay of batch 1 (at-least-once retry after both markers): no-op
    val segB = new java.io.File(segments, "segB.warc.gz").getAbsolutePath
    CrawlIngest.ingestSegments(spark, Seq(segB), docsPath, dedupPath, 1L,
      textIndexPath = Some(textPath), annIndexPath = Some(annPath))
    assert(state() == after, "fully-committed replay must be a no-op")
    assert(bm25Docs() == after.size + 1L, "replay must not inflate bm25 stats")
    assert(annTop1() == ((goodBId, annDist)),
      "ANN replay must stay duplicate-tolerant")

    // torn replay: crash landed the documents AND the dedup signatures but
    // neither marker — delete both markers and re-run. The probe excludes
    // this batch's own physical dedup batch, so the replay must re-land
    // the identical rows, not drop them as self-near-dups.
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(docsPath).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$docsPath/_stream/b1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dedupPath/_stream/b${Dedup.STREAM_BATCH_BASE + 1L}"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$textPath/_stream/b${graft.operators.TextIndex.STREAM_BATCH_BASE + 1L}"),
      false)
    CrawlIngest.ingestSegments(spark, Seq(segB), docsPath, dedupPath, 1L,
      textIndexPath = Some(textPath), annIndexPath = Some(annPath))
    assert(state() == after,
      "torn replay must rewrite the batch, never duplicate or drop it")
    assert(annTop1()._1 == goodBId,
      "ANN state must survive the torn replay (duplicates fold away)")
    assert(bm25Docs() == after.size + 1L,
      "torn replay must replace the text batch, not re-append it")

    // dedup state sanity: the landed keepers probe as exact matches, once
    val probe = Dedup.nearDupAgainstDedupIndex(spark, dedupPath,
      Seq((1L, goodB)).toDF("doc_id", "text"), "doc_id", "text", 0.99)
      .collect()
    assert(probe.length == 1,
      s"goodB must sit in the dedup index exactly once: ${probe.length}")
  }

  test("crawl bridge autoCompact: tiered folds keep store batch counts bounded") {
    val base = new java.io.File("/tmp/graft_test_crawl_ac")
    deleteRec(base)
    val segments = new java.io.File(base, "segments"); segments.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    Dedup.buildDedupIndex(Seq((9000L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", dedupPath)
    // every committed batch trips the fold
    spark.conf.set("graft.compact.dedupMaxBatches", "1")
    val texts = Seq(goodA, goodB, twinText)
    try {
      texts.zipWithIndex.foreach { case (t, i) =>
        writeSegment(new java.io.File(segments, s"s$i.warc.gz"),
          Seq(html(s"http://ac.test/$i", t)))
      }
      val q = CrawlIngest.startCrawlIngest(spark, segments.getAbsolutePath,
        docsPath, dedupPath, s"$base/ckpt", maxFilesPerTrigger = 1,
        autoCompact = true)
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.unset("graft.compact.dedupMaxBatches")
    // every doc landed exactly once…
    val landed = spark.read.parquet(docsPath)
      .select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(landed == texts.sorted, s"autoCompact lost/duplicated docs: $landed")
    // …and the folds collapsed the stream batches (base tier + at most the
    // newest unfolded append)
    assert(Dedup.localBatchCount(spark, dedupPath) <= 2,
      s"batch count unbounded: ${Dedup.localBatchCount(spark, dedupPath)}")
    // the folded state still answers probes (no signatures lost to a fold)
    val p = Dedup.nearDupAgainstDedupIndex(spark, dedupPath,
      Seq((1L, goodA)).toDF("doc_id", "text"), "doc_id", "text", 0.99)
    assert(p.count() == 1)
  }

  test("encoder contract: a custom encoder flows through delta/fold/search") {
    val base = new java.io.File("/tmp/graft_test_crawl_encoder")
    deleteRec(base)
    val segments = new java.io.File(base, "segments"); segments.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val annPath = s"$base/ann_index"
    Dedup.buildDedupIndex(Seq((9000L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", dedupPath)
    graft.index.DiskannIndex.build(
      (0 until 4).map(i => (9000L + i, s"$seedText seed $i"))
        .toDF("doc_id", "text")
        .select(col("doc_id").as("row_id"),
          CrawlIngest.stubTextEmbedding(col("text")).as("vec")),
      "row_id", "vec", None, annPath,
      graft.index.DiskannParams(metric = "cosine"))
    writeSegment(new java.io.File(segments, "s0.warc.gz"),
      Seq(html("http://enc.test/a", goodA)))
    // the custom encoder: same contract (doc_id->row_id, ARRAY<FLOAT> vec),
    // DIFFERENT embedding function — stub features of the REVERSED text
    val custom: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      docs => docs.select(col("doc_id").as("row_id"),
        CrawlIngest.stubTextEmbedding(reverse(col("text"))).as("vec"))
    CrawlIngest.ingestSegments(spark,
      Seq(new java.io.File(segments, "s0.warc.gz").getAbsolutePath),
      docsPath, dedupPath, 0L, annIndexPath = Some(annPath),
      encoder = Some(custom))
    val docId = spark.read.parquet(docsPath).head().getAs[Long]("doc_id")
    def top1(qvec: org.apache.spark.sql.Column): (Long, Double) = {
      val r = graft.streaming.StreamingIngest.searchFresh(spark, annPath,
        Seq((0L, goodA)).toDF("qid", "text")
          .select(col("qid"), qvec.as("qvec")),
        k = 1, searchListSize = 64, rescore = 64).head()
      (r.getAs[Long]("row_id"), r.getAs[Double]("dist"))
    }
    // the landed vector is the CUSTOM embedding: its own query hits at ~0…
    val (hitId, hitDist) = top1(
      CrawlIngest.stubTextEmbedding(reverse(col("text"))))
    assert(hitId == docId && hitDist < 1e-9,
      s"custom-encoded doc must serve through the delta: $hitId@$hitDist")
    // …and the DEFAULT embedding of the same text does NOT sit at ~0 —
    // proof the custom encoder (not the stub) produced the stored vector
    val (_, defDist) = top1(CrawlIngest.stubTextEmbedding(col("text")))
    assert(defDist > 1e-6, s"default-stub query should miss: $defDist")
    // fold the delta into the graph; the custom vector must survive
    assert(graft.streaming.StreamingIngest.maybeCompact(spark, annPath,
      maxDeltaRows = 1), "fold should trigger")
    val (postId, postDist) = top1(
      CrawlIngest.stubTextEmbedding(reverse(col("text"))))
    assert(postId == docId && postDist < 1e-9,
      s"custom vector must survive the fold: $postId@$postDist")
  }

  test("ingest stats + revisit ledger: every drop is counted, verdicts land") {
    val base = new java.io.File("/tmp/graft_test_crawl_stats")
    deleteRec(base)
    val segments = new java.io.File(base, "segments"); segments.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val revPath = s"$base/revisits"
    Dedup.buildDedupIndex(Seq((9000L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", dedupPath)
    // one keeper, one below-quality, TWO corpus near-dups of the seed that
    // are also in-batch twins of EACH OTHER (the overlap case: per-cause
    // tallies may intersect; docsLanded must count the landed frame, not
    // gated minus the tally sum), two plain in-batch twins, and two
    // revisit records (the crawler's own verdicts)
    writeSegment(new java.io.File(segments, "st0.warc.gz"), Seq(
      html("http://st.test/keep", goodA),
      html("http://st.test/junk",
        "84 3921 555 0193 7777 1234 9876 5432 1111 2222"),
      html("http://st.test/cdup", seedText + " today"),
      html("http://st.test/cdup2", seedText + " now"),
      html("http://st.test/twin1", twinText),
      html("http://st.test/twin2", twinText),
      rec("revisit", "http://st.test/keep", "", "application/http",
        extra = Seq("WARC-Payload-Digest: sha1:AAAA",
          "WARC-Refers-To-Date: 2026-01-01T00:00:00Z")),
      rec("revisit", "http://st.test/KEEP#frag", "", "application/http",
        extra = Seq("WARC-Payload-Digest: sha1:AAAA"))))
    val seg = new java.io.File(segments, "st0.warc.gz").getAbsolutePath
    val stats = CrawlIngest.ingestSegments(spark, Seq(seg), docsPath,
      dedupPath, 0L, revisitsPath = Some(revPath))
    // both cdup docs near-dup the corpus seed (droppedCorpusDup = 2); the
    // in-batch pass then runs on the corpus-dup-free remainder, so only the
    // twin pair contributes there. docsLanded is the landed frame's exact
    // count — and must equal what actually sits in the documents store.
    assert(stats == CrawlIngest.IngestStats(
      docsExtracted = 6, droppedQuality = 1, droppedCorpusDup = 2,
      droppedInBatchDup = 1, docsLanded = 2, revisitsLanded = 2), stats)
    assert(spark.read.parquet(docsPath).count() == stats.docsLanded)
    // per-cause tallies are allowed to overlap; the distinct dup-drop count
    // is the difference identity, never the tally sum
    assert(stats.docsExtracted - stats.droppedQuality - stats.docsLanded
      == 3)
    // the ledger landed, header-only, with basename provenance
    val rev = spark.read.parquet(revPath)
    assert(rev.count() == 2)
    assert(rev.select("file").distinct().head().getString(0)
      == "st0.warc.gz")
    assert(rev.filter(col("payload_digest") === "sha1:AAAA").count() == 2)
    // a fully-committed replay is a no-op and says so
    val replay = CrawlIngest.ingestSegments(spark, Seq(seg), docsPath,
      dedupPath, 0L, revisitsPath = Some(revPath))
    assert(replay.skippedAsCommitted && replay.docsLanded == 0)
    assert(spark.read.parquet(revPath).count() == 2)
    // a torn revisit replay (marker lost) replaces the batch, not appends
    val fs = new org.apache.hadoop.fs.Path(revPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$revPath/_stream/b0"), false)
    CrawlIngest.ingestSegments(spark, Seq(seg), docsPath, dedupPath, 0L,
      revisitsPath = Some(revPath))
    assert(spark.read.parquet(revPath).count() == 2,
      "torn revisit replay must replace-by-batch, never duplicate")
    // lifetime counters accumulated across the (one real) ingest
    val acc = CrawlIngest.ingestCounters(spark)
    assert(acc("docs_landed").value >= 2 && acc("revisits_landed").value >= 2)
  }

  test("census leg: per-batch disposition rollups land exactly-once") {
    val base = new java.io.File("/tmp/graft_test_crawl_census")
    deleteRec(base)
    val segments = new java.io.File(base, "segments"); segments.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val dispPath = s"$base/dispositions"
    Dedup.buildDedupIndex(Seq((9000L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", dedupPath)
    // a keeper, a below-quality page, a warcinfo framing record, a PNG and
    // a revisit — each a distinct disposition; the keeper carries a
    // WARC-Truncated header so n_truncated flows through the rollup
    writeSegment(new java.io.File(segments, "cn0.warc.gz"), Seq(
      rec("response", "http://cn.test/keep",
        s"<html><body><p>$goodA</p></body></html>", "text/html",
        extra = Seq("WARC-Truncated: length")),
      html("http://cn.test/junk",
        "84 3921 555 0193 7777 1234 9876 5432 1111 2222"),
      rec("warcinfo", "", "software: graft", "application/warc-fields"),
      rec("response", "http://cn.test/logo.png", "fakepng", "image/png"),
      rec("revisit", "http://cn.test/keep", "", "application/http",
        extra = Seq("WARC-Payload-Digest: sha1:AAAA"))))
    val seg = new java.io.File(segments, "cn0.warc.gz").getAbsolutePath
    val stats = CrawlIngest.ingestSegments(spark, Seq(seg), docsPath,
      dedupPath, 0L, dispositionsPath = Some(dispPath))
    assert(stats.docsLanded == 1 && stats.droppedQuality == 1)
    val rows = spark.read.parquet(dispPath)
      .collect().map(r => r.getAs[String]("disposition") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_truncated"),
          r.getAs[Long]("batch_id")))).toMap
    assert(rows == Map(
      "document" -> ((1L, 1L, 0L)),
      "below_quality" -> ((1L, 0L, 0L)),
      "non_document_type" -> ((1L, 0L, 0L)),
      "media" -> ((1L, 0L, 0L)),
      "revisit" -> ((1L, 0L, 0L))), s"census drifted: $rows")
    // the documents store is unaffected by the census leg's extra rows
    assert(spark.read.parquet(docsPath).count() == 1)
    // committed replay: no-op; torn replay (marker lost): replace-by-batch
    assert(CrawlIngest.ingestSegments(spark, Seq(seg), docsPath, dedupPath,
      0L, dispositionsPath = Some(dispPath)).skippedAsCommitted)
    val fs = new org.apache.hadoop.fs.Path(dispPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dispPath/_stream/b0"), false)
    CrawlIngest.ingestSegments(spark, Seq(seg), docsPath, dedupPath, 0L,
      dispositionsPath = Some(dispPath))
    assert(spark.read.parquet(dispPath).count() == 5,
      "torn census replay must replace-by-batch, never duplicate")
  }

  test("collision audit cadence: a seeded corpus collision fails loud") {
    val base = new java.io.File("/tmp/graft_test_crawl_cadence")
    deleteRec(base)
    Seq((1L, "segA.warc.gz", 0L), (1L, "segB.warc.gz", 4L),
        (2L, "segA.warc.gz", 1L))
      .toDF("doc_id", "file", "offset").write.parquet(s"$base/documents")
    // off-cadence batches and a disabled cadence are no-ops…
    CrawlIngest.maybeAuditCollisions(spark, s"$base/documents", 30L, 32)
    CrawlIngest.maybeAuditCollisions(spark, s"$base/documents", 31L, 0)
    // …the aligned batch sweeps the corpus and fails loud
    val e = intercept[RuntimeException] {
      CrawlIngest.maybeAuditCollisions(spark, s"$base/documents", 31L, 32)
    }
    assert(e.getMessage.contains("collision"), e.getMessage)
  }

  test("doc-id collision audit: distinct provenances on one id fail loud") {
    // the detector itself, on a synthetic collision (a real xxhash64
    // collision needs ~2^32 docs — the audit is what makes the silent-loss
    // mode detectable at fold/audit time)
    val collided = Seq(
      (1L, "segA.warc.gz", 0L), (1L, "segB.warc.gz", 4L),
      (2L, "segA.warc.gz", 1L),
      (3L, "segC.warc.gz", 2L), (3L, "segC.warc.gz", 2L)) // same prov: OK
      .toDF("doc_id", "file", "offset")
    val hits = CrawlIngest.docIdCollisions(collided).collect()
    assert(hits.length == 1 && hits.head.getLong(0) == 1L,
      s"exactly the two-provenance id must flag: ${hits.toSeq}")
    // corpus-wide audit over a stored documents table
    val base = new java.io.File("/tmp/graft_test_crawl_audit")
    deleteRec(base)
    collided.write.parquet(s"$base/documents")
    val audit = CrawlIngest.auditDocIdCollisions(spark, s"$base/documents")
      .collect()
    assert(audit.length == 1 && audit.head.getLong(0) == 1L)
  }

  test("duplicate segment basenames in one batch fail loud") {
    // doc ids hash the basename: two paths sharing one would collide every
    // id with IDENTICAL provenance — invisible to the hash-collision guard,
    // so the contract is enforced exactly on the path list
    val e = intercept[IllegalArgumentException] {
      CrawlIngest.ingestSegments(spark,
        Seq("/crawlA/seg0.warc.gz", "/crawlB/seg0.warc.gz"),
        "/tmp/x_docs", "/tmp/x_dedup", 0L)
    }
    assert(e.getMessage.contains("basename"), e.getMessage)
  }

  test("segment paths with commas or glob metacharacters fail loud") {
    val e = intercept[IllegalArgumentException] {
      CrawlIngest.ingestSegments(spark, Seq("/tmp/a,b.warc.gz"),
        "/tmp/x_docs", "/tmp/x_dedup", 0L)
    }
    assert(e.getMessage.contains("metacharacter"), e.getMessage)
    val g = intercept[IllegalArgumentException] {
      CrawlIngest.ingestSegments(spark, Seq("/tmp/seg{0,1}.warc.gz"),
        "/tmp/x_docs", "/tmp/x_dedup", 0L)
    }
    assert(g.getMessage.contains("metacharacter"), g.getMessage)
  }
}
