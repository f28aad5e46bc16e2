package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis, TextIndex}

/** The stored inverted text index: pruned serving, append folding,
  * bucket-route agreement between the Column and driver definitions. */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val terms = Seq("vector", "query", "dup")

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  /** Independent expected result: per-term scores via the VERIFIED one-shot
    * scorer run one term at a time, rounded to 6 decimals and summed as
    * BigDecimal — exactly the index's summation contract. */
  private def expected(corpus: org.apache.spark.sql.DataFrame,
      n: Int): Seq[(Long, Double)] = {
    val perTerm = terms.map { t =>
      TextAnalysis.bm25(corpus, "doc_id", "text", Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    perTerm.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter(_._2 > 0)
      .map { case (id, s) => (id, s.toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }
      .take(n)
  }

  test("termBucketOf (driver) == termBucket (Column) on real vocabulary") {
    val nB = 64
    val sample = docs.select(explode(TextAnalysis.tokens($"text")).as("t"))
      .distinct().limit(500)
      .withColumn("tb", TextIndex.termBucket($"t", nB))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(sample.nonEmpty)
    sample.foreach { case (t, tb) =>
      assert(TextIndex.termBucketOf(t, nB) == tb, s"route drift for '$t'")
    }
  }

  test("indexed BM25: pruned scan, scores match the one-shot scorer") {
    val path = "/tmp/graft_test_index/textidx_full"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path)
    val res = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
    // postings + termstats scans must carry partition filters and read at
    // most |distinct buckets| partitions per batch each
    val scans = res.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pruned = scans.filter(_.partitionFilters.nonEmpty)
    assert(pruned.size >= 2, s"expected pruned postings+termstats scans, " +
      s"got ${pruned.size} of ${scans.size}")
    val nBk = terms.map(TextIndex.termBucketOf(_, 64)).distinct.size
    pruned.foreach(s =>
      assert(s.selectedPartitions.partitionCount <= nBk,
        s"read ${s.selectedPartitions.partitionCount} partitions, " +
          s"query touches only $nBk buckets"))
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected(docs, 20))
  }

  test("append folds: build(half) + append(half) == build(all)") {
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val mid = (ids.getLong(0) + ids.getLong(1)) / 2
    val path = "/tmp/graft_test_index/textidx_inc"
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= mid),
      "doc_id", "text", path)
    TextIndex.appendTextIndex(docs.filter($"doc_id" > mid),
      "doc_id", "text", path, batchId = 1L)
    val inc = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inc == expected(docs, 20),
      "incremental index diverged from the full rebuild")
    // corpus stats really are per-batch rows, folded at query time
    assert(spark.read.parquet(s"$path/corpusstats").count() == 2)
  }

  test("bucket count is idxmeta-authoritative, contradiction rejected") {
    val path = "/tmp/graft_test_index/textidx_b8"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path, nBuckets = 8)
    // default-arg search must consult idxmeta (8), not assume 64 — a wrong
    // bucket count would silently prune the wrong dirs and drop results
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected(docs, 20))
    val e = intercept[IllegalArgumentException](
      TextIndex.bm25SearchIndexed(spark, path, terms, nBuckets = 64))
    assert(e.getMessage.contains("recorded bucket count 8"))
  }

  test("phrase search: adjacency, occurrence counts, repeated terms") {
    val corpus = Seq(
      (1L, "big data big data big"), // "big data" x2, "data big" x2
      (2L, "data big"),
      (3L, "big big big"),           // "big big" x2 (overlapping)
      (4L, "data data"),
      (5L, "")).toDF("doc_id", "text")
    val path = "/tmp/graft_test_index/textidx_phrase"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", path,
      positions = true)
    def search(p: String*): Seq[(Long, Long)] =
      TextIndex.phraseSearchIndexed(spark, path, p, n = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(search("big", "data") == Seq((1L, 2L)))
    assert(search("data", "big") == Seq((1L, 2L), (2L, 1L)))
    // doc 1 alternates big/data — no ADJACENT big pair there
    assert(search("big", "big") == Seq((3L, 2L)))
    assert(search("big", "data", "big") == Seq((1L, 2L)))
    assert(search("data", "data") == Seq((4L, 1L)))
    // 3-occurrence tie between docs 1 and 3 breaks on id
    assert(search("big") == Seq((1L, 3L), (3L, 3L), (2L, 1L)))
    assert(search("missing", "data").isEmpty)
    // a positionless index refuses instead of answering wrong
    val flat = "/tmp/graft_test_index/textidx_noflat"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", flat)
    val e = intercept[IllegalArgumentException](
      TextIndex.phraseSearchIndexed(spark, flat, Seq("big", "data")))
    assert(e.getMessage.contains("positions"))
  }

  test("proximity search: anchor-window semantics, unordered within slop") {
    val corpus = Seq(
      (1L, "table join hash"),          // both within 2 of table@0 → 1
      (2L, "table x x join hash"),      // join@3 > slop 2 from table@0 → 0
      (3L, "join table hash"),          // unordered: join BEFORE anchor → 1
      (4L, "table join hash table"),    // both anchors qualify → 2
      (5L, "table alone"))              // missing terms → dropped by join
      .toDF("doc_id", "text")
    val path = "/tmp/graft_test_index/textidx_prox"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", path,
      positions = true)
    val got = TextIndex.proximitySearchIndexed(spark, path,
        Seq("table", "join", "hash"), slop = 2, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((4L, 2L), (1L, 1L), (3L, 1L)))
    // wider slop admits doc 2
    val wide = TextIndex.proximitySearchIndexed(spark, path,
        Seq("table", "join", "hash"), slop = 4, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(wide == Seq((4L, 2L), (1L, 1L), (2L, 1L), (3L, 1L)))
    // a positionless index refuses instead of answering wrong
    val flat = "/tmp/graft_test_index/textidx_prox_flat"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", flat)
    val e = intercept[IllegalArgumentException](
      TextIndex.proximitySearchIndexed(spark, flat,
        Seq("table", "join"), slop = 2))
    assert(e.getMessage.contains("positions"))
  }

  test("phrase search on real docs matches a token-list recompute") {
    val path = "/tmp/graft_test_index/textidx_phrase_real"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path, positions = true)
    val got = TextIndex.phraseSearchIndexed(spark, path,
        Seq("table", "hash"), n = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = docs.select($"doc_id", $"text").collect().map { r =>
      val w = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> w.sliding(2).count(s =>
        s.length == 2 && s(0) == "table" && s(1) == "hash").toLong
    }.filter(_._2 > 0).sortBy { case (id, c) => (-c, id) }.toSeq
    assert(got == expect.take(1000))
    assert(got.nonEmpty, "fixture should contain the phrase")
  }

  test("batched BM25 == per-query calls, byte-identical") {
    val path = "/tmp/graft_test_index/textidx_full"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path)
    val bags = Seq(0L -> Seq("vector", "query", "dup"),
      1L -> Seq("table", "hash", "join"), 2L -> Seq("big", "data"))
    val qdf = spark.createDataFrame(bags).toDF("qid", "terms")
    val batch = TextIndex.bm25SearchIndexedBatch(spark, path, qdf, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val single = bags.flatMap { case (q, ts) =>
      TextIndex.bm25SearchIndexed(spark, path, ts, n = 10)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
    }
    assert(batch == single)
    // duplicate terms in one bag count once (set semantics, like the
    // single-query API's term list)
    val dup = TextIndex.bm25SearchIndexedBatch(spark, path,
        spark.createDataFrame(Seq(7L -> Seq("big", "big", "data")))
          .toDF("qid", "terms"), n = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ref = TextIndex.bm25SearchIndexed(spark, path, Seq("big", "data"),
        n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(dup == ref)
  }

  test("compaction folds batches into one installed generation") {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val path = "/tmp/graft_test_index/textidx_compact"
    deleteRec(new java.io.File(path))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val mid = (ids.getLong(0) + ids.getLong(1)) / 2
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= mid),
      "doc_id", "text", path, positions = true)
    TextIndex.appendTextIndex(docs.filter($"doc_id" > mid),
      "doc_id", "text", path, batchId = TextIndex.nextBatchId(spark, path))
    val before = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pBefore = TextIndex.phraseSearchIndexed(spark, path,
        Seq("table", "hash"), n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(TextIndex.compactTextIndex(spark, path))
    val root = TextIndex.resolveRoot(spark, path)
    assert(root.contains("/versions/v"), s"not versioned: $root")
    // one folded batch, flat data dirs pruned only when out of grace
    assert(spark.read.parquet(s"$root/corpusstats").count() == 1)
    val after = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "compaction changed BM25 results")
    val pAfter = TextIndex.phraseSearchIndexed(spark, path,
        Seq("table", "hash"), n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pAfter == pBefore, "compaction lost positions")
    // idempotent: single batch → no-op
    assert(!TextIndex.compactTextIndex(spark, path))
    // append AFTER compaction lands in the new generation and folds in
    assert(TextIndex.nextBatchId(spark, path) == 1L)
    TextIndex.appendTextIndex(
      Seq((999999L, "table hash table hash")).toDF("doc_id", "text"),
      "doc_id", "text", path, batchId = 1L)
    val p2 = TextIndex.phraseSearchIndexed(spark, path,
      Seq("table", "hash"), n = 5).collect()
    assert(p2.head.getLong(0) == 999999L && p2.head.getLong(1) == 2L)
    // second compaction installs v2 and prunes v1's predecessor state
    assert(TextIndex.compactTextIndex(spark, path))
    assert(TextIndex.resolveRoot(spark, path).endsWith("v000000002"))
    // grace window: exactly the current + predecessor generations remain
    assert(graft.index.DiskannIndex.listVersions(spark, path)
      == Seq("v000000001", "v000000002"))
    // flat root's data dirs were pruned once out of the grace window
    assert(!new java.io.File(s"$path/postings").exists())
  }

  test("streaming ingest: replay-safe appends, results match a full build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = "/tmp/graft_test_index/textidx_stream"
    val ckpt = s"$path.ckpt"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(path)); deleteRec(new java.io.File(ckpt))
    val ids = docs.select(min($"doc_id"), max($"doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val third = (hi - lo) / 3
    TextIndex.buildTextIndex(docs.filter($"doc_id" <= lo + third),
      "doc_id", "text", path, positions = true)
    val rows = docs.filter($"doc_id" > lo + third)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (b1, b2) = rows.partition(_._1 <= lo + 2 * third)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextIndex.startTextIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected(docs, 20),
      "streamed index diverged from the full corpus")
    // manual replay of an already-committed stream batch is a no-op
    val statsBefore = spark.read
      .parquet(s"${TextIndex.resolveRoot(spark, path)}/corpusstats").count()
    TextIndex.appendBatchIdempotent("doc_id", "text", path)(
      b2.toSeq.toDF("doc_id", "text"), 1L)
    val statsAfter = spark.read
      .parquet(s"${TextIndex.resolveRoot(spark, path)}/corpusstats").count()
    assert(statsAfter == statsBefore, "replayed batch was double-applied")
  }

  test("SQL TVFs: graft_bm25 / graft_phrase compose into queries") {
    import org.apache.spark.sql.SparkSession
    val path = "/tmp/graft_test_index/textidx_tvf"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path, positions = true)
    val expectBm = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expectPh = TextIndex.phraseSearchIndexed(spark, path,
        Seq("table", "hash"), n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prev = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
      val viaSql = s2.sql(
        s"SELECT * FROM graft_bm25('$path', '${terms.mkString(" ")}')")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaSql == expectBm)
      val viaPhrase = s2.sql(
        s"SELECT * FROM graft_phrase('$path', 'table hash', 10)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaPhrase == expectPh)
      val expectNear = TextIndex.proximitySearchIndexed(spark, path,
          Seq("table", "join", "hash"), slop = 4, n = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaNear = s2.sql(
        s"SELECT * FROM graft_near('$path', 'table join hash', 4, 10)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaNear == expectNear && viaNear.nonEmpty)
      // a TVF is a plan fragment, not a collected result: joining back to
      // the corpus composes in ONE query
      val joined = s2.sql(
        s"""SELECT b.id, d.lang FROM graft_bm25('$path', 'dup', 5) b
           |JOIN parquet.`/root/testdata/sf0.001/documents.parquet` d
           |  ON b.id = d.doc_id ORDER BY b.bm25 DESC, b.id""".stripMargin)
        .collect()
      assert(joined.length == 5 && joined.forall(!_.isNullAt(1)))
      // non-literal args fail with the pruning explanation
      val e = intercept[Exception](
        s2.sql(s"SELECT * FROM graft_bm25('$path', concat('a', 'b'))")
          .collect())
      assert(e.getMessage.contains("literal"))
      // DESCRIBE-style stats through SQL
      val st = s2.sql(s"SELECT * FROM graft_text_stats('$path')").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(st("num_docs").toLong == docs.count())
      assert(st("positions") == "true" && st("num_buckets") == "64")
      assert(st("vocabulary_size").toLong > 0 &&
        st("posting_rows").toLong >= st("vocabulary_size").toLong)
      // the SHARED SQL lifecycle: DELETE FROM INDEX / VACUUM INDEX work on
      // a bare text-index path (no catalog registration) — one tombstone
      // registry and one generation story across all three artifacts
      val top2 = expectBm.take(2).map(_._1)
      s2.sql(s"DELETE FROM INDEX ON '$path' WHERE ROW_ID IN " +
        s"(${top2.mkString(", ")})").collect()
      val afterDel = s2.sql(
        s"SELECT * FROM graft_bm25('$path', '${terms.mkString(" ")}')")
        .collect().map(_.getLong(0)).toSeq
      assert(afterDel.intersect(top2).isEmpty,
        "SQL-deleted docs still served by graft_bm25")
      val vac = s2.sql(s"VACUUM INDEX ON '$path'").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(vac("vacuumed") == "true" && vac("tombstones_folded") == "2")
      assert(graft.index.DiskannIndex.loadTombstones(s2, path).isEmpty)
      val afterVac = s2.sql(
        s"SELECT * FROM graft_bm25('$path', '${terms.mkString(" ")}')")
        .collect().map(_.getLong(0)).toSeq
      assert(afterVac.intersect(top2).isEmpty && afterVac.nonEmpty)
      // a typo'd path errors instead of minting a tombstone dir
      val e2 = intercept[Exception](s2.sql(
        "DELETE FROM INDEX ON '/tmp/graft_test_index/nope' " +
          "WHERE ROW_ID IN (1)").collect())
      assert(e2.getMessage.contains("no stored artifact"))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("stored dedup index: probe == recompute, append extends the corpus") {
    import graft.operators.Dedup
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val path = "/tmp/graft_test_index/dedupidx"
    deleteRec(new java.io.File(path))
    val mkDoc = (i: Long, twist: String) =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta $twist run $i")
    val corpus = ((1L to 40L).map(i => mkDoc(i, s"unique$i")) :+
      (100L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"),
      (201L, "totally different words nothing in common here at all okay"))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    graft.CacheScope.releaseAll()
    def probe(b: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupAgainstDedupIndex(spark, path, b, "doc_id", "text", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val viaIndex = probe(batch)
    val direct = Dedup.minhashNearDupAgainst(corpus, batch, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(viaIndex == direct && viaIndex == Seq((200L, 100L)))
    // verified batch appended → next batch dedups against it too
    Dedup.appendDedupIndex(batch, path, "doc_id", "text", batchId = 1L)
    graft.CacheScope.releaseAll()
    val batch2 = Seq(
      (300L, "totally different words nothing in common here at all okay"))
      .toDF("doc_id", "text")
    assert(probe(batch2) == Seq((300L, 201L)),
      "appended batch must be part of the standing corpus")
  }

  test("delete lifecycle: tombstone masks serving, VACUUM folds exactly") {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val path = "/tmp/graft_test_index/textidx_del"
    deleteRec(new java.io.File(path))
    TextIndex.buildTextIndex(docs, "doc_id", "text", path, positions = true)
    val full = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dead = full.take(2).map(_._1) // delete the top-2 hits
    TextIndex.deleteDocs(spark, path, dead)
    // serve-time mask: dead ids gone, survivors keep PRE-delete scores
    // (corpus stats still count the deleted docs until the fold)
    val masked = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ranks 21-22 get promoted into the top-20; the surviving prefix keeps
    // its PRE-delete scores exactly
    assert(masked.length == 20 && masked.map(_._1).intersect(dead).isEmpty)
    assert(masked.take(18) == full.filterNot(t => dead.contains(t._1)),
      "mask must drop dead ids and leave surviving scores untouched")
    val pMasked = TextIndex.phraseSearchIndexed(spark, path,
        Seq("table", "hash"), n = 30)
      .collect().map(_.getLong(0))
    assert(pMasked.intersect(dead).isEmpty)
    val bMasked = TextIndex.bm25SearchIndexedBatch(spark, path,
        spark.createDataFrame(Seq(0L -> terms)).toDF("qid", "terms"), n = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(bMasked == masked, "batch path must mask identically")
    // VACUUM: compaction folds the tombstones out physically
    assert(TextIndex.compactTextIndex(spark, path))
    assert(TextIndex.resolveRoot(spark, path).contains("/versions/v"))
    val root = TextIndex.resolveRoot(spark, path)
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("id").isin(dead.map(Long.box): _*)).count() == 0,
      "folded postings must not contain deleted docs")
    // registry consumed; stats equal a first-principles recompute over the
    // SURVIVING corpus (every testdata doc has tokens, so the fold is exact)
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).isEmpty)
    val survivors = docs.filter(!$"doc_id".isin(dead.map(Long.box): _*))
    val st = spark.read.parquet(s"$root/corpusstats")
      .agg(sum($"n"), sum($"sumdl")).head()
    val expSt = survivors
      .select(size(TextAnalysis.tokens($"text")).cast("long").as("dl"))
      .agg(count(lit(1)), sum($"dl")).head()
    assert(st.getLong(0) == expSt.getLong(0) &&
      st.getLong(1) == expSt.getLong(1),
      s"VACUUM stats drifted: got $st want $expSt")
    // post-VACUUM serving == a fresh build over the survivors
    val after = TextIndex.bm25SearchIndexed(spark, path, terms, n = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == expected(survivors, 20))
  }

  test("posting writes stay ≈nBuckets files per batch, not nTasks×nBuckets") {
    val path = "/tmp/graft_test_index/textidx_fanout"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path)
    def batchFiles(table: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/$table/batch=0"))
        .count(_.getName.endsWith(".parquet"))
    }
    // range-partitioned on (tb, term): each task covers ≤2 buckets, so the
    // bound is nTasks + nBuckets; without the repartition the same write
    // can open 32×64 = 2048 files
    val bound = spark.conf.get("spark.sql.shuffle.partitions").toInt + 64
    assert(batchFiles("postings") <= bound,
      s"postings fan-out: ${batchFiles("postings")} files > $bound")
    assert(batchFiles("termstats") <= bound,
      s"termstats fan-out: ${batchFiles("termstats")} files > $bound")
  }

  test("batched BM25 plans a bounded top-k aggregation, not a rank window") {
    val path = "/tmp/graft_test_index/textidx_full"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path)
    val qdf = spark.createDataFrame(Seq(0L -> terms)).toDF("qid", "terms")
    val plan = TextIndex.bm25SearchIndexedBatch(spark, path, qdf, n = 10)
      .queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "stop-word queries must never grow a corpus-sized window partition")
  }

  test("phrase max-df guard refuses corpus-wide phrases, names the knob") {
    val corpus = (1L to 20L).map(i => (i, s"the common word$i"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_test_index/textidx_guard"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", path,
      positions = true)
    spark.conf.set("spark.graft.text.phrase.maxDfFrac", "0.5")
    try {
      // 'the' and 'common' appear in ALL docs — rarest df frac 1.0 > 0.5
      val e = intercept[IllegalArgumentException](
        TextIndex.phraseSearchIndexed(spark, path, Seq("the", "common")))
      assert(e.getMessage.contains("maxDfFrac"))
      // a selective phrase passes: rarest term 'word7' has df 1/20
      assert(TextIndex.phraseSearchIndexed(spark, path,
        Seq("common", "word7")).collect().map(_.getLong(0)).toSeq == Seq(7L))
    } finally spark.conf.unset("spark.graft.text.phrase.maxDfFrac")
    // default (knob unset = 1.0): the same stop-word phrase is allowed
    assert(TextIndex.phraseSearchIndexed(spark, path, Seq("the", "common"))
      .count() == 20L)
  }

  test("corrupt idxmeta propagates instead of silently pruning wrong buckets") {
    val path = "/tmp/graft_test_index/textidx_corrupt"
    TextIndex.buildTextIndex(docs, "doc_id", "text", path, nBuckets = 8)
    // truncate the meta to garbage: a transient/corrupt read must FAIL the
    // query, not fall back to nBuckets=64 and silently drop results
    val metaDir = new java.io.File(s"$path/idxmeta")
    metaDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val w = new java.io.FileOutputStream(f)
      w.write("not parquet".getBytes); w.close()
    }
    intercept[Exception] {
      TextIndex.bm25SearchIndexed(spark, path, terms).collect()
    }
  }

  test("dedup index delete lifecycle: mask, VACUUM, generations") {
    import graft.operators.Dedup
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val path = "/tmp/graft_test_index/dedupidx_del"
    deleteRec(new java.io.File(path))
    val mk = (i: Long, twist: String) =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta $twist run $i")
    val corpus = ((1L to 30L).map(i => mk(i, s"unique$i")) :+
      (100L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    graft.CacheScope.releaseAll()
    def probe() = Dedup.nearDupAgainstDedupIndex(spark, path, batch,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(probe() == Seq((200L, 100L)))
    // takedown of doc 100: probes must stop surfacing it immediately
    Dedup.deleteFromDedupIndex(spark, path, Seq(100L))
    assert(probe().isEmpty, "tombstoned corpus doc still probed")
    // VACUUM folds it out physically and consumes the registry
    assert(Dedup.compactDedupIndex(spark, path))
    val root = graft.index.DiskannIndex.resolveRoot(spark, path)
    assert(root.contains("/versions/v"))
    assert(spark.read.parquet(s"$root/signatures")
      .filter($"id" === 100L).count() == 0)
    assert(spark.read.parquet(s"$root/bands")
      .filter($"id" === 100L).count() == 0)
    assert(graft.index.DiskannIndex.loadTombstones(spark, path).isEmpty)
    assert(probe().isEmpty)
    // single batch + no tombstones → compaction is a no-op
    assert(!Dedup.compactDedupIndex(spark, path))
    // append post-VACUUM lands in the new generation and is probed
    Dedup.appendDedupIndex(batch, path, "doc_id", "text", batchId = 1L)
    graft.CacheScope.releaseAll()
    val batch2 = Seq(
      (300L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"))
      .toDF("doc_id", "text")
    assert(Dedup.nearDupAgainstDedupIndex(spark, path, batch2,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((300L, 200L)))
  }

  test("dedup index streaming ingest: replay-safe, probes see streamed docs") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val path = "/tmp/graft_test_index/dedupidx_stream"
    val ckpt = s"$path.ckpt"
    deleteRec(new java.io.File(path)); deleteRec(new java.io.File(ckpt))
    val corpus = (1L to 20L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta unique$i run $i"))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    graft.CacheScope.releaseAll()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Dedup.startDedupIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    mem.addData((100L,
      "alpha beta gamma delta epsilon zeta eta theta streamed run 9"))
    q.processAllAvailable(); q.stop()
    // the streamed doc is now standing corpus: its twin probes against it
    val twin = Seq((200L,
      "alpha beta gamma delta epsilon zeta eta theta streamed run 9"))
      .toDF("doc_id", "text")
    val hits = Dedup.nearDupAgainstDedupIndex(spark, path, twin,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.CacheScope.releaseAll()
    assert(hits == Seq((200L, 100L)),
      s"streamed doc not probed: $hits")
    // manual replay of the committed stream batch is a no-op
    val root = graft.index.DiskannIndex.resolveRoot(spark, path)
    val before = spark.read.parquet(s"$root/bands").count()
    Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(
      Seq((100L, "whatever")).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(s"$root/bands").count() == before,
      "replayed stream batch was double-applied")
    graft.CacheScope.releaseAll()
  }

  test("writer lease: a held lock makes append/compact fail fast") {
    val path = "/tmp/graft_test_index/textidx_lease"
    TextIndex.buildTextIndex(docs.limit(10), "doc_id", "text", path)
    val lock = new org.apache.hadoop.fs.Path(s"$path/_compact.lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(lock, true)
    out.writeUTF("someone-else"); out.close()
    try {
      val e = intercept[IllegalStateException](
        TextIndex.appendTextIndex(docs.limit(1), "doc_id", "text", path,
          batchId = 1L))
      assert(e.getMessage.contains("lockTimeoutMs"))
      intercept[IllegalStateException](
        TextIndex.compactTextIndex(spark, path))
    } finally fs.delete(lock, false)
    // released → append proceeds
    TextIndex.appendTextIndex(
      Seq((999L, "post lease append")).toDF("doc_id", "text"),
      "doc_id", "text", path, batchId = 1L)
    assert(TextIndex.nextBatchId(spark, path) == 2L)
  }

  test("empty docs count toward N and sumdl (dl = 0)") {
    val corpus = Seq((1L, "dup dup vector"), (2L, "   "), (3L, "query"),
      (4L, "")).toDF("doc_id", "text")
    val path = "/tmp/graft_test_index/textidx_empty"
    TextIndex.buildTextIndex(corpus, "doc_id", "text", path)
    val st = spark.read.parquet(s"$path/corpusstats")
      .agg(sum($"n"), sum($"sumdl")).head()
    assert(st.getLong(0) == 4L, "empty docs must count in N")
    assert(st.getLong(1) == 4L)
    val got = TextIndex.bm25SearchIndexed(spark, path, terms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected(corpus, 10))
  }
}
