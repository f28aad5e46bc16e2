package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.DiskannIndex

/**
 * Upgrade-compatibility gate (the `upgrade_test.rs:25-337` analog): the
 * frozen on-disk index at `src/test/resources/fixtures/index_gen4` was
 * written by the round-4 format generation (see
 * [[graft.tools.FreezeFixture]]) and is COMMITTED — this spec asserts every
 * future reader keeps serving it. If the layout must evolve: regenerate a
 * NEW fixture dir, keep this one, and teach the reader the upgrade (as
 * `loadMeta` already does for the pre-versioning legacy meta).
 */
class UpgradeFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "src/test/resources/fixtures/index_gen4"

  test("frozen gen-4 index: meta fields load with their written values") {
    val m = DiskannIndex.loadMeta(spark, fixture)
    assert(m.metric == "cosine" && m.storage == "sbq")
    assert(m.numNeighbors == 16 && m.searchListSize == 32)
    assert(m.numRows == 64 && m.numShards == 1 && m.hasLabels)
    assert(m.bitsPerDim == 2 && m.partitioner == "hash")
    assert(m.buildId.nonEmpty && m.buildId != "legacy")
    // round-12 field defaults on every pre-round-12 generation: 0 = unknown
    // (auto-REINDEX trigger disabled until the first full rebuild stamps it)
    assert(m.fullBuildRows == 0L)
  }

  test("frozen gen-4 index: search answers exactly against the fixture's own vectors") {
    // the oracle is self-contained: exact brute force over the fixture's
    // stored raw vectors — no embedded expected lists to go stale
    val nodes = spark.read.parquet(s"$fixture/nodes")
      .select($"row_id", $"vec").collect()
      .map(r => r.getAs[Long]("row_id") ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    assert(nodes.size == 64)
    val q = nodes(0L)
    val brute = nodes.toSeq.map { case (id, v) =>
      (id, graft.functions.VectorKernels.cosineDist(v, q))
    }.sortBy { case (id, d) => (d, id) }.take(5)
    val queries = Seq((0L, q)).toDF("qid", "qvec")
    // L >= n and rescore >= n make the tiny search exhaustive => exact
    val got = DiskannIndex.search(spark, fixture, queries, k = 5,
      searchListSize = 128, rescore = 64)
      .orderBy($"dist", $"row_id").collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Double]("dist"))).toSeq
    assert(got.map(_._1) == brute.map(_._1), s"got=$got brute=$brute")
    got.zip(brute).foreach { case ((_, gd), (_, bd)) =>
      assert(math.abs(gd - bd) < 1e-9)
    }
  }

  private val foldFixture = "src/test/resources/fixtures/index_gen10f"

  test("frozen insert-fold index (gen10f): manifest refs resolve, twins serve exactly") {
    // written by the round-10 LIVE-INSERT fold (FreezeFoldFixture): a
    // hash-partitioned generation whose folded shards preserved their old
    // node slots and whose untouched shards are "." manifest references
    val m = DiskannIndex.loadMeta(spark, foldFixture)
    assert(m.numRows == 99 && m.partitioner == "hash")
    assert(m.shardDirs.contains("") && m.shardDirs.contains("."),
      s"expected mixed manifest refs, got ${m.shardDirs.mkString(",")}")
    val root = DiskannIndex.resolveRoot(spark, foldFixture)
    val nodes = DiskannIndex.nodesDf(spark, root,
        DiskannIndex.loadMetaAt(spark, root), 0 until m.numShards)
      .select($"shard", $"node", $"row_id", $"vec").collect()
    assert(nodes.length == 99)
    // node ids stay contiguous per shard — the searcher decode contract a
    // fold must never break
    nodes.groupBy(_.getInt(0)).foreach { case (s, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until rows.length),
        s"shard $s lost node contiguity")
    }
    // each folded twin serves at distance ~0 next to its original
    val byId = nodes.map(r => r.getLong(2) ->
      r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    (0L until 3L).foreach { i =>
      val queries = Seq((0L, byId(i + 1000L))).toDF("qid", "qvec")
      val got = DiskannIndex.search(spark, foldFixture, queries, k = 2,
        searchListSize = 128, rescore = 99)
        .collect().map(_.getLong(1)).toSet
      assert(got == Set(i, i + 1000L), s"twin $i: $got")
    }
  }

  private val splitFixture = "src/test/resources/fixtures/index_gen11s"

  test("frozen hot-shard-split index (gen11s): grown arrays resolve, split shards serve exactly") {
    // written by the round-11 HOT-SHARD SPLIT (FreezeSplitFixture): an IVF
    // generation whose compaction split one overgrown shard — numShards
    // grew past the build's count, the split sub-shards carry fresh
    // centroids + re-measured radii, untouched shards ride the manifest
    val m = DiskannIndex.loadMeta(spark, splitFixture)
    assert(m.partitioner == "ivf" && m.numShards == 8 && m.numRows == 124)
    assert(m.centroids.length == m.numShards &&
      m.shardBuildIds.length == m.numShards &&
      m.shardDirs.length == m.numShards &&
      m.shardRadii.length == m.numShards,
      "per-shard arrays must have grown consistently with the split")
    assert(m.shardDirs.contains("") && m.shardDirs.exists(_ != ""),
      s"expected mixed manifest refs, got ${m.shardDirs.mkString(",")}")
    val root = DiskannIndex.resolveRoot(spark, splitFixture)
    val nodes = DiskannIndex.nodesDf(spark, root,
        DiskannIndex.loadMetaAt(spark, root), 0 until m.numShards)
      .select($"shard", $"node", $"row_id", $"vec").collect()
    assert(nodes.length == 124)
    nodes.groupBy(_.getInt(0)).foreach { case (s, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until rows.length),
        s"shard $s lost node contiguity")
    }
    // stored radii stay sound over the split sub-shards (re-measured
    // against the fresh centroids)
    val metric = graft.index.Metric(m.metric)
    nodes.foreach { r =>
      val s = r.getInt(0)
      val bv = graft.index.BuildSpace(
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray,
        m.dimsToIndex, metric)
      val d = math.sqrt(graft.functions.VectorKernels.l2sq(bv, m.centroids(s)))
      assert(d <= m.shardRadii(s) + 1e-6,
        s"shard $s member at $d outside stored radius ${m.shardRadii(s)}")
    }
    // exact serving against the frozen corpus oracle, through BOTH scan
    // shapes — top-k and radius (the radius path exercises the
    // triangle-inequality prune over the grown centroid/radii arrays)
    val corpus = spark.read.parquet(s"$splitFixture/_corpus")
      .select($"row_id", $"vec").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray)
    assert(corpus.length == 124)
    val report = DiskannIndex.reportDistFn(metric)
    val (qid, qv) = corpus.find(_._1 >= 1000L).get
    val brute = corpus.map { case (id, v) => (id, report(v, qv)) }
      .sortBy { case (id, d) => (d, id) }
    val got = DiskannIndex.search(spark, splitFixture,
        Seq((0L, qv)).toDF("qid", "qvec"), k = 10,
        searchListSize = 256, rescore = 256)
      .orderBy($"dist", $"row_id").collect().map(_.getLong(1)).toSeq
    assert(got == brute.take(10).map(_._1).toSeq, s"split serving diverged: $got")
    val twinSet = corpus.filter { case (_, v) =>
      report(v, qv) <= 1e-9 }.map(_._1).toSet
    assert(twinSet.contains(qid) && twinSet.size >= 2)
    val rhits = DiskannIndex.rangeSearch(spark, splitFixture, qv,
      radius = 1e-9).map(_._1).toSet
    assert(rhits == twinSet, s"split radius scan diverged: $rhits vs $twinSet")
  }

  private val wipeFixture = "src/test/resources/fixtures/index_gen11w"

  test("frozen shard-wipe index (gen11w): meta-decided empty shard serves and stays resumable") {
    // written by FreezeWipeFixture: the round-11-FINAL meta layout — exact
    // per-shard row counts (shardRows), one shard tombstone-WIPED to zero
    // whose generation holds no partition dir for it. Future readers must
    // keep deciding emptiness from the meta (never a filesystem probe),
    // reading the part-file-less dir through the declared node schema, and
    // serving/resuming around the hole.
    val m = DiskannIndex.loadMeta(spark, wipeFixture)
    assert(m.partitioner == "ivf",
      s"fixture shape drifted: ${m.partitioner}")
    assert(m.shardRows.length == m.numShards,
      "round-11-final meta must carry exact per-shard counts")
    val empties = m.shardRows.zipWithIndex.filter(_._1 == 0L).map(_._2)
    assert(empties.length == 1,
      s"exactly one wiped shard expected: ${m.shardRows.mkString(",")}")
    assert(m.shardRows.sum == m.numRows,
      s"count conservation broke: ${m.shardRows.mkString(",")} vs ${m.numRows}")
    assert(m.shardDirs.contains("") && m.shardDirs.exists(_ != ""),
      s"expected mixed manifest refs, got ${m.shardDirs.mkString(",")}")
    val root = DiskannIndex.resolveRoot(spark, wipeFixture)
    val nodes = DiskannIndex.nodesDf(spark, root,
        DiskannIndex.loadMetaAt(spark, root), 0 until m.numShards)
      .select($"shard", $"row_id", $"vec").collect()
    assert(nodes.length == m.numRows.toInt)
    assert(!nodes.exists(_.getInt(0) == empties(0)),
      "wiped shard must hold no rows")
    // exact serving around the hole, both scan shapes, then the resumable
    // open — the path that synthesizes the empty shard's searcher FROM THE
    // META's zero count
    val corpus = nodes.map(r => r.getLong(1) ->
      r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray)
    val report = DiskannIndex.reportDistFn(graft.index.Metric(m.metric))
    val (qid, qv) = corpus.head
    val brute = corpus.map { case (id, v) => (id, report(v, qv)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    val got = DiskannIndex.searchPoint(spark, wipeFixture, qv, 10,
      searchListSize = 256, rescore = 256).map(_._1).toSeq
    assert(got == brute, s"post-wipe frozen serving diverged: $got vs $brute")
    val rhits = DiskannIndex.rangeSearch(spark, wipeFixture, qv,
      radius = 1e-9).map(_._1).toSet
    assert(rhits == Set(qid), s"post-wipe frozen radius diverged: $rhits")
    assert(DiskannIndex.openResumableScan(spark, wipeFixture, qv, null).isDefined,
      "frozen empty shard left the resumable scan un-openable")
  }

  private val legacyFixture = "src/test/resources/fixtures/index_gen3flat"

  private val reindexFixture = "src/test/resources/fixtures/index_gen12r"

  test("frozen auto-REINDEX index (gen12r): fullBuildRows loads, retrained generation serves exactly") {
    // written by the round-12 model-staleness escalation
    // (FreezeReindexFixture): maybeCompact saw rows-since-full-build past
    // graft.reindex.staleFraction and ran the fold as force=true — the
    // installed generation is a full retrain and the meta carries the new
    // fullBuildRows field with the retrained count
    val m = DiskannIndex.loadMeta(spark, reindexFixture)
    assert(m.numRows == 112 && m.fullBuildRows == 112 && m.modelCount == 112,
      s"gen12r meta drifted: $m")
    assert(DiskannIndex.listVersions(spark, reindexFixture)
      .contains("v000000001"))
    // exact serving against the frozen corpus oracle
    val corpus = spark.read.parquet(s"$reindexFixture/_corpus")
      .select($"row_id", $"vec").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray))
    assert(corpus.length == 112)
    val report = DiskannIndex.reportDistFn(graft.index.Metric(m.metric))
    Seq(0L, 40L, 111L).foreach { qid =>
      val qv = corpus.find(_._1 == qid).get._2
      val brute = corpus.map { case (id, v) => (id, report(v, qv)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
      val got = DiskannIndex.search(spark, reindexFixture,
        Seq((qid, qv)).toDF("qid", "qvec"), k = 5,
        searchListSize = 256, rescore = 112)
        .orderBy($"dist", $"row_id").collect().map(_.getLong(1)).toSeq
      assert(got == brute, s"gen12r probe $qid: $got vs $brute")
    }
  }

  test("frozen pre-manifest (round-3 era) meta: legacy defaults fill and search serves exactly") {
    val m = DiskannIndex.loadMeta(spark, legacyFixture)
    // every field that era's writer never wrote must fill with its implied
    // default — this is the committed proof the fills stay wired
    assert(m.partitioner == "hash" && m.centroids.isEmpty)
    assert(m.buildId == "legacy" && m.shardBuildIds.forall(_ == "legacy"))
    assert(m.shardDirs.forall(_ == ""), "legacy generations are self-contained")
    assert(m.numRows == 48 && m.hasLabels && m.storage == "sbq")
    // exact serving oracle, same shape as the gen-4 test
    val nodes = spark.read.parquet(s"$legacyFixture/nodes")
      .select($"row_id", $"vec").collect()
      .map(r => r.getAs[Long]("row_id") ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    assert(nodes.size == 48)
    val q = nodes(0L)
    val brute = nodes.toSeq.map { case (id, v) =>
      (id, graft.functions.VectorKernels.cosineDist(v, q))
    }.sortBy { case (id, d) => (d, id) }.take(5)
    val queries = Seq((0L, q)).toDF("qid", "qvec")
    val got = DiskannIndex.search(spark, legacyFixture, queries, k = 5,
      searchListSize = 128, rescore = 64)
      .orderBy($"dist", $"row_id").collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Double]("dist"))).toSeq
    assert(got.map(_._1) == brute.map(_._1), s"got=$got brute=$brute")
  }

  test("pre-manifest fixture upgrades in place: compact installs a current-generation root") {
    // work on a COPY — the committed fixture must stay frozen
    val tmp = "/tmp/graft_test_index/legacy_upgrade"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(tmp))
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(legacyFixture),
      fs, new org.apache.hadoop.fs.Path(tmp), false, conf)
    // delta twin of row 0, then compact: the flat legacy root upgrades to
    // the versioned layout (params reconstructed from the filled meta)
    val v0 = spark.read.parquet(s"$tmp/nodes").filter($"row_id" === 0L)
      .select($"row_id", $"vec", $"labels").head()
    Seq((5000L, v0.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray,
      v0.getAs[scala.collection.mutable.Seq[Short]]("labels").toArray))
      .toDF("row_id", "vec", "labels")
      .write.mode("append").parquet(s"$tmp/delta")
    graft.streaming.StreamingIngest.compact(spark, tmp)
    val root = DiskannIndex.resolveRoot(spark, tmp)
    assert(root.endsWith("versions/v000000001"), root)
    val m = DiskannIndex.loadMeta(spark, tmp)
    assert(m.numRows == 49 && m.buildId != "legacy")
    // round 11: the first incremental compact BACKFILLS the exact
    // per-shard row counts a legacy meta lacks (the empty-shard fast
    // answer and the conservation invariant start holding here)
    assert(m.shardRows.length == m.numShards && m.shardRows.sum == m.numRows,
      s"legacy shardRows not backfilled: ${m.shardRows.mkString(",")}")
    val q = v0.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray
    val hits = DiskannIndex.search(spark, tmp,
      Seq((0L, q)).toDF("qid", "qvec"), k = 2,
      searchListSize = 128, rescore = 64).collect().map(_.getLong(1)).toSet
    assert(hits == Set(0L, 5000L), s"twin not served post-upgrade: $hits")
  }

  private val manifestFixture = "src/test/resources/fixtures/index_gen4m"

  test("frozen manifest-era index: cross-generation refs resolve and serve exactly") {
    // the fixture went through one incremental compaction: its installed
    // generation materializes only the rebuilt shard and references the
    // flat root for the rest — the manifest layout, frozen on disk
    val root = DiskannIndex.resolveRoot(spark, manifestFixture)
    assert(root.endsWith("versions/v000000001"))
    val m = DiskannIndex.loadMetaAt(spark, root)
    assert(m.shardDirs.contains("") && m.shardDirs.contains("."),
      s"expected mixed manifest refs, got ${m.shardDirs.mkString(",")}")
    assert(m.numRows == 100) // 96 built + 4 compacted-in delta twins
    // exact serving oracle: brute force over the manifest-RESOLVED nodes
    val nodes = DiskannIndex.nodesDf(spark, root, m, 0 until m.numShards)
      .select($"row_id", $"vec").collect()
      .map(r => r.getAs[Long]("row_id") ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    assert(nodes.size == 100)
    assert(nodes.keySet.count(_ >= 1000L) == 4, "delta twins must be served")
    val q = nodes(1000L)
    val brute = nodes.toSeq.map { case (id, v) =>
      (id, graft.functions.VectorKernels.cosineDist(v, q))
    }.sortBy { case (id, d) => (d, id) }.take(4)
    val queries = Seq((0L, q)).toDF("qid", "qvec")
    val got = DiskannIndex.search(spark, manifestFixture, queries, k = 4,
      searchListSize = 128, rescore = 128)
      .orderBy($"dist", $"row_id").collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Double]("dist"))).toSeq
    assert(got.map(_._1) == brute.map(_._1), s"got=$got brute=$brute")
  }

  test("frozen manifest-era index: empty query batch returns empty, never crashes") {
    // regression: nodesDf on a manifest-era index used to empty.reduce when
    // routing produced zero needed shards
    val empty = Seq.empty[(Long, Array[Float])].toDF("qid", "qvec")
    assert(DiskannIndex.searchDistributed(spark, manifestFixture, empty,
      k = 3, nProbe = 2).count() == 0)
    assert(DiskannIndex.search(spark, manifestFixture, empty, k = 3).count() == 0)
  }

  private val textFixture = "src/test/resources/fixtures/textidx_gen8"

  test("frozen text index: meta, batch folding, mask, and scores all serve") {
    import graft.operators.{TextAnalysis, TextIndex}
    val m = TextIndex.readMeta(spark, textFixture)
    assert(m.nBuckets == 8 && m.positions,
      "frozen build constants must load with their written values")
    // self-contained oracle: the verified one-shot scorer over the frozen
    // corpus, per-term round + BigDecimal sum (the index's summation
    // contract), doc 3's pending tombstone masked — no embedded lists
    val corpus = spark.read.parquet(s"$textFixture/_corpus")
    val terms = Seq("alpha", "beta", "gamma")
    val perTerm = terms.map { t =>
      TextAnalysis.bm25(corpus, "doc_id", "text", Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    val expect = perTerm.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter { case (id, s) => s > 0 && id != 3L }
      .map { case (id, s) => (id, s.toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = TextIndex.bm25SearchIndexed(spark, textFixture, terms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect, s"frozen index drifted: got=$got want=$expect")
    assert(got.nonEmpty && !got.exists(_._1 == 3L),
      "the frozen pending tombstone must keep masking doc 3")
    // positional postings from the frozen layout still answer phrases
    val ph = TextIndex.phraseSearchIndexed(spark, textFixture,
      Seq("alpha", "beta"), n = 24).collect().map(_.getLong(0)).toSet
    val expPh = corpus.collect().filter { r =>
      val w = r.getString(1).split(" ")
      w.sliding(2).exists(s => s.length == 2 && s(0) == "alpha" && s(1) == "beta")
    }.map(_.getLong(0)).toSet - 3L
    assert(ph == expPh)
    // both frozen batches fold at query time
    assert(spark.read.parquet(s"$textFixture/corpusstats").count() == 2)
  }

  private val dedupFixture = "src/test/resources/fixtures/dedupidx_gen8"

  test("frozen dedup index: probe equals direct recompute, tombstone masks") {
    import graft.operators.Dedup
    val corpus = spark.read.parquet(s"$dedupFixture/_corpus")
    val batch = spark.read.parquet(s"$dedupFixture/_batch")
    val got = Dedup.nearDupAgainstDedupIndex(spark, dedupFixture, batch,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // oracle: the verified direct path over the frozen text, minus the
    // frozen pending takedown (doc 101)
    val direct = Dedup.minhashNearDupAgainst(corpus, batch, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(_._2 == 101L).toSeq.sorted
    graft.CacheScope.releaseAll()
    assert(got == direct, s"frozen dedup index drifted: $got vs $direct")
    assert(got == Seq((200L, 100L)),
      "200 must still match 100; 201's twin 101 is tombstoned")
  }

  private val textFixture9 = "src/test/resources/fixtures/textidx_gen9c"

  test("frozen COMPACTED text index (gen9): versions root, folded delete, marked stream batch, pending mask") {
    import graft.operators.{TextAnalysis, TextIndex}
    // the artifact serves from an installed generation, not the flat root
    val root = TextIndex.resolveRoot(spark, textFixture9)
    assert(root.contains("/versions/v"), s"expected versioned root, got $root")
    // batch layout: folded batch 0 + the marked post-compact stream batch
    val batches = spark.read.parquet(s"$root/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet
    assert(batches == Set(0L, TextIndex.STREAM_BATCH_BASE),
      s"frozen batch layout drifted: $batches")
    val fs = new org.apache.hadoop.fs.Path(textFixture9)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$textFixture9/_stream/b${TextIndex.STREAM_BATCH_BASE}")),
      "frozen stream marker missing")
    // oracle from the frozen corpus: doc 3 folded away, doc 5 pending-masked
    val corpus = spark.read.parquet(s"$textFixture9/_corpus")
    val terms = Seq("alpha", "beta", "gamma")
    val perTerm = terms.map { t =>
      TextAnalysis.bm25(corpus.filter($"doc_id" =!= 3L), "doc_id", "text",
          Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    val expect = perTerm.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter { case (id, s) => s > 0 && id != 5L }
      .map { case (id, s) => (id, s.toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = TextIndex.bm25SearchIndexed(spark, textFixture9, terms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect, s"frozen compacted index drifted: $got vs $expect")
    // lifecycle-forward: a compaction run by TODAY's code on a COPY folds
    // the marked stream batch + pending tombstone without corruption
    val copy = "/tmp/graft_test_index/upgrade_text9"
    def copyRec(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).foreach(_.foreach(f =>
          copyRec(f, new java.io.File(dst, f.getName))))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(copy))
    copyRec(new java.io.File(textFixture9), new java.io.File(copy))
    assert(TextIndex.compactTextIndex(spark, copy))
    val root2 = TextIndex.resolveRoot(spark, copy)
    assert(spark.read.parquet(s"$root2/corpusstats")
      .select($"batch".cast("long")).collect().map(_.getLong(0)).toSet ==
      Set(0L))
    assert(graft.index.DiskannIndex.loadTombstones(spark, copy).isEmpty,
      "pending tombstone not consumed by the fold")
    // post-fold scores shift BY DESIGN: the VACUUM physically removes doc 5,
    // so N/df/sumdl shrink (un-vacuumed dead tuples count toward stats,
    // folded ones don't — the Postgres analogy holds end-to-end). Oracle
    // recomputes over the corpus minus BOTH folded docs.
    val perTerm2 = terms.map { t =>
      TextAnalysis.bm25(
          corpus.filter($"doc_id" =!= 3L && $"doc_id" =!= 5L),
          "doc_id", "text", Seq(t))
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toMap
    }
    val expect2 = perTerm2.flatMap(_.toSeq).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
      .filter(_._2 > 0)
      .map { case (id, s) => (id, s.toDouble) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got2 = TextIndex.bm25SearchIndexed(spark, copy, terms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == expect2, "post-fold serving diverged from the clean oracle")
  }

  private val dedupFixture9 = "src/test/resources/fixtures/dedupidx_gen9c"

  test("frozen COMPACTED dedup index (gen9): folded takedown, marked stream batch, pending mask") {
    import graft.operators.Dedup
    val root = graft.index.DiskannIndex.resolveRoot(spark, dedupFixture9)
    assert(root.contains("/versions/v"), s"expected versioned root, got $root")
    val corpus = spark.read.parquet(s"$dedupFixture9/_corpus")
    val batch = spark.read.parquet(s"$dedupFixture9/_batch")
    val got = Dedup.nearDupAgainstDedupIndex(spark, dedupFixture9, batch,
        "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // oracle: direct recompute over the frozen corpus, minus the FOLDED
    // takedown (101 — physically gone) and the PENDING one (7 — masked)
    val direct = Dedup.minhashNearDupAgainst(corpus, batch, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => p._2 == 101L || p._2 == 7L).toSeq.sorted
    graft.CacheScope.releaseAll()
    assert(got == direct, s"frozen dedup gen9 drifted: $got vs $direct")
    assert(got.contains((200L, 100L)) && got.contains((202L, 150L)),
      s"expected the folded-gen and stream-batch matches, got $got")
    assert(!got.exists(_._2 == 101L), "folded takedown resurrected")
  }

  private val labelFixture = "src/test/resources/fixtures/index_gen9l"

  test("frozen labelstats fixture (gen9): counts load; pre-labelstats fixtures still serve") {
    val counts = DiskannIndex.labelCounts(spark, labelFixture)
    assert(counts.contains(
      Map(0.toShort -> 16L, 1.toShort -> 16L, 2.toShort -> 16L,
        3.toShort -> 16L)), s"frozen labelstats drifted: $counts")
    // absent-case regression: the gen-4 fixture predates labelstats and
    // must keep loading as None (an optional input, never a read error)
    assert(DiskannIndex.labelCounts(spark, fixture).isEmpty)
    // and label-filtered serving over the frozen artifact still works
    val nodes = spark.read.parquet(s"$labelFixture/nodes")
      .select($"row_id", $"vec").collect()
      .map(r => r.getAs[Long]("row_id") ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    val queries = Seq((1L, nodes(1L))).toDF("qid", "qvec")
      .withColumn("qlabels",
        org.apache.spark.sql.functions.typedlit(Array(1.toShort)))
    val got = DiskannIndex.search(spark, labelFixture, queries, k = 8,
      searchListSize = 128, rescore = 64).collect().map(_.getAs[Long]("row_id"))
    assert(got.nonEmpty && got.forall(_ % 4 == 1), got.mkString(","))
  }

  test("frozen gen-4 index: label-filtered search honors the stored label sets") {
    val nodes = spark.read.parquet(s"$fixture/nodes")
      .select($"row_id", $"vec").collect()
      .map(r => r.getAs[Long]("row_id") ->
        r.getAs[scala.collection.mutable.Seq[Float]]("vec").toArray).toMap
    val q = nodes(1L)
    val queries = Seq((1L, q)).toDF("qid", "qvec")
      .withColumn("qlabels",
        org.apache.spark.sql.functions.typedlit(Array(2.toShort)))
    val got = DiskannIndex.search(spark, fixture, queries, k = 10,
      searchListSize = 128, rescore = 64).collect().map(_.getAs[Long]("row_id"))
    // fixture labels are [id % 4]: only label-2 rows may come back
    assert(got.nonEmpty && got.forall(_ % 4 == 2), got.mkString(","))
  }
}
