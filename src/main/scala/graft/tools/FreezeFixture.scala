package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{DiskannIndex, DiskannParams}

/**
 * Freezes an on-disk index fixture for the upgrade-compatibility gate (the
 * `upgrade_test.rs:25-337` analog): a tiny deterministic index written with
 * the CURRENT format generation into `src/test/resources/fixtures/`, then
 * committed to git. `UpgradeFixtureSpec` asserts every future reader keeps
 * serving it bit-exactly — if the layout must evolve, regenerate a NEW
 * fixture dir (keep the old one!) and teach the reader the upgrade, exactly
 * like the reference's multi-version test matrix.
 *
 * Determinism: vectors are pure functions of (id, dim) via integer hashing —
 * no RNG state, so a regeneration under the same format is byte-stable.
 */
object FreezeFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen4")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(64).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec",
      "array(CAST(pmod(id, 4) AS SHORT)) AS labels")
    DiskannIndex.build(src, "row_id", "vec", Some("labels"), out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    println(s"frozen: $out")
    println(DiskannIndex.loadMeta(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the TEXT-INDEX fixture (`textidx_gen8`): the stored inverted
 * index's on-disk format (md5 term buckets, per-batch postings/termstats/
 * corpusstats, idxmeta build constants, positional postings) written by the
 * round-8 generation — the regression net the ANN fixtures already provide
 * (`upgrade_test.rs:25-337` discipline) extended to the second stored
 * artifact. The deterministic corpus is frozen INSIDE the fixture as
 * `_corpus` so the spec's oracle recomputes expected scores from first
 * principles rather than embedding result lists that go stale.
 *
 * Shape choices are deliberate: non-default nBuckets=8 (a reader that
 * ignores idxmeta and assumes 64 prunes the wrong buckets and FAILS the
 * spec), two batches (query-time batch folding must keep working), one
 * PENDING tombstone (the serve-time mask must keep reading the frozen
 * registry format).
 */
object FreezeTextFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/textidx_gen8")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic text: murmur3-picked words from a fixed list — no RNG
    // state, byte-stable under regeneration within one format generation
    val corpus = spark.range(24).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(1, 5 + CAST(pmod(id, 7) AS INT)),
        |  j -> element_at(array('alpha','beta','gamma','delta','epsilon',
        |    'zeta','eta','theta','iota','kappa','lambda','mu'),
        |    CAST(pmod(hash(id, j), 12) AS INT) + 1))) AS text""".stripMargin)
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$out/_corpus")
    val frozen = spark.read.parquet(s"$out/_corpus")
    graft.operators.TextIndex.buildTextIndex(
      frozen.filter("doc_id < 16"), "doc_id", "text", out,
      nBuckets = 8, positions = true)
    graft.operators.TextIndex.appendTextIndex(
      frozen.filter("doc_id >= 16"), "doc_id", "text", out, batchId = 1L)
    // one pending tombstone: doc 3 is deleted but NOT compacted away
    graft.operators.TextIndex.deleteDocs(spark, out, Seq(3L))
    println(s"frozen: $out")
    println(graft.operators.TextIndex.readMeta(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the DEDUP-INDEX fixture (`dedupidx_gen8`): the stored LSH
 * artifact's format (per-batch bands + signatures, idxmeta constants,
 * tombstone registry) with its probe batch frozen alongside as `_batch`,
 * so the spec's oracle is the verified direct recompute
 * ([[graft.operators.Dedup.minhashNearDupAgainst]]) over the frozen text.
 * One corpus doc is tombstoned pending — future readers must keep masking
 * the frozen registry.
 */
object FreezeDedupFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/dedupidx_gen8")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mk = (i: Long, twist: String) =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta $twist run $i")
    val corpus = ((1L to 20L).map(i => mk(i, s"unique$i")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta gone run 9")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"),
      (201L, "alpha beta gamma delta epsilon zeta eta theta gone run 9"))
      .toDF("doc_id", "text")
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$out/_corpus")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$out/_batch")
    graft.operators.Dedup.buildDedupIndex(
      spark.read.parquet(s"$out/_corpus"), "doc_id", "text", out)
    // pending takedown: 101 must stop matching 201 at probe time
    graft.operators.Dedup.deleteFromDedupIndex(spark, out, Seq(101L))
    println(s"frozen: $out")
    spark.stop()
  }
}

/**
 * Freezes the PRE-MANIFEST flat-layout fixture (`index_gen3flat`): the
 * on-disk shape a round-3-era writer produced — a flat root (nodes +
 * `_meta`, no `versions/`) whose meta parquet carries ONLY the columns that
 * generation had. Generated by building with the current writer and then
 * stripping `_meta` back to the legacy column set; `loadMetaAt`'s
 * legacy-default fills (partitioner=hash, buildId="legacy", self-contained
 * shardDirs) must keep serving it, and a compaction must upgrade it in
 * place to the versioned manifest layout — the reference's
 * 0.0.2→latest upgrade matrix shape (`upgrade_test.rs:25-337`).
 */
object FreezeLegacyFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen3flat")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val src = spark.range(48).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec",
      "array(CAST(pmod(id, 3) AS SHORT)) AS labels")
    DiskannIndex.build(src, "row_id", "vec", Some("labels"), out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    // strip _meta to the round-3 column set (everything loadMetaAt fills
    // with legacy defaults must be ABSENT in this fixture)
    val legacyCols = Seq("metric", "storage", "numNeighbors",
      "searchListSize", "maxAlpha", "numShards", "numRows", "hasLabels",
      "bitsPerDim", "modelCount", "modelMean", "modelM2", "dimsToIndex")
    val legacy = spark.read.parquet(s"$out/_meta").select(legacyCols.map(col): _*)
    val schema = legacy.schema
    val rows = java.util.Arrays.asList(legacy.collect(): _*)
    graft.tools.LocalFs.deleteRec(new java.io.File(s"$out/_meta"))
    spark.createDataFrame(rows, schema)
      .coalesce(1).write.parquet(s"$out/_meta")
    println(s"frozen: $out")
    println(DiskannIndex.loadMeta(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the MANIFEST-era fixture (`index_gen4m`): an IVF index that went
 * through one incremental compaction, so its installed generation's meta
 * carries real cross-generation manifest references ("." entries into the
 * flat root, "" for the rebuilt shard). UpgradeFixtureSpec asserts future
 * readers keep resolving the manifest and serving the index exactly.
 */
object FreezeManifestFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen4m")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val src = spark.range(96).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(src, "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32,
        partitioner = "ivf", ivfSeed = Some("fx4m"), shardTargetRows = 32))
    // delta: twins (+1000 ids) of one shard's rows — frozen centroids route
    // them back to that shard, so the compact is a true partial rebuild
    val nodes0 = spark.read.parquet(s"$out/nodes")
    val sh0 = nodes0.select(col("shard")).head().getInt(0)
    nodes0.filter(col("shard") === sh0).orderBy(col("row_id")).limit(4)
      .selectExpr("row_id + 1000 AS row_id", "vec")
      .write.mode("append").parquet(s"$out/delta")
    graft.streaming.StreamingIngest.compact(spark, out)
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.shardDirs.contains("") && meta.shardDirs.contains("."),
      s"fixture must carry real manifest refs, got ${meta.shardDirs.mkString(",")}")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    println(meta.shardDirs.mkString(","))
    spark.stop()
  }
}

/**
 * Freezes the LIVE-INSERT-FOLD fixture (`index_gen10f`): a hash-partitioned
 * index whose installed generation was produced by the round-10 incremental
 * insert fold — delta rows INSERTED into their routed shards' frozen graphs
 * (old node slots preserved, appended rows on the next ids) with untouched
 * shards carried as manifest references. UpgradeFixtureSpec asserts future
 * readers keep resolving and serving this layout exactly.
 */
object FreezeFoldFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen10f")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(96).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(src, "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32,
        shardTargetRows = 16))
    // twins (+1000 ids) of rows 0-2: xxhash64 routing scatters 3 twins over
    // at most 3 of the 6 shards, so the generation carries BOTH folded ("")
    // and referenced (".") manifest entries; no tombstones ⇒ live-insert fold
    src.filter("row_id < 3")
      .selectExpr("row_id + 1000 AS row_id", "vec")
      .write.mode("append").parquet(s"$out/delta")
    graft.streaming.StreamingIngest.compact(spark, out)
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.numRows == 99, s"numRows=${meta.numRows}")
    require(meta.shardDirs.contains("") && meta.shardDirs.contains("."),
      s"fixture must carry manifest refs, got ${meta.shardDirs.mkString(",")}")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    println(meta.shardDirs.mkString(","))
    spark.stop()
  }
}

/**
 * Freezes the HOT-SHARD-SPLIT fixture (`index_gen11s`): an IVF index whose
 * compaction SPLIT an overgrown shard (round-11 layout: numShards grew past
 * the build's count, split sub-shards carry fresh centroids + re-measured
 * radii, untouched shards ride the manifest). Future readers must keep
 * resolving the grown per-shard arrays, routing/pruning over the replaced
 * centroids, and serving the split sub-shards exactly. The full corpus
 * (base + appended twins) is frozen inside as `_corpus` so the spec's
 * oracle recomputes ground truth from first principles.
 */
object FreezeSplitFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen11s")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(96).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(src, "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32,
        shardTargetRows = 16, partitioner = "ivf", ivfSeed = Some("g11s")))
    val meta0 = DiskannIndex.loadMeta(spark, out)
    // skew waves: exact twins of ONE shard's members route back to it via
    // the frozen centroids until the growth gate trips the split
    val nodes0 = spark.read.parquet(s"$out/nodes")
    val hot = nodes0.groupBy("shard").count()
      .orderBy("count", "shard").head().getInt(0)
    val hotIds = nodes0.filter(s"shard = $hot")
      .selectExpr("row_id").collect().map(_.getLong(0))
    var wave = 0
    var appended = Seq.empty[Long]
    while (DiskannIndex.loadMeta(spark, out).numShards == meta0.numShards
        && wave < 8) {
      wave += 1
      val w = wave
      src.filter(src("row_id").isin(hotIds.map(java.lang.Long.valueOf): _*))
        .selectExpr(s"row_id + ${1000L * w} AS row_id", "vec")
        .write.mode("append").parquet(s"$out/delta")
      appended = appended ++ hotIds.map(_ + 1000L * w)
      graft.streaming.StreamingIngest.compact(spark, out)
    }
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.numShards > meta0.numShards,
      s"no split after $wave waves (numShards=${meta.numShards})")
    require(meta.shardDirs.exists(_ != "") && meta.shardDirs.contains(""),
      s"fixture must carry manifest refs, got ${meta.shardDirs.mkString(",")}")
    // the corpus the spec's oracle replays: base ∪ every appended twin
    val twins = appended.map(id => (id, id - 1000L * (id / 1000L)))
    src.unionByName(
      spark.createDataFrame(twins).toDF("row_id", "base_id")
        .join(src.withColumnRenamed("row_id", "base_id"), "base_id")
        .select("row_id", "vec"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/_corpus")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    println(s"shards ${meta0.numShards} -> ${meta.numShards}, " +
      s"rows ${meta.numRows}, dirs ${meta.shardDirs.mkString(",")}")
    spark.stop()
  }
}

/**
 * Freezes the SHARD-WIPE fixture (`index_gen11w`): the round-11-FINAL meta
 * layout — exact per-shard row counts (`shardRows`) written by the
 * compaction fold, including a shard tombstone-wiped to ZERO rows whose
 * generation nodes dir holds no partition dir for it at all. Future readers
 * must keep treating the meta's zero count (never a filesystem probe) as
 * the emptiness signal: serve around the empty shard, keep the resumable
 * scan openable, and read the part-file-less dir through the declared node
 * schema. Untouched shards ride the manifest, pinning the mixed state.
 */
object FreezeWipeFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen11w")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(96).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(src, "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32,
        shardTargetRows = 16, partitioner = "ivf", ivfSeed = Some("g11w")))
    val meta0 = DiskannIndex.loadMeta(spark, out)
    require(meta0.shardRows.length == meta0.numShards,
      "build must write exact per-shard counts")
    val nodes0 = spark.read.parquet(s"$out/nodes")
    val victim = nodes0.groupBy("shard").count()
      .orderBy("count", "shard").head().getInt(0)
    val wiped = nodes0.filter(s"shard = $victim")
      .select("row_id").collect().map(_.getLong(0)).toSet
    require(wiped.nonEmpty)
    graft.streaming.StreamingIngest.compact(spark, out, tombstones = wiped)
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.shardRows(victim) == 0L &&
      meta.shardRows.sum == meta.numRows &&
      meta.numRows == 96L - wiped.size,
      s"wipe did not zero shard $victim: ${meta.shardRows.mkString(",")}")
    require(meta.shardDirs.contains("") && meta.shardDirs.exists(_ != ""),
      s"fixture must carry manifest refs, got ${meta.shardDirs.mkString(",")}")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    println(s"wiped shard $victim (${wiped.size} rows), " +
      s"shardRows ${meta.shardRows.mkString(",")}")
    spark.stop()
  }
}

/**
 * Freezes the COMPACTED text-index fixture (`textidx_gen9c`): the round-9
 * lifecycle state the gen-8 flat fixture cannot cover — a versioned
 * generation installed by [[graft.operators.TextIndex.compactTextIndex]]
 * (tombstone FOLDED, batches folded to 0), PLUS a marked streaming batch
 * appended after the fold and one tombstone left PENDING. Future readers
 * must keep resolving the versions/ root, folding the post-compact stream
 * batch at query time, masking the pending registry, and honoring the
 * _stream marker protocol (a re-compaction run today must fold the marked
 * batch and consume the pending tombstone without touching the marker's
 * replay guarantees).
 */
object FreezeTextFixtureV9 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/textidx_gen9c")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic corpus incl. the stream slice (ids 50-54) so the spec's
    // oracle recomputes expected scores from the frozen text alone
    val corpus = spark.range(29).selectExpr(
      "CASE WHEN id < 24 THEN id ELSE id + 26 END AS doc_id",
      """concat_ws(' ', transform(sequence(1, 5 + CAST(pmod(id, 7) AS INT)),
        |  j -> element_at(array('alpha','beta','gamma','delta','epsilon',
        |    'zeta','eta','theta','iota','kappa','lambda','mu'),
        |    CAST(pmod(hash(id, j), 12) AS INT) + 1))) AS text""".stripMargin)
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$out/_corpus")
    val frozen = spark.read.parquet(s"$out/_corpus")
    graft.operators.TextIndex.buildTextIndex(
      frozen.filter("doc_id < 16"), "doc_id", "text", out,
      nBuckets = 8, positions = true)
    graft.operators.TextIndex.appendTextIndex(
      frozen.filter("doc_id >= 16 AND doc_id < 24"), "doc_id", "text", out,
      batchId = 1L)
    // tombstone doc 3, then COMPACT: the frozen artifact's generation is a
    // versions/ install with the delete physically folded
    graft.operators.TextIndex.deleteDocs(spark, out, Seq(3L))
    require(graft.operators.TextIndex.compactTextIndex(spark, out))
    // post-compact: one MARKED stream batch + one PENDING tombstone
    graft.operators.TextIndex.appendBatchIdempotent("doc_id", "text", out)(
      frozen.filter("doc_id >= 50"), 0L)
    graft.operators.TextIndex.deleteDocs(spark, out, Seq(5L))
    println(s"frozen: $out -> " +
      graft.operators.TextIndex.resolveRoot(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the COMPACTED dedup-index fixture (`dedupidx_gen9c`): versioned
 * generation with the takedown folded, plus a marked post-compact stream
 * batch and a fresh pending tombstone — the same round-9 lifecycle closure
 * as [[FreezeTextFixtureV9]] for the third stored artifact.
 */
object FreezeDedupFixtureV9 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/dedupidx_gen9c")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mk = (i: Long, twist: String) =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta $twist run $i")
    val corpus = ((1L to 20L).map(i => mk(i, s"unique$i")) ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta gone run 9"),
      // stream slice appended AFTER the compaction, marked:
      (150L, "alpha beta gamma delta epsilon zeta eta theta late run 4")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, "alpha beta gamma delta epsilon zeta eta theta shared run 7"),
      (201L, "alpha beta gamma delta epsilon zeta eta theta gone run 9"),
      (202L, "alpha beta gamma delta epsilon zeta eta theta late run 4"))
      .toDF("doc_id", "text")
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$out/_corpus")
    batch.coalesce(1).write.mode("overwrite").parquet(s"$out/_batch")
    val frozen = spark.read.parquet(s"$out/_corpus")
    graft.operators.Dedup.buildDedupIndex(
      frozen.filter("doc_id <= 101"), "doc_id", "text", out)
    // takedown 101, FOLD it (the frozen artifact serves from versions/)
    graft.operators.Dedup.deleteFromDedupIndex(spark, out, Seq(101L))
    require(graft.operators.Dedup.compactDedupIndex(spark, out))
    // post-compact marked stream batch (doc 150) + pending takedown (7)
    graft.operators.Dedup.appendDedupBatchIdempotent("doc_id", "text", out)(
      frozen.filter("doc_id = 150"), 0L)
    graft.operators.Dedup.deleteFromDedupIndex(spark, out, Seq(7L))
    println(s"frozen: $out -> " +
      graft.index.DiskannIndex.resolveRoot(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the LABELSTATS-era ANN fixture (`index_gen9l`): a labeled build
 * from the generation that records per-label node counts (`labelstats`,
 * the contsel selectivity input). Future readers must keep loading the
 * counts AND keep serving indexes built before the table existed (the
 * gen-4 fixture covers the absent case).
 */
object FreezeLabelstatsFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen9l")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.range(64).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec",
      "array(CAST(pmod(id, 4) AS SHORT)) AS labels")
    DiskannIndex.build(src, "row_id", "vec", Some("labels"), out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    println(s"frozen: $out labelCounts=" +
      DiskannIndex.labelCounts(spark, out))
    spark.stop()
  }
}

/**
 * Freezes the WARC crawl-ingestion fixture (`warc_gen12`): one deterministic
 * multi-member `.warc.gz` segment — one gzip member per record, the Common
 * Crawl framing — exercising every `warcToDocuments` branch: an
 * `application/http` response (HTTP header split + HTML extraction with
 * named AND numeric character references), a raw `text/html` response (no
 * split — a blank line inside the markup must survive), a WET `conversion`
 * record (passthrough), and two records the bridge must DROP (warcinfo,
 * octet-stream). This is the corpus behind the `warc_ingest`/`warc_census`
 * DuckDB-oracle rows — the crawl entry point gets the same independent
 * correctness gate as every other operator (the reference drives every AM
 * path through real SQL `#[pg_test]`s: build.rs:1179-1418).
 *
 * Determinism: fixed record bytes, and the JDK `GZIPOutputStream` header
 * carries MTIME=0 — a regeneration is byte-stable, so the committed binary
 * is reviewable by re-running this main.
 */
object FreezeWarcFixture {
  private[tools] def rec(warcType: String, uri: String, date: String,
      contentType: String, payload: Array[Byte],
      extra: Seq[String] = Nil): Array[Byte] = {
    val h = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append(s"WARC-Date: $date\r\n")
    extra.foreach(e => h.append(s"$e\r\n"))
    h.append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
    h.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
      payload ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private[tools] def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** A FIXED 6x4 RGB PNG (117 bytes) — embedded as a constant rather than
    * ImageIO-encoded at freeze time so regeneration stays byte-stable
    * across JVM/encoder versions. Drives the `warc_media` oracle row
    * through the REAL header decode. */
  val pngBytes: Array[Byte] =
    ("89504e470d0a1a0a0000000d49484452000000060000000408020000002266d914" +
      "0000003c49444154785e0dc8410100300803b14ab9272210819cca414445206bcb" +
      "33922831c262c509a9a9661a37db5cff3265c6d8ac39ff0a1526386cb8f0007742" +
      "14d1e7da5d950000000049454e44ae426082")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  val date = "2026-03-04T05:06:07Z"

  def records: Seq[Array[Byte]] = Seq(
    rec("warcinfo", "", date, "application/warc-fields",
      ascii("software: graft-crawler\r\nformat: WARC/1.0")),
    rec("response", "http://example.org/alpha", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        "Server: httpd\r\n\r\n" +
        "<html><head><title>Graft</title>" +
        "<style>h1{font-weight:bold}</style></head><body>" +
        "<!-- header --><script>var tracker=1;</script>" +
        "<h1>Alpha &amp; beta&#8217;s&#160;report</h1>" +
        "<p>Latency: &lt;10ms &#8212; 99th percentile.</p></body></html>")),
    rec("response", "http://example.org/raw", date, "text/html",
      ascii("<html><body><p>First block.</p>\r\n\r\n" +
        "<p>Second block &#9731; end.</p></body></html>")),
    rec("conversion", "http://example.org/alpha", date, "text/plain",
      ascii("Graft Alpha report\n  pre-extracted   text.")),
    rec("response", "http://example.org/bin", date,
      "application/octet-stream",
      Array.tabulate[Byte](32)(i => (i * 7 + 1).toByte)),
    rec("response", "http://example.org/logo.png", date, "image/png",
      pngBytes))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen12"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    // self-check: parse back through the real serving path and print the
    // exact rows the DuckDB oracle must carry
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.WarcSource.warcToDocuments(
      graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath))
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "warcType", "contentType", "contentLength")
      .orderBy("offset").collect()
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    graft.operators.Multimodal.decodeMeta(
        graft.sources.WarcSource.warcToMedia(
          graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)),
        graft.operators.ImageIODecoder)
      .collect()
      .foreach(r => println(s"[media] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the round-13 WARC fixture (`warc_gen13`) — a SUPERSET of
 * `warc_gen12` (committed fixtures are immutable once specs replay them, so
 * the gen-12 segment keeps its byte-stable regeneration; this one appends)
 * adding the HTTP-ENVELOPE routing corpus, i.e. the shapes a PRODUCTION
 * Common Crawl segment is actually made of:
 *
 *  - 6: an `application/http`-enveloped PNG — all real crawl media arrives
 *    this way; `warcToMedia` must surface it with the exact image bytes
 *    (header block sliced off);
 *  - 7: an enveloped JSON response — must be DROPPED by the documents
 *    bridge (before envelope routing it became mojibake "text");
 *  - 8: enveloped HTML declared `charset=windows-1252` — the `charset=`
 *    parameter must drive the payload decode;
 *  - 9: a server that lies (`Content-Type: application/octet-stream`) about
 *    an HTML body the crawler's sniffer identified —
 *    `WARC-Identified-Payload-Type` must take precedence;
 *  - 10: enveloped `text/plain` in Shift_JIS — a java.nio charset outside
 *    Spark's built-in `decode` whitelist, through the plain-text route;
 *  - 11: a `revisit` record — the crawler's own dedup verdict, surfaced by
 *    `warcToRevisits` instead of silently dropped.
 *
 * Determinism: fixed bytes, GZIPOutputStream MTIME=0 — regeneration is
 * byte-stable, so the committed binary is reviewable by re-running this.
 */
object FreezeWarcFixture13 {
  import FreezeWarcFixture.{ascii, date, pngBytes, rec}

  /** RFC 9112 chunked framing over the given pieces (hex sizes, CRLF,
    * terminated by the last-chunk). */
  private def chunked(parts: Seq[String]): Array[Byte] =
    ascii(parts.map(p => f"${p.length}%x\r\n$p\r\n").mkString + "0\r\n\r\n")

  /** JDK-gzip of `<html><body>Gzip body works.</body></html>` — embedded
    * as a constant (like [[FreezeWarcFixture.pngBytes]]) so regeneration
    * stays byte-stable across zlib/JDK versions. */
  val gzHtmlBytes: Array[Byte] =
    ("1f8b08000000000000ffb3c928c9cdb1b349ca4fa9b473afca2c5000b114caf38b" +
      "b28bf56cf4c1c236fa6035000f49329f2a000000")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def records: Seq[Array[Byte]] = FreezeWarcFixture.records ++ Seq(
    rec("response", "http://example.org/logo2.png", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n" +
        "Server: httpd\r\n\r\n") ++ pngBytes),
    rec("response", "http://example.org/api/data", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
        "{\"alpha\": 1, \"beta\": [2, 3]}")),
    rec("response", "http://example.org/cafe", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=windows-1252\r\n\r\n" +
        "<html><body><p>Caf") ++ Array(0xE9.toByte) ++ ascii(" ") ++
        Array(0x93.toByte) ++ ascii("smart") ++ Array(0x94.toByte) ++
        ascii(" ") ++ Array(0x96.toByte) ++
        ascii(" dash</p></body></html>")),
    rec("response", "http://example.org/sniffed", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\n" +
        "Content-Type: application/octet-stream\r\n\r\n" +
        "<html><body>Sniffed as HTML.</body></html>"),
      extra = Seq("WARC-Identified-Payload-Type: text/html")),
    rec("response", "http://example.org/tokyo", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain; charset=Shift_JIS\r\n\r\n" +
        "Tokyo ") ++ "東京".getBytes("Shift_JIS") ++ ascii(" note")),
    rec("revisit", "http://example.org/alpha", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 304 Not Modified\r\n\r\n"),
      extra = Seq(
        "WARC-Refers-To-Date: 2026-01-02T03:04:05Z",
        "WARC-Payload-Digest: sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ",
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")),
    // 12: HTML5's everyday shape — the server declares no charset, the
    // document's own meta tag does; body is Windows-1252
    rec("response", "http://example.org/meta", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><head><meta charset=\"windows-1252\"></head><body>na") ++
        Array(0xEF.toByte) ++ ascii("ve r") ++ Array(0xE9.toByte) ++
        ascii("sum") ++ Array(0xE9.toByte) ++ ascii("</body></html>")),
    // 13+14: revisits of URL VARIANTS of the same page (case/default-port/
    // fragment noise, a tracking param) — they must roll up under ONE
    // canonical key in the warc_revisit_rollup composition
    rec("revisit", "HTTP://Example.ORG:80/alpha#frag", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 304 Not Modified\r\n\r\n"),
      extra = Seq(
        "WARC-Refers-To-Date: 2026-01-02T03:04:05Z",
        "WARC-Payload-Digest: sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ",
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")),
    rec("revisit", "http://example.org/alpha?utm_source=feed", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 304 Not Modified\r\n\r\n"),
      extra = Seq(
        "WARC-Refers-To-Date: 2026-02-03T04:05:06Z",
        "WARC-Payload-Digest: sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ",
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")),
    // 15: Transfer-Encoding: chunked — the wire framing heritrix/wget
    // WARCs store; the text must reassemble across chunk boundaries
    rec("response", "http://example.org/chunked", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n") ++
        chunked(Seq("<html><body>Chunk", "ed body works.</body></html>"))),
    // 16: Content-Encoding: gzip — the body inflates before extraction
    rec("response", "http://example.org/gzipped", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: gzip\r\n\r\n") ++ gzHtmlBytes),
    // 17: Content-Encoding: br — unsupported coding, must DROP (a brotli
    // body fed to the extractor would be framing noise)
    rec("response", "http://example.org/brotli", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: br\r\n\r\n") ++
        Array.tabulate[Byte](20)(i => (i * 11 + 3).toByte)),
    // 18: a server that legally omits Content-Type on an HTML page, from
    // a crawler that wrote no identified-payload-type: the html-ish
    // body-head sniff must route it to text instead of dropping it
    rec("response", "http://example.org/untyped", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nServer: httpd\r\n\r\n" +
        "<!DOCTYPE html><html><body>Untyped but HTML.</body></html>")))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen13"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    // self-check: parse back through the real serving paths and print the
    // exact rows the DuckDB literal oracles must carry
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)
    graft.sources.WarcSource.warcToDocuments(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "warcType", "contentType", "contentLength")
      .orderBy("offset").collect()
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    graft.operators.Multimodal.decodeMeta(
        graft.sources.WarcSource.warcToMedia(recs),
        graft.operators.ImageIODecoder)
      .orderBy("media_id").collect()
      .foreach(r => println(s"[media] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.warcToRevisits(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[revisit] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the round-14 WARC fixture (`warc_gen14`) — a SUPERSET of
 * `warc_gen13` (committed fixtures are immutable once specs replay them;
 * this one appends), adding the SILENT-LOSS corpus: every record here is a
 * page a production crawl carries that round-13's front door either dropped
 * without a trace or decoded wrong:
 *
 *  - 19: enveloped `application/xhtml+xml` — a visible share of real crawls;
 *    must route to the text bridge (it IS html);
 *  - 20: XHTML served as `text/xml` (XML prolog + html doctype) — routes via
 *    the body-head sniff;
 *  - 21: an UNTYPED response whose body leads with an XML prolog then
 *    `<html` — the untyped sniff must know the XML-prolog shape;
 *  - 22: `Content-Encoding: zstd` — decodable for free via the zstd-jni on
 *    Spark's classpath, previously null-dropped;
 *  - 23: UTF-16LE page with BOM, server silent on charset — the BOM must
 *    drive the decode (a UTF-16 page can never match an ISO-8859-1-decoded
 *    meta-charset regex);
 *  - 24/25: `resource` records (wget/heritrix direct captures — payload
 *    raw, no HTTP envelope): one text/html into the documents bridge, one
 *    image/png into the media bridge;
 *  - 26: a MALFORMED envelope (header block, no blank line) — must surface
 *    in the disposition census as `malformed_envelope`;
 *  - 27: an all-digits `text/plain` page — lands in `warcToDocuments` but
 *    pins `below_quality` in the census at the ingest gate's threshold;
 *  - 28: a real `text/xml` FEED (rss root) — the sniff-negative: generic
 *    XML that is NOT html must stay out of the text path.
 *
 * Determinism: fixed bytes (the zstd member is an embedded constant, like
 * the PNG), GZIPOutputStream MTIME=0 — regeneration is byte-stable.
 */
object FreezeWarcFixture14 {
  import FreezeWarcFixture.{ascii, date, pngBytes, rec}

  /** zstd frame of `<html><body>Zstandard coding decodes fine.</body></html>`
    * — embedded as a constant so regeneration never depends on the zstd
    * library version's compression choices. */
  val zstdHtmlBytes: Array[Byte] =
    ("28b52ffd2038c101003c68746d6c3e3c626f64793e5a7374616e6461726420636f" +
      "64696e67206465636f6465732066696e652e3c2f626f64793e3c2f68746d6c3e")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def records: Seq[Array[Byte]] = FreezeWarcFixture13.records ++ Seq(
    // 19: enveloped XHTML under its own media type
    rec("response", "http://example.org/xhtml", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\n" +
        "Content-Type: application/xhtml+xml; charset=utf-8\r\n\r\n" +
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Strict//EN\" " +
        "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd\">\n" +
        "<html xmlns=\"http://www.w3.org/1999/xhtml\"><body>" +
        "<p>XHTML page&#160;works.</p></body></html>")),
    // 20: XHTML a misconfigured server labels text/xml — body-head sniff
    rec("response", "http://example.org/asxml", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/xml\r\n\r\n" +
        "<?xml version=\"1.0\"?><!DOCTYPE html><html><body>" +
        "<p>Served as XML.</p></body></html>")),
    // 21: no Content-Type at all, body leads with an XML prolog
    rec("response", "http://example.org/untyped-xml", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nServer: httpd\r\n\r\n" +
        "<?xml version=\"1.0\" encoding=\"utf-8\"?>" +
        "<html><body>Untyped XHTML.</body></html>")),
    // 22: Content-Encoding: zstd — decodes via the classpath zstd-jni
    rec("response", "http://example.org/zstd", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: zstd\r\n\r\n") ++ zstdHtmlBytes),
    // 23: UTF-16LE with BOM, no declared charset anywhere
    rec("response", "http://example.org/utf16", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n") ++
        Array(0xFF.toByte, 0xFE.toByte) ++
        "<html><body>UTF-16 déjà vu.</body></html>".getBytes(
          java.nio.charset.StandardCharsets.UTF_16LE)),
    // 24/25: wget/heritrix resource captures — raw payload, no envelope
    rec("resource", "http://example.org/local.html", date, "text/html",
      ascii("<html><body>Resource capture.</body></html>")),
    rec("resource", "http://example.org/local.png", date, "image/png",
      pngBytes),
    // 26: envelope with no header/body split in the record at all
    rec("response", "http://example.org/broken", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")),
    // 27: extractable but junk — the quality gate's census row
    rec("response", "http://example.org/numbers", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
        "12345 67890 12345 67890 12345")),
    // 28: genuine XML that is NOT html — must NOT leak into documents
    rec("response", "http://example.org/feed", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/xml\r\n\r\n" +
        "<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>" +
        "<title>Feed</title></channel></rss>")),
    // 29: XHTML declaring its charset ONLY in the XML prolog (no header
    // param, no meta) — the prolog encoding= must drive the decode
    rec("response", "http://example.org/prolog", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\n" +
        "Content-Type: application/xhtml+xml\r\n\r\n" +
        "<?xml version=\"1.0\" encoding=\"windows-1252\"?>\n" +
        "<!DOCTYPE html><html><body><p>Prologue caf") ++
        Array(0xE9.toByte) ++
        ascii(" declares its own encoding.</p></body></html>")),
    // 30: XHTML served as text/xml whose charset lives in a META tag —
    // the meta arm must fire for xml-routed types too, not just text/html
    rec("response", "http://example.org/metaxml", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/xml\r\n\r\n" +
        "<!DOCTYPE html><html><head>" +
        "<meta charset=\"windows-1252\"></head><body>M") ++
        Array(0xE9.toByte) ++
        ascii("ta charset inside an XML document.</body></html>")),
    // 31: a 404 whose HTML body is an ERROR PAGE — not corpus text (and a
    // mass near-dup generator: every Not Found page of a server is
    // identical); the status gate must drop it
    rec("response", "http://example.org/missing", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body>Not found on this server.</body></html>")),
    // 32: a 301 redirect stub body — same reasoning
    rec("response", "http://example.org/moved", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 301 Moved Permanently\r\n" +
        "Location: http://example.org/alpha\r\n" +
        "Content-Type: text/html\r\n\r\n" +
        "<html><body>Moved <a href=\"/alpha\">here</a>.</body></html>")),
    // 33: a 200 HTML page whose extraction yields NOTHING (markup +
    // comment only) — pins the census's empty_text disposition
    rec("response", "http://example.org/empty", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body><!-- nothing to extract --></body></html>")),
    // 34: an UNTYPED response whose body leads with a UTF-8 BOM then
    // <html> — the sniff must see through the BOM (which reads as ï»¿
    // under the ISO-8859-1 byte view) instead of dropping the page
    rec("response", "http://example.org/bom-untyped", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nServer: httpd\r\n\r\n") ++
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        ascii("<html><body>BOM sniffed fine.</body></html>")))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen14"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    // self-check: parse back through the real serving paths and print the
    // exact rows the DuckDB literal oracles must carry
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)
    graft.sources.WarcSource.warcToDocuments(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "warcType", "contentType", "contentLength")
      .orderBy("offset").collect()
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    graft.operators.Multimodal.decodeMeta(
        graft.sources.WarcSource.warcToMedia(recs),
        graft.operators.ImageIODecoder)
      .orderBy("media_id").collect()
      .foreach(r => println(s"[media] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.warcToRevisits(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[revisit] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.warcToDispositions(recs, minQuality = 0.35)
      .orderBy("offset").collect()
      .foreach(r => println(s"[disp] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the round-15 WARC fixture (`warc_gen15`) — a SUPERSET of
 * `warc_gen14` (committed fixtures are immutable once specs replay them;
 * this one appends):
 *
 *  - 35: a `WARC-Truncated: length` capture — the crawler's size cap cut
 *    the page mid-sentence (Common Crawl historically caps at 1 MiB, so
 *    real segments carry these at a visible rate). The page must still
 *    LAND (a fragment is data), but with `truncated='length'` on the
 *    documents row and the census flag set — invisible truncation was
 *    round-14's verdict item #2.
 *
 * Determinism: fixed bytes, GZIPOutputStream MTIME=0 — regeneration is
 * byte-stable.
 */
object FreezeWarcFixture15 {
  import FreezeWarcFixture.{ascii, date, rec}

  def records: Seq[Array[Byte]] = FreezeWarcFixture14.records ++ Seq(
    // 35: the crawler hit its length cap — partial capture, text ends
    // mid-sentence; WARC-Truncated says so and the bridge must surface it
    rec("response", "http://example.org/cutoff", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body><p>Length cap hit: this capture stops mid-sent"),
      extra = Seq("WARC-Truncated: length")))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen15"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    // self-check: parse back through the real serving paths and print the
    // exact rows the DuckDB literal oracles must carry
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)
    graft.sources.WarcSource.warcToDocuments(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "warcType", "contentType", "contentLength")
      .orderBy("offset").collect()
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.warcToDispositions(recs, minQuality = 0.35)
      .orderBy("offset").collect()
      .foreach(r => println(s"[disp] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the round-15 Brotli fixture (`warc_gen16`) — a SUPERSET of
 * `warc_gen15` (committed fixtures are immutable once specs replay them;
 * this one appends):
 *
 *  - 36: `Content-Encoding: br` with a VALID Brotli body — decoded by the
 *    pure-Scala [[graft.functions.BrotliKernel]] (RFC 7932) instead of
 *    null-dropped. Record 17 (gen-13's junk-bytes br record) stays in the
 *    corpus as the NEGATIVE pin: malformed br still drops as
 *    `unsupported_coding`, so the census now separates "br we can't
 *    decode" (none, ideally) from "br that is garbage".
 *
 * Determinism: the br member is an embedded constant (like the PNG/zstd
 * ones) so regeneration never depends on an encoder's choices;
 * GZIPOutputStream MTIME=0 — regeneration is byte-stable.
 */
object FreezeWarcFixture16 {
  import FreezeWarcFixture.{ascii, date, rec}

  /** Brotli frame of `<html><body>Brotli coding decodes natively.</body>
    * </html>` (libbrotli q11) — embedded as a constant. */
  val brHtmlBytes: Array[Byte] =
    ("1b3800e09d09364ea877377c844a6fa131323909c24657656fed92c6960736e0" +
      "c0a580329bf07875aa05c3f13d832dcb4f1e5c1a801fa74106")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def records: Seq[Array[Byte]] = FreezeWarcFixture15.records ++ Seq(
    // 36: a real br-coded page — the largest remaining front-door loss
    // bucket on real crawls, now decoded
    rec("response", "http://example.org/br-page", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: br\r\n\r\n") ++ brHtmlBytes))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen16"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)
    graft.sources.WarcSource.warcToDocuments(recs)
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "warcType", "contentType", "contentLength")
      .orderBy("offset").collect()
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.warcToDispositions(recs, minQuality = 0.35)
      .orderBy("offset").collect()
      .foreach(r => println(s"[disp] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the round-15 main-content fixture (`warc_gen17`) — a SUPERSET of
 * `warc_gen16` (committed fixtures are immutable once specs replay them;
 * this one appends):
 *
 *  - 37: a page wrapped in the chrome every real site has — nav bar,
 *    cookie-consent banner (`class="cookie-banner"`), link-farm footer —
 *    around two paragraphs of actual prose. `html_to_text` keeps all of
 *    it (by design: deterministic full extraction); the opt-in
 *    `main_text` ([[graft.functions.MainTextKernel]]) must keep ONLY the
 *    prose. The `warc_main_text` oracle pins both columns side by side.
 *
 * Determinism: fixed bytes, GZIPOutputStream MTIME=0.
 */
object FreezeWarcFixture17 {
  import FreezeWarcFixture.{ascii, date, rec}

  val boilerplateHtml: String =
    "<html><head><title>Main content demo</title></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact</a></nav>" +
      "<div class=\"cookie-banner\">This website uses cookies to improve " +
      "your browsing experience. <a href=\"/accept\">Accept</a> " +
      "<a href=\"/decline\">Decline</a></div>" +
      "<article><p>Graft extracts the main article content from crawled " +
      "pages by scoring text blocks on length and link density, following " +
      "the public jusText and Boilerpipe family of algorithms.</p>" +
      "<p>Short navigation rows and link farms drop out; long running " +
      "prose stays in the corpus.</p></article>" +
      "<footer><a href=\"/privacy\">Privacy</a> | " +
      "<a href=\"/terms\">Terms</a> | © 2026 Example</footer>" +
      "</body></html>"

  def records: Seq[Array[Byte]] = FreezeWarcFixture16.records ++ Seq(
    rec("response", "http://example.org/chrome", date,
      "application/http; msgtype=response",
      ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        boilerplateHtml)))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.headOption.getOrElse(
      "src/test/resources/fixtures/warc_gen17"))
    dir.mkdirs()
    val seg = new java.io.File(dir, "seg-00000.warc.gz")
    val out = new java.io.FileOutputStream(seg)
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.close()
    println(s"frozen: $seg (${seg.length()} bytes, ${records.length} members)")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath)
    graft.sources.WarcSource.warcToDocuments(recs, withMainText = true)
      .filter(org.apache.spark.sql.functions.col("offset") >= 35)
      .orderBy("offset").collect()
      .foreach(r => println(s"[doc] ${r.toSeq.mkString(" | ")}"))
    graft.sources.WarcSource.readWarc(spark, seg.getAbsolutePath,
        keepPayload = false)
      .selectExpr("offset", "contentLength")
      .orderBy("offset").collect().takeRight(2)
      .foreach(r => println(s"[census] ${r.toSeq.mkString(" | ")}"))
    spark.stop()
  }
}

/**
 * Freezes the AUTO-REINDEX-era fixture (`index_gen12r`): a generation
 * installed by the round-12 model-staleness escalation — `maybeCompact`
 * detected rows-since-full-build past `graft.reindex.staleFraction` and ran
 * the fold as force=true, retraining the SBQ quantizer and stamping the new
 * `fullBuildRows` meta field. Future readers must keep loading the field
 * (and defaulting it to 0=unknown on every OLDER fixture — the gen-4 path
 * proves that side) and keep serving the retrained generation exactly.
 * The corpus is frozen inside as `_corpus` for the spec's oracle.
 */
object FreezeReindexFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/index_gen12r")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vecs(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr(
      "id AS row_id",
      "transform(sequence(1, 8), d -> CAST(pmod(hash(id, d), 997) / 997.0 AS FLOAT)) AS vec")
    DiskannIndex.build(vecs(0, 32), "row_id", "vec", None, out,
      DiskannParams(metric = "cosine", numNeighbors = 16, searchListSize = 32))
    // 80 appended rows: (112-32)/32 = 2.5 >= 2.0 default -> auto-REINDEX
    vecs(32, 112).write.mode("append").parquet(s"$out/delta")
    require(graft.streaming.StreamingIngest.maybeCompact(spark, out,
      maxDeltaRows = 1))
    val meta = DiskannIndex.loadMeta(spark, out)
    require(meta.numRows == 112 && meta.fullBuildRows == 112 &&
      meta.modelCount == 112, s"escalation did not retrain: $meta")
    vecs(0, 112).write.mode("overwrite").parquet(s"$out/_corpus")
    println(s"frozen: $out -> ${DiskannIndex.resolveRoot(spark, out)}")
    spark.stop()
  }
}
