package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.WarcSource

/**
 * Streaming crawl bridge: WARC segments → documents table + dedup state,
 * exactly-once — the front door of the 100 TB pretraining pipeline wired
 * into the same micro-batch machinery that feeds the stored indexes.
 *
 * Shape: Structured Streaming's file source does the DISCOVERY (new
 * `.warc.gz` segments under a glob, checkpointed, `maxFilesPerTrigger`
 * bounds a batch), but carries only the file PATHS — each micro-batch then
 * re-reads its segments through [[WarcSource.readWarc]]'s streaming parser,
 * so payload bytes flow task-side exactly as in the batch path and the
 * per-batch driver state is a bounded list of segment names. Per batch:
 *
 *   paths → warcToDocuments → quality gate (qualityScore >= minQuality)
 *         → near-dup probe against the stored dedup index (drop hits)
 *         → in-batch near-dup collapse (keep smallest doc_id)
 *         → append survivors to the documents table (replace-by-batch)
 *         → append survivors' signatures to the dedup index
 *
 * Exactly-once under foreachBatch's at-least-once contract, per store:
 *
 *  - `doc_id` is a deterministic provenance hash (segment basename,
 *    record ordinal), so a replay regenerates identical ids.
 *  - the documents append is replace-by-batch: data files carry a
 *    `crawl_b<batchId>_` prefix, a retry deletes the torn prefix before
 *    rewriting, and a marker (`_stream/b<id>`, the
 *    [[graft.operators.TextIndex.appendBatchIdempotent]] discipline)
 *    commits AFTER the rename — marked batches are skipped wholesale.
 *  - the dedup append reuses [[Dedup.appendDedupBatchIdempotent]] verbatim
 *    (its own marker under the index path, lease-serialized).
 *  - the probe excludes this batch's own PHYSICAL dedup batch id
 *    (`excludeBatch`): a replay whose previous attempt already appended
 *    signatures (torn, unmarked — folds skip unmarked batches, so the id
 *    is stable) must not match its own rows and drop the documents it is
 *    re-landing.
 *  - the optional revisit LEDGER (`revisitsPath`) lands the crawler's own
 *    dedup verdicts ([[graft.sources.WarcSource.warcToRevisits]]) with the
 *    same replace-by-batch + marker discipline (`revisits_b<id>_` prefix),
 *    header-only re-read — joinable with the URL-dedup family at serve
 *    time;
 *  - ORDER: documents first, dedup marker last. The dedup index only
 *    becomes foldable once its marker lands, and the marker lands after
 *    the documents batch committed — so no compaction can fold this
 *    batch's signatures into the anonymous corpus while any part of the
 *    batch might still replay.
 *
 * 100 TB cost shape: discovery is one checkpointed listing per trigger;
 * per segment the work is one streaming parse (O(record) memory) + the
 * extraction/quality Columns (codegen'd, no shuffle) + the dedup probe
 * (banded bucket join against the stored index — the batch side is
 * broadcast, the corpus side stays partitioned) + two bounded appends.
 * Nothing scans the corpus; cost per micro-batch is O(batch) with the
 * probe's bucket-join fan-in, independent of how many segments have ever
 * been ingested.
 */
object CrawlIngest {

  /** Deterministic provenance id: hash of (segment basename, record
    * ordinal). Stable across replays AND across checkout locations (the
    * absolute path is not hashed) — which also makes segment BASENAME
    * uniqueness part of the corpus contract (Common Crawl's names carry
    * the full crawl/segment coordinates, so they are; two directories both
    * holding a `seg0.warc.gz` would collide ids). */
  def withDocIds(docs: DataFrame): DataFrame = docs
    .withColumn("file", regexp_extract(col("file"), "([^/]+)$", 1))
    .withColumn("doc_id", xxhash64(col("file"), col("offset")))

  /** STUB text embedding — deterministic hash features, NOT semantic: the
    * container ships no encoder, so this stands in for the
    * `mapInPandas`-hosted model call a real deployment swaps in (same
    * column type, same normalization contract as the `embeddings` table).
    * Everything downstream — the delta append, freshness-honoring search,
    * compaction folds — is the real production path. */
  def stubTextEmbedding(text: Column, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(text, i), lit(997L)) / 997.0 - 0.5).cast("float"))

  /** The ANN leg's encoder CONTRACT: a function from the fresh-survivors
    * frame (`doc_id`, `url`, `fetch_date`, `text`, `file`, `offset`) to
    * `(row_id LONG, vec ARRAY<FLOAT>)` — one row per input document,
    * `row_id = doc_id` (provenance-stable, so replays regenerate identical
    * rows and the delta fold dedups them), `vec` at the stored index's
    * dimension/normalization. A real deployment passes its model call
    * (typically `mapInPandas` hosting the encoder); this default is the
    * documented [[stubTextEmbedding]] hash-feature stand-in. */
  def defaultEncoder(embedDim: Int = 64): DataFrame => DataFrame =
    docs => docs.select(col("doc_id").as("row_id"),
      stubTextEmbedding(col("text"), embedDim).as("vec"))

  /** Doc-id collision detector: provenance ids are 64-bit hashes, so at
    * ~25 B documents (100 TB at ~4 KB/doc) the birthday bound expects a
    * handful of collisions corpus-wide — and a collision SILENTLY merges
    * two unrelated documents in the dedup index (one real document dropped
    * as a "duplicate"). This surfaces them: doc_ids carrying more than one
    * distinct (file, offset) provenance. One hash-aggregation, O(input),
    * ordinary shuffle — run it in-batch (ingestSegments does, loud) and at
    * fold/audit time over the corpus ([[auditDocIdCollisions]]).
    *
    * Scope: `file` here is the segment BASENAME (what the id hashes), so
    * this detects TRUE 64-bit hash collisions. The other collision mode —
    * two different paths sharing a basename, which would produce identical
    * (file, offset) provenance — is excluded by contract, enforced exactly
    * at ingest time (the duplicate-basename check in [[ingestSegments]]). */
  def docIdCollisions(docs: DataFrame): DataFrame =
    docs.groupBy(col("doc_id"))
      .agg(countDistinct(struct(col("file"), col("offset")))
        .as("n_provenances"))
      .filter(col("n_provenances") > 1)

  /** Corpus-wide twin of [[docIdCollisions]] over the stored documents
    * table — the fold-time/offline audit (projection-pruned scan of three
    * columns, one shuffle; not per-batch, where the corpus-sized join
    * would dominate the batch cost). */
  def auditDocIdCollisions(spark: SparkSession,
      documentsPath: String): DataFrame =
    docIdCollisions(
      spark.read.parquet(documentsPath).select("doc_id", "file", "offset"))

  /** The production cadence for [[auditDocIdCollisions]]: every
    * `everyBatches`-th batch (aligned so batch `everyBatches - 1` is the
    * first — batch 0 has an empty-or-tiny corpus), sweep the corpus and
    * fail LOUD on any collision, exactly like the in-batch guard. Wired
    * into [[startCrawlIngest]]'s autoCompact maintenance, so the offline
    * audit actually runs in production instead of existing as an API. */
  def maybeAuditCollisions(spark: SparkSession, documentsPath: String,
      streamBatchId: Long, everyBatches: Int): Unit =
    if (everyBatches > 0 && (streamBatchId + 1) % everyBatches == 0) {
      val hits = auditDocIdCollisions(spark, documentsPath).limit(3).collect()
      if (hits.nonEmpty) sys.error(
        s"crawl ingest corpus audit (batch $streamBatchId): doc_id " +
          s"collision(s) in the stored documents table — " +
          hits.map(_.getLong(0)).mkString(", ") +
          " — a true 64-bit hash collision; widen the id scheme")
    }

  /** Per-batch ingest accounting — what [[ingestSegments]] returns, and
    * what its named Spark accumulators (`graft.crawl.*`, visible in the
    * UI/metrics sinks) accumulate across a stream's lifetime. A 100 TB
    * operator reads these to tell "this crawl is 40% near-dup" from "my
    * quality gate is eating everything". The WARC-level drop reasons
    * (unsupported coding, non-text types, malformed envelopes) live in
    * [[graft.sources.WarcSource.warcToDispositions]] — this covers the
    * stages AFTER extraction, which need ingest state the census can't see.
    * Accounting is AT-LEAST-ONCE, matching foreachBatch: a torn replay
    * re-counts its batch (the stores stay exactly-once; the counters are
    * operational telemetry, not a ledger).
    *
    * `droppedCorpusDup` and `droppedInBatchDup` are PER-CAUSE tallies and
    * may OVERLAP: a document can both near-dup the stored corpus and be
    * the larger member of an in-batch pair, so their sum can exceed the
    * number of distinct dropped documents. `docsLanded` is the exact
    * count of the landed frame (gated minus the UNION of the dup sets) —
    * `docsExtracted - droppedQuality - docsLanded` is the true distinct
    * dup-drop count. */
  case class IngestStats(docsExtracted: Long, droppedQuality: Long,
      droppedCorpusDup: Long, droppedInBatchDup: Long, docsLanded: Long,
      revisitsLanded: Long, skippedAsCommitted: Boolean = false)

  private val counterNames = Seq("docs_extracted", "dropped_quality",
    "dropped_corpus_dup", "dropped_inbatch_dup", "docs_landed",
    "revisits_landed")
  // single-slot cache, not a map keyed by context: a JVM that restarts
  // its SparkContext (test harnesses, driver recovery) must not pin every
  // stopped context + its accumulators for the process lifetime
  private var counterSlot: Option[(org.apache.spark.SparkContext,
    Map[String, org.apache.spark.util.LongAccumulator])] = None

  /** The stream-lifetime ingest counters, registered once per context
    * (named accumulators — they surface in the Spark UI and any metrics
    * sink that reads accumulators). */
  def ingestCounters(spark: SparkSession):
      Map[String, org.apache.spark.util.LongAccumulator] = synchronized {
    val sc = spark.sparkContext
    counterSlot match {
      case Some((c, m)) if c eq sc => m
      case _ =>
        val m = counterNames
          .map(n => n -> sc.longAccumulator(s"graft.crawl.$n")).toMap
        counterSlot = Some((sc, m))
        m
    }
  }

  /**
   * The foreachBatch kernel, callable directly for tests/backfills: ingest
   * `segmentPaths` as micro-batch `streamBatchId`. Idempotent — a replay
   * of a fully-committed batch is a no-op; a replay of a torn batch
   * completes it without duplicates.
   */
  def ingestSegments(spark: SparkSession, segmentPaths: Seq[String],
      documentsPath: String, dedupIndexPath: String, streamBatchId: Long,
      minQuality: Double = 0.35, dedupThreshold: Double = 0.8,
      textIndexPath: Option[String] = None,
      annIndexPath: Option[String] = None, embedDim: Int = 64,
      encoder: Option[DataFrame => DataFrame] = None,
      revisitsPath: Option[String] = None,
      // opt-in boilerplate-reduced `main_text` column on the documents
      // store (see WarcSource.warcToDocuments) — one extra kernel pass
      // per HTML document, same single segment read
      mainText: Boolean = false,
      // opt-in PERSISTENT drop census: per batch, one row per disposition
      // (reason, n, n_truncated, batch_id) landed with the same marker
      // discipline — the TVF census turned into an operator dashboard
      // that accumulates across the stream's life. Rides the same single
      // segment parse (drop rows flow through the pinned frame as
      // metadata-only rows); the rollup is one tiny aggregation per batch
      dispositionsPath: Option[String] = None): IngestStats = {
    if (segmentPaths.isEmpty) return IngestStats(0, 0, 0, 0, 0, 0)
    // the paths are joined into one binaryFiles spec below, where ',' is a
    // separator and '{[*?' are glob metacharacters — a path containing one
    // would silently read the WRONG file set; fail loud instead
    segmentPaths.foreach(p => require(!p.exists(",{[*?".contains(_)),
      s"crawl ingest: segment path contains a comma/glob metacharacter " +
        s"and would be misread by the path spec: $p"))
    // doc ids hash the segment BASENAME (checkout-relocatable — see
    // withDocIds), which makes basename uniqueness part of the corpus
    // contract: two different paths sharing a basename would collide every
    // doc_id with IDENTICAL (file, offset) provenance — invisible to the
    // hash-collision guard below. Enforce the contract exactly,
    // driver-side, on the bounded path list (this also rejects the same
    // path listed twice, which would double-ingest the segment).
    val dupBases = segmentPaths
      .map(p => p.substring(p.lastIndexOf('/') + 1))
      .groupBy(identity).collect { case (b, ps) if ps.size > 1 => b }
    require(dupBases.isEmpty,
      s"crawl ingest: duplicate segment basename(s) in one batch — doc ids " +
        s"hash the basename, so these would silently collide: " +
        dupBases.mkString(", "))
    val conf = spark.sessionState.newHadoopConf()
    val docsMarker = new org.apache.hadoop.fs.Path(
      s"$documentsPath/_stream/b$streamBatchId")
    val docsFs = docsMarker.getFileSystem(conf)
    val dedupMarker = new org.apache.hadoop.fs.Path(
      s"$dedupIndexPath/_stream/b${Dedup.STREAM_BATCH_BASE + streamBatchId}")
    val dedupFs = dedupMarker.getFileSystem(conf)
    val textDone = textIndexPath.forall { tp =>
      val m = new org.apache.hadoop.fs.Path(
        s"$tp/_stream/b${graft.operators.TextIndex.STREAM_BATCH_BASE + streamBatchId}")
      m.getFileSystem(conf).exists(m)
    }
    val revDone = revisitsPath.forall { rp =>
      val m = new org.apache.hadoop.fs.Path(s"$rp/_stream/b$streamBatchId")
      m.getFileSystem(conf).exists(m)
    }
    val dispDone = dispositionsPath.forall { dp =>
      val m = new org.apache.hadoop.fs.Path(s"$dp/_stream/b$streamBatchId")
      m.getFileSystem(conf).exists(m)
    }
    if (docsFs.exists(docsMarker) && dedupFs.exists(dedupMarker) &&
        textDone && revDone && dispDone)
      return IngestStats(0, 0, 0, 0, 0, 0, skippedAsCommitted = true)

    val pathSpec = segmentPaths.sorted.mkString(",")
    // pin the parsed batch ONCE, quality score included: four consumers
    // follow (corpus probe, in-batch pairs, documents write,
    // signature/vector appends), and without the checkpoint each would
    // re-run the gunzip+parse+extract+quality subtree — 3-4x the
    // per-segment I/O and CPU. Keeping the pre-gate rows in the pin (and
    // gating by the stored score below) costs only the dropped rows'
    // bytes and buys the quality-drop counter without a second parse.
    // When the revisit ledger is on, its rows ride the SAME parse
    // (warcToDocumentsAndRevisits): the leg used to pay a second full
    // gunzip of every segment per batch — 2x front-door decompression at
    // scale for a handful of header rows.
    val wantRev = revisitsPath.isDefined && !revDone
    val wantDisp = dispositionsPath.isDefined && !dispDone
    val pinned = {
      val raw = WarcSource.readWarc(spark, pathSpec)
      // the census needs the DROPPED records too — the fused bridge keeps
      // them as metadata-only 'drop' rows in the same single parse
      val bridged =
        if (wantRev || wantDisp) WarcSource.warcToDocumentsAndRevisits(raw,
          mainText, withDispositions = wantDisp)
        else WarcSource.warcToDocuments(raw, mainText)
          .withColumn("kind", lit("doc"))
      withDocIds(bridged)
        .withColumn("__q", when(col("kind") === "doc",
          TextAnalysis.qualityScoreFast(col("text"))))
        .localCheckpoint()
    }
    val parsed = pinned.filter(col("kind") === "doc")
    // same column order the store has always had (url..offset, doc_id);
    // main_text lands after text when the opt-in is on
    val storeCols =
      if (mainText) Seq("url", "fetch_date", "text", "main_text", "file",
        "offset", "doc_id")
      else Seq("url", "fetch_date", "text", "file", "offset", "doc_id")
    val gated = parsed.filter(col("__q") >= minQuality)
      .select(storeCols.head, storeCols.tail: _*)
    // one bounded aggregation over the pinned rows: extraction + gate counts
    val qrow = parsed.agg(count(lit(1)),
      count(when(col("__q") >= minQuality, 1))).head()
    val nExtracted = qrow.getLong(0)
    val nGated = qrow.getLong(1)
    // in-batch doc-id collision guard: a 64-bit provenance-hash collision
    // would silently merge two documents in the dedup index — fail the
    // batch loudly instead (O(batch) aggregation over the pinned frame;
    // the corpus-wide sweep is auditDocIdCollisions, run at audit time)
    val collided = docIdCollisions(gated).limit(3).collect()
    if (collided.nonEmpty) sys.error(
      s"crawl ingest batch $streamBatchId: doc_id collision(s) — distinct " +
        s"(file, offset) provenances hashing to one id: " +
        collided.map(_.getLong(0)).mkString(", ") +
        " — a true 64-bit hash collision; widen the id scheme")
    // near-dups against the CORPUS state (minus this batch's own physical
    // contribution — replay stability, see the class doc). Pinned: TWO
    // anti-joins consume it (fresh + the in-batch candidate input), and
    // the stats below count it — without the pin the index probe plan
    // would execute once per consumer.
    val corpusDups = Dedup.nearDupAgainstDedupIndex(spark, dedupIndexPath,
        gated, "doc_id", "text", dedupThreshold,
        excludeBatch = Dedup.STREAM_BATCH_BASE + streamBatchId)
      .select(col("batch_id").as("doc_id")).distinct()
      .localCheckpoint()
    // in-batch near-dups: keep the smallest doc_id of each pair —
    // deterministic, so a replay collapses identically. Candidate geometry
    // comes from the stored index's OWN params: a pair arriving in one
    // batch must face the same false-negative rate as the same pair split
    // across batches (which the corpus probe handles at idxmeta geometry)
    val im = graft.index.ParquetMetaCache.headRow(spark,
      s"$dedupIndexPath/idxmeta")
    val inBatchDups = Dedup.minhashNearDupPairs(
        gated.join(broadcast(corpusDups), Seq("doc_id"), "left_anti"),
        "doc_id", "text", shingleSize = im.getAs[Int]("shingle_size"),
        numHashes = im.getAs[Int]("num_hashes"),
        bands = im.getAs[Int]("bands"), threshold = dedupThreshold)
      .select(greatest(col("id_a"), col("id_b")).as("doc_id")).distinct()
      .localCheckpoint()
    val fresh = gated
      .join(broadcast(corpusDups), Seq("doc_id"), "left_anti")
      .join(broadcast(inBatchDups), Seq("doc_id"), "left_anti")
      // pinned for its own reason (beyond the re-compute cost): the dedup
      // append below DELETES this batch's torn partition dirs before
      // rewriting them, and an unpinned `fresh` would re-execute the probe
      // plan mid-append against the just-deleted signature files
      // (FILE_NOT_EXIST on a torn replay). Materializing here runs the
      // probes exactly once, strictly before any store mutates.
      .localCheckpoint()
    // the refetch LEDGER: revisit records are the crawler's own dedup
    // verdicts — land them beside the corpus (joinable with url_dedup /
    // the rollup TVF) instead of dropping them on the floor. The rows are
    // already in the pinned frame (same single segment parse as the
    // documents — no second read, no second gunzip), own marker +
    // replace-by-batch. Skipped entirely when the revisit marker already
    // committed (`revDone` folded into `wantRev`) — a replay torn
    // elsewhere must not re-land the ledger.
    val revisits = if (wantRev) Some(pinned
        .filter(col("kind") === "rev")
        .select("url", "fetch_date", "original_date", "payload_digest",
          "profile", "file", "offset"))
      else None
    // the census rollup: the bridge's disposition, with landing docs the
    // ingest gate rejects reclassified `below_quality` (same first-match
    // position the TVF census gives the quality arm). One row per reason
    // per batch — a stream's whole life of census is a tiny table.
    val census = if (wantDisp) Some(pinned
        .select(
          when(col("kind") === "doc" && col("__q") < minQuality,
            "below_quality").otherwise(col("disposition"))
            .as("disposition"),
          col("truncated"))
        .groupBy(col("disposition"))
        .agg(count(lit(1)).as("n"), count(col("truncated")).as("n_truncated"))
        .withColumn("batch_id", lit(streamBatchId)))
      else None
    try {
      appendIdempotent(fresh, documentsPath, streamBatchId, "crawl")
      revisits.foreach(rev =>
        appendIdempotent(rev, revisitsPath.get, streamBatchId, "revisits"))
      census.foreach(c =>
        appendIdempotent(c, dispositionsPath.get, streamBatchId, "census"))
      // optional BM25 text index: the crawl corpus becomes full-text
      // searchable in the same exactly-once batch (its own marker +
      // replace-by-batch-id discipline, see appendBatchIdempotent)
      textIndexPath.foreach(tp =>
        graft.operators.TextIndex.appendBatchIdempotent("doc_id", "text",
          tp)(fresh, streamBatchId))
      // optional ANN leg: survivors become vector-searchable through the
      // freshness-honoring delta. No marker needed — the ANN ingest is
      // at-least-once BY DESIGN (replayed rows dedup by row_id at the
      // fold, and serving is duplicate-tolerant; see
      // StreamingIngest.appendBatchToDelta's contract). The encoder is a
      // TYPED swap point ([[defaultEncoder]] states the contract): pass a
      // real model call via `encoder`; the default is the documented stub.
      annIndexPath.foreach(ap =>
        StreamingIngest.appendBatchToDelta(ap)(
          encoder.getOrElse(defaultEncoder(embedDim))(fresh),
          streamBatchId))
      // dedup signatures LAST: the index only becomes foldable once this
      // marker lands, i.e. after every other store committed (see class doc)
      Dedup.appendDedupBatchIdempotent("doc_id", "text", dedupIndexPath)(
        fresh, streamBatchId)
      // accounting: cheap counts over the pinned frames (no replanning),
      // returned per-batch AND accumulated stream-lifetime (Spark UI)
      val stats = IngestStats(
        docsExtracted = nExtracted,
        droppedQuality = nExtracted - nGated,
        droppedCorpusDup = corpusDups.count(),
        droppedInBatchDup = inBatchDups.count(),
        // counted on the landed frame itself (checkpointed — the count is
        // a local scan, no replan), NOT gated minus the per-cause tallies:
        // those tallies are allowed to overlap (see IngestStats doc), and
        // subtracting them would double-count any doc in both dup sets
        docsLanded = fresh.count(),
        revisitsLanded = revisits.map(_.count()).getOrElse(0L))
      val acc = ingestCounters(spark)
      acc("docs_extracted").add(stats.docsExtracted)
      acc("dropped_quality").add(stats.droppedQuality)
      acc("dropped_corpus_dup").add(stats.droppedCorpusDup)
      acc("dropped_inbatch_dup").add(stats.droppedInBatchDup)
      acc("docs_landed").add(stats.docsLanded)
      acc("revisits_landed").add(stats.revisitsLanded)
      stats
    } finally {
      fresh.unpersist(); pinned.unpersist()
      corpusDups.unpersist(); inBatchDups.unpersist()
    }
  }

  /** Replace-by-batch parquet append (documents, revisit ledger): scrub
    * `<tagPrefix>_b<id>_`-prefixed files from a torn previous attempt,
    * staged write + rename, marker commits last. Readers
    * (`spark.read.parquet(path)`) never see `_`-prefixed staging/marker
    * dirs. */
  private def appendIdempotent(docs: DataFrame,
      documentsPath: String, streamBatchId: Long,
      tagPrefix: String): Unit = {
    val spark = docs.sparkSession
    val dst = new org.apache.hadoop.fs.Path(documentsPath)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(
      s"$documentsPath/_stream/b$streamBatchId")
    if (fs.exists(marker)) return
    fs.mkdirs(dst)
    val tag = s"${tagPrefix}_b${streamBatchId}_"
    fs.listStatus(dst)
      .filter(_.getPath.getName.startsWith(tag))
      .foreach(s => fs.delete(s.getPath, false))
    val staging = new org.apache.hadoop.fs.Path(
      s"$documentsPath/_${tagPrefix}tmp_${streamBatchId}_${java.util.UUID.randomUUID()}")
    docs.write.mode("overwrite").parquet(staging.toString)
    fs.listStatus(staging).foreach { s =>
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        if (!fs.rename(s.getPath,
            new org.apache.hadoop.fs.Path(dst, s"$tag$name")))
          sys.error(s"crawl ingest: rename ${s.getPath} failed")
    }
    fs.delete(staging, true)
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /**
   * Start the bridge: watch `segmentsDir` (glob ok) for new `.warc.gz`
   * segments and land each discovered batch through [[ingestSegments]].
   * The file source checkpoint remembers which segments were SEEN; the
   * per-store markers make the processing of each batch idempotent — the
   * two compose to exactly-once. Only paths cross the driver: the
   * discovery stream selects nothing but `path` (the binaryFile source
   * prunes the content column away), so a trigger's driver state is
   * `maxFilesPerTrigger` strings.
   */
  def startCrawlIngest(spark: SparkSession, segmentsDir: String,
      documentsPath: String, dedupIndexPath: String, checkpoint: String,
      minQuality: Double = 0.35, dedupThreshold: Double = 0.8,
      maxFilesPerTrigger: Int = 32,
      // raw segments only by default. Common Crawl mirrors every segment
      // as BOTH shapes (x.warc.gz and x.warc.wet.gz); a combined glob over
      // such a directory would ingest each page TWICE under different
      // doc_ids (HTML-extracted vs WET text — near but not identical, so
      // the dedup probe cannot be relied on to collapse them). Point a
      // WET-only crawl at "*.warc.wet.gz" explicitly; use a combined glob
      // only for directories holding ONE shape per crawl.
      segmentGlob: String = "*.warc.gz",
      textIndexPath: Option[String] = None,
      annIndexPath: Option[String] = None, embedDim: Int = 64,
      encoder: Option[DataFrame => DataFrame] = None,
      revisitsPath: Option[String] = None,
      mainText: Boolean = false,
      dispositionsPath: Option[String] = None,
      // tiered folds inside the batch callback once a store's local batch
      // count passes graft.compact.dedupMaxBatches / textMaxBatches
      // (default 64) — the startDedupIngest/startTextIngest autovacuum
      // analog: O(appended data) per fold, one writer by construction, so
      // an unbounded crawl never accumulates unbounded batch counts
      autoCompact: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    // loud start-time check: a glob that matches NOTHING is overwhelmingly
    // a deployment mistake (e.g. a WET-only directory relying on the old
    // `*.warc*.gz` default after it narrowed to `*.warc.gz`) — the stream
    // would otherwise run forever silently ingesting zero segments. A
    // warning, not an error: starting the watcher before the first
    // segment arrives is legitimate.
    try {
      val probe = new org.apache.hadoop.fs.Path(
        segmentsDir.stripSuffix("/") + "/" + segmentGlob)
      val hits = probe.getFileSystem(spark.sessionState.newHadoopConf())
        .globStatus(probe)
      if (hits == null || hits.isEmpty)
        Console.err.println(
          s"[graft] WARN crawl ingest: glob '$segmentGlob' under " +
            s"'$segmentsDir' matches ZERO files at start — for WET-only " +
            "directories pass segmentGlob=\"*.warc.wet.gz\" explicitly " +
            "(the default narrowed from *.warc*.gz to *.warc.gz to stop " +
            "double-ingesting mirrored WARC+WET pairs); the stream will " +
            "ingest nothing until matching files appear")
    } catch {
      case e: Exception => Console.err.println(
        s"[graft] WARN crawl ingest: cannot list '$segmentsDir' at start " +
          s"(${e.getMessage}); the stream will ingest nothing until the " +
          "directory becomes readable")
    }
    spark.readStream
      .format("binaryFile")
      // the source's own fixed schema (streaming file sources demand it
      // explicitly); only `path` is ever selected, and BinaryFileFormat
      // prunes the content column, so no payload byte crosses the driver
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"))
      .option("pathGlobFilter", segmentGlob)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(segmentsDir)
      .select(col("path"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val paths = batch.collect().map(_.getString(0)).toSeq
        ingestSegments(s, paths, documentsPath, dedupIndexPath, batchId,
          minQuality, dedupThreshold, textIndexPath, annIndexPath, embedDim,
          encoder, revisitsPath, mainText, dispositionsPath)
        if (autoCompact && paths.nonEmpty) {
          val dedupMax =
            s.conf.get("graft.compact.dedupMaxBatches", "64").toInt
          if (Dedup.localBatchCount(s, dedupIndexPath) > dedupMax)
            Dedup.compactDedupIndex(s, dedupIndexPath, tiered = true)
          textIndexPath.foreach { tp =>
            val textMax =
              s.conf.get("graft.compact.textMaxBatches", "64").toInt
            if (graft.operators.TextIndex.localBatchCount(s, tp) > textMax)
              graft.operators.TextIndex.compactTextIndex(s, tp, tiered = true)
          }
          // the ANN leg folds through the delta autovacuum (startDeltaIngest
          // thresholds) — without this the vector delta grows without bound
          // and every fresh search pays an ever-larger exact delta pass
          annIndexPath.foreach(ap =>
            StreamingIngest.maybeCompact(s, ap,
              s.conf.get("graft.compact.maxDeltaRows", "100000").toLong,
              s.conf.get("graft.compact.maxDeltaFrac", "0.1").toDouble))
          // the corpus-wide collision sweep, on the same maintenance
          // cadence (bounded: a 3-column projection-pruned scan + one
          // shuffle, every Nth batch — not per batch, where it would
          // dominate small batches). Fails the stream LOUD, like the
          // in-batch guard: a silent 64-bit collision merges two real
          // documents in the dedup index.
          maybeAuditCollisions(s, documentsPath, batchId,
            s.conf.get("graft.crawl.auditEveryBatches", "32").toInt)
          ()
        }
      }
      .start()
  }
}
