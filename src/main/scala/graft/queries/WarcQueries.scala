package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/**
 * Crawl-ingestion queries under the DuckDB oracle: the WARC source is the
 * ENTRY POINT of the 100 TB pipeline, so it gets the same independent
 * hash-match gate as every downstream operator (the reference's discipline —
 * every AM path is driven by a real-SQL `#[pg_test]`, build.rs:1179-1418 —
 * applied to ingestion). DuckDB cannot parse WARC, so the oracle side is the
 * fixture's EXPECTED rows as literal VALUES: the fixture is deterministic
 * (committed binary, byte-stable regeneration via
 * [[graft.tools.FreezeWarcFixture]]), which makes the literal oracle exactly
 * as strong as a recomputed one — and independent of this parser.
 *
 * The fixture segment is multi-member gzip (one member per record, the
 * Common Crawl framing) and exercises every `warcToDocuments` branch:
 * HTTP-response split + HTML extraction with named AND numeric character
 * references, raw text/html (blank line inside markup must survive), WET
 * conversion passthrough, and two record types the bridge must drop.
 */
object WarcQueries {

  /** The committed fixture segment; resolved relative to the repo root the
    * driver launches from, with the absolute fallback for harnesses that
    * run elsewhere. */
  private def fixture: String = {
    val local = new java.io.File(
      "src/test/resources/fixtures/warc_gen12/seg-00000.warc.gz")
    if (local.isFile) local.getAbsolutePath
    else "/root/repo/src/test/resources/fixtures/warc_gen12/seg-00000.warc.gz"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // crawl → documents bridge: record framing across gzip members, the
    // three payload shapes, the two drops, full text extraction
    "warc_ingest" -> ((s, _) => {
      WarcSource.warcToDocuments(WarcSource.readWarc(s, fixture))
        .select(
          // basename, not the absolute path — provenance must hash-match
          // regardless of where the checkout lives
          regexp_extract(col("file"), "([^/]+)$", 1).as("file"),
          col("offset"), col("url"), col("fetch_date"), col("text"))
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
    // crawl → media bridge + REAL header decode: the fixture's committed
    // PNG bytes through warcToMedia and ImageIODecoder — dimensions are a
    // property of the frozen bytes, so the literal oracle replays them
    "warc_media" -> ((s, _) => {
      val media = WarcSource.warcToMedia(WarcSource.readWarc(s, fixture))
      graft.operators.Multimodal
        .decodeMeta(media, graft.operators.ImageIODecoder)
        .join(media.select(col("media_id"), col("url"), col("offset")),
          Seq("media_id"))
        .select(col("offset"), col("url"), col("modality"), col("format"),
          col("width"), col("height"), col("n_bytes"))
        .orderBy(col("offset"))
    }))

  def oracleSql: Map[String, String] = Map(
    "warc_ingest" ->
      """SELECT * FROM (VALUES
        |  ('seg-00000.warc.gz', 1, 'http://example.org/alpha', '2026-03-04T05:06:07Z',
        |   'Graft Alpha & beta’s report Latency: <10ms — 99th percentile.'),
        |  ('seg-00000.warc.gz', 2, 'http://example.org/raw', '2026-03-04T05:06:07Z',
        |   'First block. Second block end.'),
        |  ('seg-00000.warc.gz', 3, 'http://example.org/alpha', '2026-03-04T05:06:07Z',
        |   'Graft Alpha report pre-extracted text.')
        |) AS t(file, "offset", url, fetch_date, text)
        |ORDER BY "offset"""".stripMargin,
    "warc_census" ->
      """SELECT * FROM (VALUES
        |  (0, 'warcinfo', 'application/warc-fields', 41),
        |  (1, 'response', 'application/http; msgtype=response', 308),
        |  (2, 'response', 'text/html', 81),
        |  (3, 'conversion', 'text/plain', 42),
        |  (4, 'response', 'application/octet-stream', 32),
        |  (5, 'response', 'image/png', 117)
        |) AS t("offset", warc_type, content_type, content_length)
        |ORDER BY "offset"""".stripMargin,
    "warc_media" ->
      """SELECT * FROM (VALUES
        |  (5, 'http://example.org/logo.png', 'image', 'png', 6, 4, 117)
        |) AS t("offset", url, modality, format, width, height, n_bytes)
        |ORDER BY "offset"""".stripMargin)
}
