package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (Web ARChive, ISO 28500) reader — the raw-crawl ingestion format of
 * pretraining pipelines (Common Crawl ships WARC; so do Heritrix/wget
 * crawls). Re-expressed Spark-first rather than ported from any crawler's
 * reader:
 *
 * Shape at 100 TB: crawl corpora arrive as MILLIONS of ~1 GB `.warc.gz`
 * segments, so the unit of parallelism is the FILE — `binaryFiles` hands
 * each task a [[org.apache.spark.input.PortableDataStream]] and the parser
 * STREAMS records off it (memory is O(one record), never O(file); the
 * 100 TB job is bounded by segment count × segment scan, embarrassingly
 * parallel, zero shuffle). Common Crawl gzips one MEMBER per record
 * precisely so a streaming reader can resynchronize; the JDK's
 * `GZIPInputStream` concatenates members transparently, so the same code
 * path serves per-record-gzipped and whole-file-gzipped segments. A
 * header-only projection (`keepPayload = false`) drops the payload bytes
 * map-side for index/census passes over the crawl.
 *
 * The record grammar parsed here is the public WARC/1.x framing: a
 * `WARC/1.\d` version line, CRLF header block, `Content-Length: N`, blank
 * line, N payload bytes, CRLF CRLF separator. Unknown/extension headers are
 * preserved in `headers`; framing violations fail LOUD with file+offset
 * (a silently skipped record in a dedup corpus is a correctness bug, not a
 * robustness feature).
 */
object WarcSource {

  /** One WARC record. `offset` is the record's ordinal within its segment
    * (not a byte offset — gzip members make byte offsets meaningless to a
    * re-reader); (file, offset) is the stable provenance key downstream
    * dedup/curation carries. */
  case class WarcRecord(file: String, offset: Long, warcType: String,
      targetUri: String, date: String, contentType: String,
      contentLength: Long, headers: Map[String, String],
      payload: Array[Byte])

  /**
   * Read WARC segments under `pathGlob` (any Hadoop-visible glob) into a
   * DataFrame of records. `gzipped = true` (the crawl default) layers a
   * multi-member-aware GZIPInputStream over each segment;
   * `keepPayload = false` emits empty payloads (header census without the
   * bytes ever leaving the task's read buffer).
   */
  def readWarc(spark: SparkSession, pathGlob: String,
      gzipped: Boolean = true, keepPayload: Boolean = true,
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, mp)
      .flatMap { case (file, pds) =>
        val raw = if (gzipped) new EofProbingInputStream(pds.open())
          else pds.open()
        val in = new BufferedInputStream(
          if (gzipped) new GZIPInputStream(raw, 1 << 16) else raw, 1 << 16)
        // a consumer that abandons the iterator early (df.limit, a failed
        // task) never drains it — close on task completion as the backstop
        // so the handle + inflater don't outlive the task (closeOnExhaust
        // is idempotent via its `closed` flag; double-close is a no-op)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        closeOnExhaust(parseStream(file, in, keepPayload), in, () =>
          // drain-time exhaustion check: the JDK gzip reader treats a
          // malformed next-member header as clean EOF (readTrailer swallows
          // the IOException) — raw bytes left behind mean records were about
          // to be silently dropped, which in a dedup corpus is data loss
          if (gzipped && raw.read() >= 0) throw new java.io.IOException(
            s"$file: trailing bytes after gzip EOF — corrupt or non-gzip " +
              "member boundary; records would be silently dropped"))
      }
      .toDF()
  }

  /**
   * Defeats the JDK `GZIPInputStream` multi-member truncation heuristic:
   * at a member boundary it continues to the next member only if
   * `in.available() > 0` or the inflater holds >26 leftover bytes — but on
   * Hadoop/S3A input streams `available()` can legitimately return 0
   * mid-file, so a multi-member Common Crawl segment would SILENTLY drop
   * every record after the first boundary that lands on an empty buffer.
   * This wrapper makes `available()` authoritative: it answers 0 only at
   * true EOF, proven by a blocking one-byte read-ahead (fine here — the
   * consumer is a batch parser, not a non-blocking poller).
   */
  private[graft] final class EofProbingInputStream(in: InputStream)
      extends java.io.PushbackInputStream(in, 1) {
    override def available(): Int = {
      val a = super.available()
      if (a > 0) a
      else {
        val b = read()
        if (b < 0) 0 else { unread(b); 1 }
      }
    }
  }

  /** Wrap a record iterator so the underlying stream closes exactly when
    * the iterator drains (flatMap over binaryFiles has no other close
    * hook) — and also on a parse failure, before the error propagates.
    * `onDrain` runs once at clean exhaustion, BEFORE the close (the
    * trailing-bytes probe above needs the stream still open). */
  private def closeOnExhaust(it: Iterator[WarcRecord],
      in: InputStream, onDrain: () => Unit = () => ()):
      Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = try {
        val more = it.hasNext
        if (!more && !closed) onDrain()
        more
      } catch { case e: Throwable => if (!closed) { closed = true; in.close() }; throw e }
      if (!h && !closed) { closed = true; in.close() }
      h
    }
    override def next(): WarcRecord = it.next()
  }

  /** Streaming parse of one (possibly multi-member-gunzipped) WARC
    * segment. Library-visible so the spec can drive it over synthetic
    * byte streams directly. */
  private[graft] def parseStream(file: String, in: InputStream,
      keepPayload: Boolean = true): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var ordinal = 0L
      private var nextRec: WarcRecord = null
      private var eof = false

      // Read one CRLF/LF-terminated ASCII header line; None at EOF before
      // any byte. WARC headers are ASCII by spec; payload bytes are never
      // routed through here.
      private def readLine(): Option[String] = {
        val sb = new java.lang.StringBuilder(64)
        var c = in.read()
        if (c < 0) return None
        while (c >= 0 && c != '\n') {
          if (c != '\r') sb.append(c.toChar)
          c = in.read()
        }
        Some(sb.toString)
      }

      private def readFully(buf: Array[Byte]): Unit = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) throw new EOFException(
            s"$file record $ordinal: payload truncated at $off/${buf.length}")
          off += n
        }
      }

      private def skipFully(n: Long): Unit = {
        var left = n
        while (left > 0) {
          val s = in.skip(left)
          if (s > 0) left -= s
          else if (in.read() < 0) throw new EOFException(
            s"$file record $ordinal: payload truncated")
          else left -= 1
        }
      }

      private def advance(): Unit = {
        if (eof) return
        // skip inter-record blank lines, stop at EOF
        var line: Option[String] = readLine()
        while (line.contains("")) line = readLine()
        line match {
          case None => eof = true
          case Some(v) if v.startsWith("WARC/1.") =>
            var headers = Map.empty[String, String]
            var h = readLine().getOrElse(throw new EOFException(
              s"$file record $ordinal: EOF inside header block"))
            while (h.nonEmpty) {
              val i = h.indexOf(':')
              require(i > 0, s"$file record $ordinal: malformed header '$h'")
              headers += h.substring(0, i).trim.toLowerCase ->
                h.substring(i + 1).trim
              h = readLine().getOrElse(throw new EOFException(
                s"$file record $ordinal: EOF inside header block"))
            }
            val len = headers.getOrElse("content-length", throw
              new IllegalArgumentException(
                s"$file record $ordinal: missing Content-Length")).toLong
            val payload =
              if (keepPayload) {
                require(len <= Int.MaxValue,
                  s"$file record $ordinal: payload $len exceeds one array")
                val buf = new Array[Byte](len.toInt)
                readFully(buf)
                buf
              } else { skipFully(len); Array.emptyByteArray }
            nextRec = WarcRecord(file, ordinal,
              headers.getOrElse("warc-type", ""),
              headers.getOrElse("warc-target-uri", ""),
              headers.getOrElse("warc-date", ""),
              headers.getOrElse("content-type", ""),
              len, headers, payload)
            ordinal += 1
          case Some(other) =>
            throw new IllegalArgumentException(
              s"$file record $ordinal: expected WARC/1.x version line, " +
                s"got '${other.take(40)}' — not a WARC stream?")
        }
      }

      advance()
      override def hasNext: Boolean = { if (nextRec == null && !eof) advance(); nextRec != null }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  /**
   * HTML → text extraction as a pure Column pipeline (chained
   * `regexp_replace` — whole-stage-codegen'd, no UDF in the 100 TB hot
   * path): drops script/style/comment blocks, strips tags, decodes the
   * common entities, collapses whitespace. Deliberately heuristic-grade
   * (the trafilatura/jusText class of boilerplate REMOVAL is the
   * downstream [[graft.operators.TextAnalysis]] quality stack's job) but
   * deterministic, so extraction is replayable across engines.
   */
  def htmlText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</\\1>|<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // Entity decoding in the standard unescape order: everything else
    // FIRST, ampersand-producing forms LAST — decoding `&amp;` early would
    // double-decode escaped entities (`&amp;lt;` means the literal text
    // "&lt;", not "<"). Numeric character references (`&#160;`,
    // `&#x2019;` — ubiquitous in real crawl HTML) decode for the common
    // whitespace/punctuation codepoints and STRIP to a space otherwise, so
    // they can never pollute shingles/n-grams downstream. All regex, all
    // codegen'd — no UDF.
    // one pattern per TARGET CHARACTER, named|decimal|hex alternates
    // folded together — the high-frequency entities of real crawl HTML
    val entities = Seq(
      "nbsp|#160|#[xX][aA]0" -> " ",
      "lt|#60|#[xX]3[cC]" -> "<",
      "gt|#62|#[xX]3[eE]" -> ">",
      "quot|#34|#[xX]22" -> "\"",
      "apos|#39|#[xX]27" -> "'",
      "ndash|#8211|#[xX]2013" -> "–",
      "mdash|#8212|#[xX]2014" -> "—",
      "lsquo|#8216|#[xX]2018" -> "‘",
      "rsquo|#8217|#[xX]2019" -> "’",
      "ldquo|#8220|#[xX]201[cC]" -> "“",
      "rdquo|#8221|#[xX]201[dD]" -> "”",
      "hellip|#8230|#[xX]2026" -> "…",
      "middot|#183|#[xX][bB]7" -> "·",
      "copy|#169|#[xX][aA]9" -> "©",
      "reg|#174|#[xX][aA][eE]" -> "®",
      "trade|#8482|#[xX]2122" -> "™",
      "eacute|#233|#[xX][eE]9" -> "é")
    val numDone = entities.foldLeft(noTags) { case (c, (pat, to)) =>
      regexp_replace(c, s"&(?:$pat);", to)
    }
    // strip every remaining numeric reference EXCEPT the ampersand ones
    // (those join `&amp;` in the final, order-sensitive pass)
    val stripped = regexp_replace(numDone,
      "&#(?!38;|[xX]26;)(?:\\d{1,7}|[xX][0-9a-fA-F]{1,6});", " ")
    val decoded = regexp_replace(stripped, "&amp;|&#38;|&#[xX]26;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The crawl → documents-table bridge, covering both crawl shapes:
    * `response` records (raw WARC — the HTTP header block is split off the
    * payload per the WARC convention, then HTML-stripped) and `conversion`
    * records (WET, the pre-extracted-text twin corpus — the payload IS the
    * text, no split, no stripping). Emits `(url, fetch_date, text)` rows
    * ready for the dedup/quality pipeline. */
  /** The crawl → MEDIA-table bridge: response records whose Content-Type
    * is an image, audio or video type project to the
    * [[graft.operators.Multimodal]] media schema
    * (media_id, modality, payload) plus crawl provenance — the decode /
    * feature-extract / resize passes chain directly
    * (`Multimodal.decodeMeta(warcToMedia(recs), ImageIODecoder)`). The
    * media_id is the same deterministic (segment basename, ordinal) hash
    * the documents bridge uses, so text and media rows from one crawl
    * share a provenance keyspace. */
  def warcToMedia(records: DataFrame): DataFrame = {
    val base = regexp_extract(col("file"), "([^/]+)$", 1)
    val modality = when(col("contentType").startsWith("image/"), "image")
      .when(col("contentType").startsWith("audio/"), "audio")
      .when(col("contentType").startsWith("video/"), "video")
    records
      .filter(col("warcType") === "response" && modality.isNotNull)
      .select(
        xxhash64(base, col("offset")).as("media_id"),
        modality.as("modality"),
        col("payload"),
        col("targetUri").as("url"),
        base.as("file"),
        col("offset"))
  }

  def warcToDocuments(records: DataFrame): DataFrame = {
    val payloadStr = col("payload").cast("string")
    // the HTTP header block exists ONLY in application/http payloads (the
    // WARC response convention); a text/html record's payload is raw HTML,
    // where splitting at the first blank line would silently drop the whole
    // document prefix up to any blank line in the markup
    val httpBody = regexp_replace(payloadStr, "(?s)^.*?\\r?\\n\\r?\\n", "")
    val isHttp = col("warcType") === "response" &&
      col("contentType").startsWith("application/http")
    val isRawHtml = col("warcType") === "response" &&
      col("contentType").startsWith("text/html")
    val isWet = col("warcType") === "conversion" &&
      col("contentType").startsWith("text/plain")
    records
      .filter(isHttp || isRawHtml || isWet)
      .select(col("targetUri").as("url"), col("date").as("fetch_date"),
        when(isWet, trim(regexp_replace(payloadStr, "\\s+", " ")))
          .when(isRawHtml, WarcSource.htmlText(payloadStr))
          .otherwise(WarcSource.htmlText(httpBody)).as("text"),
        col("file"), col("offset"))
      .filter(length(col("text")) > 0)
  }
}
