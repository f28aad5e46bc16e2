package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
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
 * precisely so a streaming reader can resynchronize; member framing is
 * parsed EXPLICITLY ([[MultiMemberGzipInputStream]] — the JDK reader's
 * concatenation heuristic has silent-truncation modes), so the same code
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
   * multi-member-exact [[MultiMemberGzipInputStream]] over each segment;
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
        val in = new BufferedInputStream(
          if (gzipped) new MultiMemberGzipInputStream(pds.open())
          else pds.open(), 1 << 16)
        // a consumer that abandons the iterator early (df.limit, a failed
        // task) never drains it — close on task completion as the backstop
        // so the handle + inflater don't outlive the task (closeOnExhaust
        // is idempotent via its `closed` flag; double-close is a no-op)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        closeOnExhaust(parseStream(file, in, keepPayload), in)
      }
      .toDF()
  }

  /**
   * Exact multi-member gzip reader — replaces the JDK `GZIPInputStream`
   * concatenation HEURISTIC, which has two silent-data-loss modes on crawl
   * segments (one gzip member per record, millions of boundaries):
   *
   *  1. older JDKs continue past a member boundary only when
   *     `in.available() > 0` or the inflater holds >26 leftover bytes — on
   *     Hadoop/S3A streams `available()` can legitimately be 0 mid-file,
   *     so every record after such a boundary is silently dropped;
   *  2. every JDK swallows a malformed next-member header (`readTrailer`
   *     catches the IOException and reports clean EOF), so a corrupt
   *     boundary silently drops the rest of the segment.
   *
   * This reader owns the framing: gzip headers are parsed explicitly
   * (flags, FEXTRA/FNAME/FCOMMENT/FHCRC), each member inflates with a raw
   * `Inflater`, leftover read-ahead is PUSHED BACK at member end, trailers
   * verify CRC32 + ISIZE, and non-gzip bytes at a member boundary throw
   * with the offending magic — a dropped record is impossible without a
   * loud error, whatever the stream's `available()` semantics.
   */
  private[graft] final class MultiMemberGzipInputStream(raw: InputStream)
      extends InputStream {
    private val BUF = 1 << 16
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32()
    // one owned read-ahead window over `raw`: [pos, end) is unconsumed.
    // Header/trailer bytes read from it directly; the inflater is handed
    // the window and its leftover is RECLAIMED by moving `pos` back —
    // zero copies at member boundaries (a PushbackInputStream design
    // memcpy'd the ~64 KiB read-ahead twice per member, which at Common
    // Crawl's ~1 KiB members dominated the decode cost).
    private val inBuf = new Array[Byte](BUF)
    private var pos = 0
    private var end = 0
    private var inMember = false
    private var eof = false

    /** Ensure the window is non-empty; false at raw EOF. */
    private def fillWindow(): Boolean =
      pos < end || {
        end = raw.read(inBuf, 0, BUF)
        pos = 0
        end > 0
      }

    private def readU8(): Int = {
      if (!fillWindow()) throw new EOFException(
        "gzip: truncated header/trailer")
      val b = inBuf(pos) & 0xff
      pos += 1
      b
    }
    private def skipN(n: Int): Unit = (0 until n).foreach(_ => readU8())
    private def readU32(): Long =
      readU8() | (readU8() << 8) | (readU8() << 16) | (readU8().toLong << 24)

    /** Parse the next member header; false at clean EOF; LOUD on anything
      * that is not a well-formed gzip member start. */
    private def tryStartMember(): Boolean = {
      if (!fillWindow()) return false
      val b0 = readU8()
      val b1 = if (fillWindow()) readU8() else -1
      if (b0 != 0x1f || b1 != 0x8b)
        throw new java.io.IOException(
          f"gzip: expected member magic 1f 8b at member boundary, got " +
            f"0x$b0%02x${if (b1 < 0) " <eof>" else f" 0x$b1%02x"} — corrupt " +
            "or non-gzip bytes; records would otherwise be silently dropped")
      val method = readU8()
      if (method != 8) throw new java.io.IOException(
        s"gzip: unsupported compression method $method")
      val flags = readU8()
      skipN(6) // MTIME(4) XFL OS
      if ((flags & 0x04) != 0) { // FEXTRA
        val lo = readU8(); val hi = readU8(); skipN(lo | (hi << 8))
      }
      if ((flags & 0x08) != 0) while (readU8() != 0) () // FNAME
      if ((flags & 0x10) != 0) while (readU8() != 0) () // FCOMMENT
      if ((flags & 0x02) != 0) skipN(2) // FHCRC
      inf.reset(); crc.reset(); inMember = true
      true
    }

    /** Reclaim the inflater's read-ahead (the trailer + next member's
      * bytes) by moving `pos`, then verify this member's trailer. */
    private def finishMember(): Unit = {
      pos = end - inf.getRemaining
      val crcV = readU32()
      val isize = readU32()
      if (crc.getValue != crcV) throw new java.io.IOException(
        f"gzip: member CRC mismatch (got 0x${crc.getValue}%08x, " +
          f"trailer 0x$crcV%08x)")
      if ((inf.getBytesWritten & 0xffffffffL) != isize)
        throw new java.io.IOException("gzip: member ISIZE mismatch")
      inMember = false
    }

    override def read(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n < 0) -1 else b(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (eof) return -1
      if (len == 0) return 0
      if (!inMember && !tryStartMember()) { eof = true; return -1 }
      var n = 0
      while (n == 0) {
        if (inf.finished()) {
          finishMember()
          if (!tryStartMember()) { eof = true; return -1 }
        }
        if (inf.needsInput()) {
          if (!fillWindow()) throw new EOFException(
            "gzip: truncated member (EOF inside deflate stream)")
          inf.setInput(inBuf, pos, end - pos)
          pos = end // handed to the inflater; reclaimed at member end
        }
        n = inf.inflate(b, off, len)
        if (n == 0 && inf.needsDictionary()) throw new java.io.IOException(
          "gzip: preset dictionary not supported")
      }
      crc.update(b, off, n)
      n
    }

    override def close(): Unit = { inf.end(); raw.close() }
  }

  /** Wrap a record iterator so the underlying stream closes exactly when
    * the iterator drains (flatMap over binaryFiles has no other close
    * hook) — and also on a parse failure, before the error propagates. */
  private def closeOnExhaust(it: Iterator[WarcRecord],
      in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = try it.hasNext
        catch { case e: Throwable => if (!closed) { closed = true; in.close() }; throw e }
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
   *
   * This regex chain is the SPECIFICATION of the extraction. The bridges
   * run [[graft.functions.HtmlTextKernel]] (`html_to_text`), a
   * value-identical single-pass native expression — the chain costs ~22
   * regex-engine passes per document, the kernel two linear scans — and
   * the spec fuzzes the two against each other.
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
    // folded together — the high-frequency entities of real crawl HTML.
    // Numeric forms tolerate leading zeros (`&#038;` is what WordPress —
    // the single most common CMS in any crawl — emits for ampersand)
    val entities = Seq(
      "nbsp|#0*160|#[xX]0*[aA]0" -> " ",
      "lt|#0*60|#[xX]0*3[cC]" -> "<",
      "gt|#0*62|#[xX]0*3[eE]" -> ">",
      "quot|#0*34|#[xX]0*22" -> "\"",
      "apos|#0*39|#[xX]0*27" -> "'",
      "ndash|#0*8211|#[xX]0*2013" -> "–",
      "mdash|#0*8212|#[xX]0*2014" -> "—",
      "lsquo|#0*8216|#[xX]0*2018" -> "‘",
      "rsquo|#0*8217|#[xX]0*2019" -> "’",
      "ldquo|#0*8220|#[xX]0*201[cC]" -> "“",
      "rdquo|#0*8221|#[xX]0*201[dD]" -> "”",
      "hellip|#0*8230|#[xX]0*2026" -> "…",
      "middot|#0*183|#[xX]0*[bB]7" -> "·",
      "copy|#0*169|#[xX]0*[aA]9" -> "©",
      "reg|#0*174|#[xX]0*[aA][eE]" -> "®",
      "trade|#0*8482|#[xX]0*2122" -> "™",
      "eacute|#0*233|#[xX]0*[eE]9" -> "é")
    val numDone = entities.foldLeft(noTags) { case (c, (pat, to)) =>
      regexp_replace(c, s"&(?:$pat);", to)
    }
    // strip every remaining numeric reference EXCEPT the ampersand ones
    // (those join `&amp;` in the final, order-sensitive pass)
    val stripped = regexp_replace(numDone,
      "&#(?!0*38;|[xX]0*26;)(?:\\d{1,7}|[xX][0-9a-fA-F]{1,6});", " ")
    val decoded = regexp_replace(stripped, "&amp;|&#0*38;|&#[xX]0*26;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ---- HTTP-envelope routing ----------------------------------------------
  // Real crawl `response` records are `application/http; msgtype=response`
  // ENVELOPES: the WARC-level Content-Type only says "this is an HTTP
  // message"; the payload's REAL type lives in the HTTP header block (or in
  // WARC-Identified-Payload-Type, written by crawlers that content-sniff —
  // Common Crawl runs Apache Tika and records the sniffed type there).
  // Routing on the envelope type alone has two production failure modes:
  // the media bridge sees ZERO rows (media arrives enveloped), and the text
  // bridge HTML-strips binary/JSON bodies into mojibake "text" gated only by
  // the downstream quality score.

  /** HTTP headers live in the first bytes of the payload; 16 KiB is well
    * past any server's header-size cap (Apache defaults to 8 K, nginx to
    * 4-8 K), and windowing keeps the header-scan copy O(16 KiB) per record
    * instead of O(payload) on multi-MB media bodies. */
  private val HttpHeaderWindow = 16384

  /** An html-ish body head: a doctype or `<html` lead, optionally behind a
    * UTF-8 BOM (EF BB BF reads as ï»¿ under the ISO-8859-1 view — BOM'd
    * pages are common and must still sniff; UTF-16 heads are undetectable
    * under a byte view and stay unsniffable) and/or an XML prolog — the
    * shape XHTML serialized as XML starts with. Matched on a bounded
    * ISO-8859-1-decoded head (byte↔char bijective). */
  private val HtmlishHeadRe =
    "(?is)^(?:\\u00EF\\u00BB\\u00BF)?\\s*(?:<\\?xml[^>]*\\?>\\s*)?" +
      "(?:<!doctype\\s+html|<html)"

  /** The generic XML family (`text/xml`, `application/xml`, any `+xml`
    * registration) — ONE definition composed into both the routing and the
    * charset-detection predicates, so the two cannot drift. */
  private def xmlFamilyTypeCol: Column =
    col("eff_type").isin("text/xml", "application/xml") ||
      col("eff_type").endsWith("+xml")

  /** Every effective type the text bridge can route — the set whose rows
    * must get in-document charset detection (a routed page whose charset
    * arm never fires decodes as UTF-8 mojibake). */
  private def TextishTypeCol: Column =
    col("eff_type") === "text/html" ||
      col("eff_type") === "application/xhtml+xml" ||
      xmlFamilyTypeCol

  /**
   * Appends the envelope-routing columns to raw records:
   *
   *  - `eff_type` — the payload's REAL lowercase media type, parameters
   *    stripped: `WARC-Identified-Payload-Type` when the crawler recorded
   *    one (content-sniffed — trumps the server's self-declaration, which
   *    misconfigured servers get wrong constantly), else the HTTP header
   *    block's `Content-Type:` line for `application/http` envelopes —
   *    and when BOTH are absent (a server may legally omit Content-Type;
   *    heritrix/wget write no identified type), an html-ish sniff of the
   *    decoded body head, so untyped HTML pages route instead of
   *    vanishing. Raw records keep the WARC-level Content-Type;
   *  - `eff_charset` — the server-declared `charset=` parameter (the HTTP
   *    header line for envelopes, the WARC-level Content-Type for raw
   *    records), falling back to the document's own `meta charset` tag
   *    for HTML with a silent server (the HTML5-common case; scanned on
   *    the DECODED body, after any transfer/content coding is undone);
   *    empty means unknown → UTF-8 downstream;
   *  - `body` — the payload BYTES with any HTTP header block sliced off
   *    (binary-safe, so enveloped media decodes from the exact image bytes).
   *
   * All pure Column (codegen'd, zero shuffle). The byte↔char trick: ISO-8859-1
   * maps byte i to codepoint i bijectively, so `decode(payload-prefix,
   * 'ISO-8859-1')` gives a string where CHARACTER positions equal BYTE
   * offsets in the original payload — `instr` locates the header/body split
   * and the ASCII header block reads directly, then the BINARY column is
   * sliced at that offset. One built-in decode of a bounded prefix per
   * record; no UDF.
   */
  private[graft] def withHttpRouting(records: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(records.sparkSession)
    val isHttp = col("warcType") === "response" &&
      col("contentType").startsWith("application/http")
    // Each shared building block is STAGED as its own materialized column
    // (dropped at the end) rather than a Scala `val` inlined into every
    // consumer tree: the nesting here is ~6 levels deep with fanout 2-3,
    // and inlining multiplied the latin1-decode subtree into HUNDREDS of
    // copies — 3.8 MB of generated code, ~2 s of per-plan fixed cost
    // (measured by graft.tools.RoutingProbe). Multi-referenced non-cheap
    // aliases block CollapseProject, so each stage computes once per row
    // and the generated code stays linear in the number of DISTINCT
    // expressions; same semantics, same single WholeStageCodegen.
    val staged = records
      .withColumn("__l1",
        decode(substring(col("payload"), 1, HttpHeaderWindow), "ISO-8859-1"))
      // 1-based byte offset of the body; null when the envelope is
      // malformed (no blank line in the header window — e.g. a header-only
      // 304, where an empty body is the right answer). "\n\n" never occurs
      // inside "\r\n\r\n", so whichever separator sits first is first.
      .withColumn("__bodyStart", {
        val crlf = instr(col("__l1"), "\r\n\r\n")
        val lf = instr(col("__l1"), "\n\n")
        when(isHttp,
          when(crlf > lit(0) && (lf === lit(0) || crlf < lf), crlf + lit(4))
            .when(lf > lit(0), lf + lit(2)))
      })
      .withColumn("__hdr",
        when(col("__bodyStart").isNotNull,
          col("__l1").substr(lit(1), col("__bodyStart") - lit(1)))
          .otherwise(lit("")))
      .withColumn("__httpCt", regexp_extract(col("__hdr"),
        "(?im)^content-type:[ \\t]*([^\\r\\n]+)", 1))
    val bodyStart = col("__bodyStart")
    val hdrBlock = col("__hdr")
    val httpCt = col("__httpCt")
    val idType = col("headers").getItem("warc-identified-payload-type")
    val csRe = "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9][A-Za-z0-9_.:+-]*)"
    staged
      .withColumn("body",
        // the wire bytes may still carry HTTP BODY CODINGS (chunked
        // transfer framing, gzip/deflate content coding — heritrix/wget
        // WARCs store them as received): undo them here, or drop the row
        // (null) on an unsupported/malformed coding rather than feeding
        // framing noise to the extractor — see HttpBodyKernels.
        // graft_barrier makes this projection a pushdown/collapse fence:
        // filters above reference eff_type/body, and Spark substitutes
        // referenced aliases with their full trees (once PER REFERENCE, no
        // size guard) when pushing through deterministic projects — which
        // inlined this whole tree into source-level filters, re-running
        // the routing per row at ~30x the generated code (RoutingProbe)
        call_function("graft_barrier", when(bodyStart.isNotNull,
          call_function("http_body_decode",
            col("payload").substr(bodyStart, length(col("payload"))),
            lower(trim(regexp_extract(hdrBlock,
              "(?im)^transfer-encoding:[ \\t]*([^\\r\\n]+)", 1))),
            lower(trim(regexp_extract(hdrBlock,
              "(?im)^content-encoding:[ \\t]*([^\\r\\n]+)", 1)))))
          .when(isHttp, lit(Array.emptyByteArray))
          .otherwise(col("payload"))))
      .withColumn("eff_type", lower(trim(regexp_extract(
        when(isHttp, coalesce(
            nullif(idType, lit("")),
            nullif(httpCt, lit("")),
            // a server may LEGALLY omit Content-Type, and heritrix/wget
            // write no identified-payload-type: sniff an html-ish DECODED
            // body head (doctype or <html> lead, with or without an XML
            // prolog — untyped XHTML is still HTML) rather than silently
            // dropping the page — everything else untyped stays dropped
            when(decode(substring(col("body"), 1, 256), "ISO-8859-1")
              .rlike(HtmlishHeadRe), "text/html"),
            lit("")))
          .otherwise(col("contentType")),
        "^([^;]*)", 1))))
      .withColumn("eff_charset", coalesce(
        // a byte-order mark FIRST (the WHATWG decode order: a BOM trumps
        // even the server's declared charset) — a UTF-16 page could never
        // match the ISO-8859-1-decoded meta-charset regex below, so
        // without this arm it decodes to alternating-NUL mojibake
        when(substring(col("body"), 1, 3) ===
          lit(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)), "UTF-8"),
        when(substring(col("body"), 1, 2) ===
          lit(Array(0xFF.toByte, 0xFE.toByte)), "UTF-16LE"),
        when(substring(col("body"), 1, 2) ===
          lit(Array(0xFE.toByte, 0xFF.toByte)), "UTF-16BE"),
        // the server's own charset= parameter: HTTP header line for
        // envelopes, the WARC-level Content-Type for raw records
        nullif(regexp_extract(httpCt, csRe, 1), lit("")),
        nullif(regexp_extract(col("contentType"), csRe, 1), lit("")),
        // the document's OWN declaration, for every type the text bridge
        // can route (html AND the xhtml/xml family — a routed page whose
        // charset arm doesn't fire decodes as UTF-8 mojibake): first the
        // XML prolog's encoding= (XHTML's native form), then the
        // HTML5-common meta tag (charset= or the http-equiv form — both
        // spell charset=; the spec requires it within the first 1024
        // bytes). Scan 2048 of the DECODED body (post-codings — a
        // gzipped/chunked head would never match on wire bytes).
        when(TextishTypeCol, nullif(regexp_extract(
          decode(substring(col("body"), 1, 2048), "ISO-8859-1"),
          "(?is)^\\s*<\\?xml[^>]*encoding\\s*=\\s*[\"']?\\s*" +
            "([A-Za-z0-9][A-Za-z0-9_.:+-]*)", 1), lit(""))),
        when(TextishTypeCol, nullif(regexp_extract(
          decode(substring(col("body"), 1, 2048), "ISO-8859-1"),
          "(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*" +
            "([A-Za-z0-9][A-Za-z0-9_.:+-]*)", 1), lit(""))),
        lit("")))
      // observability, not routing: an `application/http` envelope with no
      // header/body split inside the scan window — the body is empty by
      // construction, and the disposition census reports WHY
      .withColumn("envelope_malformed", isHttp && col("__bodyStart").isNull)
      // the HTTP status (null for non-enveloped records): a 404's HTML
      // body is an error page, not corpus text — the bridges gate on it
      .withColumn("http_status", when(isHttp,
        nullif(regexp_extract(hdrBlock,
          "^HTTP/[0-9.]+[ \\t]+([0-9]{3})", 1), lit("")).cast("int")))
      .drop("__l1", "__bodyStart", "__hdr", "__httpCt")
  }

  /** The crawl → MEDIA-table bridge: records whose EFFECTIVE payload type
    * (HTTP-envelope aware — see [[withHttpRouting]]) is an image, audio or
    * video type project to the [[graft.operators.Multimodal]] media schema
    * (media_id, modality, payload) plus crawl provenance — the decode /
    * feature-extract / resize passes chain directly
    * (`Multimodal.decodeMeta(warcToMedia(recs), ImageIODecoder)`). The
    * payload is the BODY bytes (HTTP headers sliced off), so the enveloped
    * `image/png` of a real crawl decodes from its exact image bytes. The
    * media_id is the same deterministic (segment basename, ordinal) hash
    * the documents bridge uses, so text and media rows from one crawl
    * share a provenance keyspace. */
  // Routing predicates shared by both bridges AND the disposition census —
  // one definition each, so the census can never drift from what the
  // bridges actually keep/drop. All reference [[withHttpRouting]] output.
  private def docTypeCol: Column = col("warcType").isin("response", "resource")
  private def wetCol: Column = col("warcType") === "conversion" &&
    col("contentType").startsWith("text/plain")
  private def modalityCol: Column =
    when(col("eff_type").startsWith("image/"), "image")
      .when(col("eff_type").startsWith("audio/"), "audio")
      .when(col("eff_type").startsWith("video/"), "video")
  private def htmlRouteCol: Column = {
    val xmlBodyIsHtml = decode(substring(col("body"), 1, 256), "ISO-8859-1")
      .rlike(HtmlishHeadRe)
    // modalityCol.isNull keeps the bridges MUTUALLY EXCLUSIVE: an
    // `image/svg+xml` (or any media `+xml` registration) whose body head
    // happens to read html-ish belongs to the media bridge, not both
    docTypeCol && modalityCol.isNull && (col("eff_type") === "text/html" ||
      col("eff_type") === "application/xhtml+xml" ||
      (xmlFamilyTypeCol && xmlBodyIsHtml))
  }
  private def plainRouteCol: Column =
    docTypeCol && col("eff_type") === "text/plain"
  /** `WARC-Truncated` surfaced as a column, not swallowed: a crawler that
    * hit its length/time cap wrote a PARTIAL capture, and the extracted
    * text ends mid-sentence — downstream quality scoring, dedup and
    * sequence packing must be able to see that this document is a
    * fragment, not a whole page. Value is the spec's reason token
    * (`length`/`time`/`disconnect`/`unspecified`; a bare header with no
    * value means `unspecified` per WARC 1.0 §5.13), null when the record
    * is complete. Common Crawl caps payloads (1 MiB historically), so
    * these occur at a visible rate in every real segment. */
  private def truncatedCol: Column =
    when(map_contains_key(col("headers"), lit("warc-truncated")),
      coalesce(
        nullif(lower(trim(col("headers").getItem("warc-truncated"))), lit("")),
        lit("unspecified")))
  /** The shared disposition chain (first match wins, mirroring bridge
    * order) over [[withHttpRouting]] output + an already-computed `text`
    * column — ONE definition consumed by [[warcToDispositions]] and the
    * fused bridge's census leg, so the two can never drift. Returned
    * WITHOUT a final otherwise: callers append their own quality arm
    * (the TVF census scores in-line; the streaming leg reclassifies by
    * the ingest gate's stored score) before closing with 'document'. */
  private def dispositionChain(text: Column): Column =
    when(col("warcType") === "revisit", "revisit")
      .when(!(docTypeCol || wetCol), "non_document_type")
      .when(col("envelope_malformed"), "malformed_envelope")
      .when(!statusOkCol, "non_success_status")
      .when(col("body").isNull, "unsupported_coding")
      .when(modalityCol.isNotNull, "media")
      .when(text.isNull, "non_text_type")
      .when(length(text) === 0, "empty_text")
  /** Success gate: only 2xx payloads are page content — a 404's HTML body
    * is an error page, a 30x's is a redirect stub; both pollute the corpus
    * (and near-dup MASSIVELY: every "Not Found" page of one server is
    * identical). Records with no HTTP envelope (raw, resource, WET) carry
    * no status — they pass. */
  private def statusOkCol: Column =
    col("http_status").isNull ||
      (col("http_status") >= 200 && col("http_status") < 300)

  def warcToMedia(records: DataFrame): DataFrame = {
    val base = regexp_extract(col("file"), "([^/]+)$", 1)
    val modality = modalityCol
    withHttpRouting(records)
      // body null = unsupported/malformed HTTP body coding — dropped.
      // `resource` records (wget/heritrix direct captures) carry the
      // payload raw; routing passes them through, so they qualify too.
      .filter(docTypeCol && statusOkCol && modality.isNotNull &&
        col("body").isNotNull)
      .select(
        xxhash64(base, col("offset")).as("media_id"),
        modality.as("modality"),
        col("body").as("payload"),
        col("targetUri").as("url"),
        base.as("file"),
        col("offset"))
  }

  /** The crawl → documents-table bridge, routed by the EFFECTIVE payload
    * type (see [[withHttpRouting]]; `response` below includes `resource` —
    * the wget/heritrix direct-capture record type):
    *
    *  - `response` + effective `text/html` or `application/xhtml+xml` (or a
    *    generic XML type whose body head reads as HTML — real servers serve
    *    XHTML as `text/xml` constantly) → HTTP header block sliced off
    *    (envelopes), charset-aware decode, [[htmlText]] extraction;
    *  - `response` + effective `text/plain` → charset-aware decode,
    *    whitespace collapse (no HTML stripping);
    *  - `conversion` + `text/plain` (WET, the pre-extracted-text twin
    *    corpus) → the payload IS the text: UTF-8 by the WET spec,
    *    passthrough with whitespace collapse;
    *  - everything else — enveloped JSON/PDF/media, warcinfo, request,
    *    revisit ([[warcToRevisits]] surfaces those) — DROPPED, never fed to
    *    the text path as mojibake ([[warcToDispositions]] reports what was
    *    dropped and why).
    *
    * Raw (non-enveloped) `text/html` records keep their whole payload — a
    * blank line inside markup is not a header/body split. Text decodes per
    * the server's `charset=` parameter with U+FFFD replacement and UTF-8
    * fallback ([[graft.functions.CharsetDecode]]), so Latin-1/Windows-1252/
    * Shift-JIS pages enter the dedup/quality stack as real text, not
    * mojibake. Emits `(url, fetch_date, text, truncated)` + provenance —
    * `truncated` is the `WARC-Truncated` reason (see [[truncatedCol]]),
    * null for complete captures.
    *
    * `withMainText = true` adds a `main_text` column: the
    * boilerplate-REDUCED content per [[graft.functions.MainTextKernel]]
    * (block scoring — structural tags, unlikely class/id, length, link
    * density; the public jusText/Boilerpipe/Readability family). At
    * 100 TB, site chrome (nav/footer/cookie banners) dominates near-dup
    * pair volume and skews quality ratios — `main_text` is the column the
    * curation family should score and dedup when it is on. For the
    * non-HTML routes (WET, text/plain) `main_text` equals `text`: there
    * is no markup to scope, the whole document is content. Opt-in because
    * it costs a second extraction pass per HTML document. */
  def warcToDocuments(records: DataFrame,
      withMainText: Boolean = false): DataFrame = {
    graft.functions.VectorFunctions.register(records.sparkSession)
    // `resource` records (wget/heritrix write them for directly-captured
    // payloads — no HTTP envelope, the WARC-level Content-Type is the real
    // type) route exactly like responses: withHttpRouting already passes
    // their payload/type/charset through untouched. XHTML is HTML by
    // definition; generic XML types route only when the body head reads as
    // an HTML document (see htmlRouteCol).
    val isWet = wetCol
    val isHtml = htmlRouteCol
    val isPlain = plainRouteCol
    val decodedBody =
      call_function("charset_decode", col("body"), col("eff_charset"))
    val base = withHttpRouting(records)
      .filter((isWet || isHtml || isPlain) && statusOkCol)
      .select(col("targetUri").as("url"), col("date").as("fetch_date"),
        // the text column is a graft_barrier fence like `body` above: the
        // emptiness filter below references it, and pushdown would
        // otherwise inline the whole extraction tree into the predicate —
        // evaluating the extraction TWICE per row (see OptimizerBarrier)
        call_function("graft_barrier",
          when(isWet,
            trim(regexp_replace(col("payload").cast("string"), "\\s+", " ")))
            .when(isHtml, call_function("html_to_text", decodedBody))
            .otherwise(trim(regexp_replace(decodedBody, "\\s+", " "))))
          .as("text"),
        // main_text rides the SAME routed frame (no second parse/decode):
        // a second kernel pass over the decoded body for HTML, identity
        // for the markup-free routes
        (if (withMainText)
          when(isHtml, call_function("main_html_text", decodedBody))
          else lit(null).cast("string")).as("__main"),
        truncatedCol.as("truncated"),
        col("file"), col("offset"))
      .filter(length(col("text")) > 0)
    if (withMainText)
      base.select(col("url"), col("fetch_date"), col("text"),
        coalesce(col("__main"), col("text")).as("main_text"),
        col("truncated"), col("file"), col("offset"))
    else base.drop("__main")
  }

  /** WARC `revisit` records surfaced as a crawl-level dedup SIGNAL instead
    * of dropped: the crawler already detected that this fetch matched an
    * earlier capture (by payload digest — the
    * `identical-payload-digest` profile) and recorded WHICH one; discarding
    * that re-pays the dedup cost downstream. The projection joins the
    * URL-dedup family directly: `url` is the re-fetched page,
    * `original_date` the capture it duplicates, `payload_digest` the
    * content key two revisits of the same page share. Map-side, zero
    * shuffle. */
  def warcToRevisits(records: DataFrame): DataFrame =
    records.filter(col("warcType") === "revisit")
      .select(
        col("targetUri").as("url"),
        col("date").as("fetch_date"),
        coalesce(col("headers").getItem("warc-refers-to-date"), lit(""))
          .as("original_date"),
        coalesce(col("headers").getItem("warc-payload-digest"), lit(""))
          .as("payload_digest"),
        coalesce(col("headers").getItem("warc-profile"), lit(""))
          .as("profile"),
        col("file"), col("offset"))

  /** One-pass fusion of [[warcToDocuments]] + [[warcToRevisits]]: the
    * revisit ledger rows come out of the SAME scan/gunzip the document
    * rows do. A union of the two bridges would read every segment twice
    * (Catalyst does not common-subexpression unions' scan subtrees, and
    * gzip cannot skip payloads without inflating them) — at 100 TB that
    * is 2x front-door decompression for a ledger of tiny rows. Emits the
    * superset of both projections plus `kind` ('doc' / 'rev'); doc rows
    * carry null ledger columns and vice versa. Same routing, fencing and
    * emptiness semantics as the dedicated bridges (incl. the opt-in
    * `main_text` — see [[warcToDocuments]]). */
  def warcToDocumentsAndRevisits(records: DataFrame,
      withMainText: Boolean = false,
      withDispositions: Boolean = false): DataFrame = {
    graft.functions.VectorFunctions.register(records.sparkSession)
    val isRev = col("warcType") === "revisit"
    val isRoute = wetCol || htmlRouteCol || plainRouteCol
    val decodedBody =
      call_function("charset_decode", col("body"), col("eff_charset"))
    def hdr(name: String) =
      coalesce(col("headers").getItem(name), lit(""))
    val routed = withHttpRouting(records)
      // revisits are NOT gated on the HTTP status: a revisit envelope is
      // typically a bare 304/empty capture — the ledger wants it anyway.
      // With the census leg on, NOTHING filters here: dropped records
      // flow through as kind='drop' rows carrying their disposition
      // (metadata only — their text is null, so the pin stays tiny)
      .filter(if (withDispositions) lit(true)
        else isRev || (isRoute && statusOkCol))
      // fenced like warcToDocuments' text (the kind/emptiness predicates
      // below reference it; see OptimizerBarrier). The explicit plain arm
      // + otherwise(null) makes the same expression correct for BOTH
      // modes: under the route filter the otherwise is unreachable, with
      // drops kept it marks "not a text route" exactly like the census.
      .withColumn("__text", call_function("graft_barrier",
        when(isRev, lit(null).cast("string"))
          .when(wetCol, trim(
            regexp_replace(col("payload").cast("string"), "\\s+", " ")))
          .when(htmlRouteCol, call_function("html_to_text", decodedBody))
          .when(plainRouteCol,
            trim(regexp_replace(decodedBody, "\\s+", " ")))))
    val projected = routed
      .select(
        (if (withDispositions)
          when(isRev, lit("rev"))
            .when(isRoute && statusOkCol && length(col("__text")) > 0, "doc")
            .otherwise("drop")
        else when(isRev, lit("rev")).otherwise(lit("doc"))).as("kind"),
        col("targetUri").as("url"), col("date").as("fetch_date"),
        col("__text").as("text"),
        (if (withMainText)
          when(!isRev && htmlRouteCol,
            call_function("main_html_text", decodedBody))
          else lit(null).cast("string")).as("__main"),
        when(!isRev, truncatedCol).as("truncated"),
        when(isRev, hdr("warc-refers-to-date")).as("original_date"),
        when(isRev, hdr("warc-payload-digest")).as("payload_digest"),
        when(isRev, hdr("warc-profile")).as("profile"),
        (if (withDispositions)
          dispositionChain(col("__text")).otherwise("document")
        else lit(null).cast("string")).as("__disp"),
        col("file"), col("offset"))
      .filter(if (withDispositions) lit(true)
        else col("kind") === "rev" || length(col("text")) > 0)
      .withColumns(
        if (withMainText) Map("main_text" ->
          when(col("kind") === "doc", coalesce(col("__main"), col("text"))))
        else Map.empty[String, Column])
    (if (withDispositions)
      projected.withColumn("disposition", col("__disp"))
    else projected).drop("__main", "__disp")
  }

  /** Drop OBSERVABILITY for the crawl front door: one disposition per
    * record, by the SAME predicates the bridges route with (shared private
    * Columns — the census cannot drift from the real keep/drop decisions).
    * At 100 TB an operator must be able to see "this crawl is 30% br" vs
    * "my parser is broken"; silent drops make those indistinguishable.
    *
    * Dispositions, first match wins (mirroring bridge order):
    *  - `revisit` — surfaced by [[warcToRevisits]], not a loss;
    *  - `non_document_type` — warcinfo/request/metadata framing records;
    *  - `malformed_envelope` — an `application/http` envelope with no
    *    header/body split in the scan window;
    *  - `non_success_status` — the HTTP status line is present and not
    *    2xx (error pages, redirect stubs — the near-dup flood);
    *  - `unsupported_coding` — the HTTP body coding could not be undone
    *    (compress, malformed gzip/zstd/br, chunked framing violation);
    *  - `media` — routed to [[warcToMedia]], not a loss;
    *  - `non_text_type` — effective type outside the text routes
    *    (JSON/PDF/feeds/...), the intended drop;
    *  - `empty_text` — extraction produced nothing;
    *  - `below_quality` — landed text under `minQuality` (only when
    *    `minQuality > 0`; pass the ingest gate's value to census it);
    *  - `document` — lands in the documents table.
    *
    * Map-side, zero shuffle (aggregate by disposition on top as needed —
    * that one-row-per-reason rollup is the only shuffle). */
  def warcToDispositions(records: DataFrame,
      minQuality: Double = 0.0): DataFrame = {
    graft.functions.VectorFunctions.register(records.sparkSession)
    val decodedBody =
      call_function("charset_decode", col("body"), col("eff_charset"))
    withHttpRouting(records)
      // staged + fenced like the bridges' text column: `disposition` below
      // references `text` three times, and without the barrier each
      // reference would inline the whole extraction tree (the round-13
      // codegen-blowup lesson); null = not a text route
      .withColumn("text", call_function("graft_barrier",
        when(wetCol,
          trim(regexp_replace(col("payload").cast("string"), "\\s+", " ")))
          .when(htmlRouteCol, call_function("html_to_text", decodedBody))
          .when(plainRouteCol, trim(regexp_replace(decodedBody, "\\s+", " ")))))
      .withColumn("disposition", {
        val routed = dispositionChain(col("text"))
        (if (minQuality > 0.0)
          routed.when(graft.operators.TextAnalysis.qualityScoreFast(col("text"))
            < lit(minQuality), "below_quality")
         else routed).otherwise("document")
      })
      .select(col("file"), col("offset"), col("targetUri").as("url"),
        col("warcType").as("warc_type"), col("eff_type"), col("disposition"),
        // orthogonal to the disposition: a `WARC-Truncated` capture can
        // still land as `document` (a fragment, visible downstream via the
        // documents bridge's own `truncated` column) — the census carries
        // the flag so "how much of this crawl is cut off" is one rollup
        truncatedCol.as("truncated"))
  }
}
