package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Runtime kernel for [[CharsetDecode]] — static so generated code calls it
 * directly (one static call per row inside whole-stage codegen; the decode
 * itself dominates, exactly like the built-in `decode`).
 *
 * Contract (the crawl-ingestion decode semantics, where the charset name
 * comes from an UNTRUSTED HTTP header and the bytes from an untrusted
 * server):
 *  - charset name empty/unknown/unsupported → fall back to UTF-8 (never
 *    throw on a bad label; a 100 TB ingest must not die on one typo'd
 *    `charset=utf8mb4` header);
 *  - malformed byte sequences and unmappable characters REPLACE with U+FFFD
 *    (the browser behavior), never throw — unlike Spark's built-in `decode`,
 *    which (a) whitelists six charsets unless a legacy flag is set, so
 *    windows-1252/Shift_JIS are unreachable, and (b) raises
 *    MALFORMED_CHARACTER_CODING under ANSI on bad bytes;
 *  - deterministic: same bytes + same label → same string, everywhere.
 */
object CharsetDecodeKernel {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Charset]()
  // negative cache, SIZE-CAPPED: a corpus where many rows carry the same
  // junk label (`charset=utf8mb4` is endemic) would otherwise pay
  // Charset.forName + exception construction per row on the hot decode
  // path. The cap keeps hostile servers from growing executor state
  // unboundedly — past it, unknown labels just pay the lookup again.
  private val BadLabelCap = 4096
  private val badLabels =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def lookup(name: UTF8String): Charset = {
    if (name == null) return StandardCharsets.UTF_8
    val s = name.toString.trim
    if (s.isEmpty) return StandardCharsets.UTF_8
    // no real charset name comes close to 64 chars; a longer "label" is
    // hostile header junk — refuse it outright (and never cache it: the
    // negative cache caps COUNT, this caps per-entry SIZE, so junk labels
    // cannot pin unbounded executor heap)
    if (s.length > 64) return StandardCharsets.UTF_8
    val k = s.toLowerCase(java.util.Locale.ROOT)
    val hit = cache.get(k)
    if (hit != null) hit
    else if (badLabels.contains(k)) StandardCharsets.UTF_8
    else
      // the success cache is bounded by nature (valid charset names are a
      // finite JVM-defined set); the failure cache is bounded by the cap
      try { val c = Charset.forName(k); cache.putIfAbsent(k, c); c }
      catch {
        case _: Exception =>
          if (badLabels.size < BadLabelCap) badLabels.add(k)
          StandardCharsets.UTF_8
      }
  }

  def decode(bytes: Array[Byte], charsetName: UTF8String): UTF8String = {
    val cs = lookup(charsetName)
    // CharsetDecoder instances are not thread-safe → one per call; cheap
    // next to the decode pass itself
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(ByteBuffer.wrap(bytes))
    // a leading U+FEFF is the byte-order mark, a SIGNATURE, not content
    // (java.nio strips it only for the BOM-detecting "UTF-16" charset, not
    // for UTF-8/UTF-16LE/UTF-16BE labels) — drop it so BOM'd pages don't
    // enter shingles/tokens with a zero-width prefix char
    val start = if (out.length > 0 && out.charAt(0) == '\uFEFF') 1 else 0
    UTF8String.fromString(out.subSequence(start, out.length).toString)
  }
}

/**
 * `graft_barrier(expr)` — the IDENTITY of its child, flagged
 * nondeterministic so the optimizer must leave it where it stands: no
 * predicate pushdown, no constant folding, no splitting. Use it to pin a
 * filter ABOVE a projection whose columns the predicate references —
 * Spark's pushdown substitutes referenced aliases with their full trees
 * (once PER REFERENCE, with no size guard), which for the crawl routing
 * predicates inlined a multi-level extraction tree into a source-level
 * filter: ~30x the generated code and the extraction re-run per row just
 * to evaluate the predicate (measured by `graft.tools.RoutingProbe`;
 * `rand() >= 0` guards don't survive — the optimizer range-folds them).
 * The value and the query RESULT stay fully deterministic; only the
 * optimizer's freedom is restricted.
 */
case class OptimizerBarrier(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def prettyName: String = "graft_barrier"
  override def dataType: DataType = child.dataType
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * Runtime kernel for [[HttpBodyDecode]] — HTTP body CODINGS, the layer
 * between the header/body split and the charset decode: real crawl
 * payloads arrive `Transfer-Encoding: chunked` and/or `Content-Encoding:
 * gzip|deflate` (wget/heritrix-written WARCs store the wire bytes; some
 * Common Crawl eras too). Without decoding, a chunked or gzipped HTML
 * body reaches the text extractor as framing-noise/binary garbage.
 *
 * Contract (crawl-robust, like [[CharsetDecodeKernel]]):
 *  - `chunked` transfer coding is decoded (hex sizes, extensions ignored,
 *    trailers ignored); a TRUNCATED tail (the crawler's size cap cut the
 *    stream) yields the bytes accumulated so far, but a framing VIOLATION
 *    with bytes remaining yields null;
 *  - `gzip`/`x-gzip`, `deflate` (zlib, with the raw-deflate retry many
 *    servers actually send), `zstd` (via the zstd-jni Spark already
 *    ships) and `br` (via the pure-Scala [[BrotliKernel]] — RFC 7932,
 *    the most common coding after gzip) content codings are decoded,
 *    output capped at [[MaxInflated]] (zip-bomb defense — past the cap
 *    yields null);
 *  - `identity`/empty codings pass through; anything else (`compress`,
 *    a TE list beyond chunked) yields null — the router DROPS the
 *    record rather than feeding garbage downstream;
 *  - any parse/inflate error yields null, never a throw: one hostile
 *    server must not kill a segment task.
 */
object HttpBodyKernels {
  /** 64 MiB inflated-body cap: a page bigger than this is not training
    * text, and an unbounded inflate is a zip-bomb denial vector. */
  val MaxInflated: Int = 64 << 20

  private def hexVal(b: Byte): Int = b match {
    case c if c >= '0' && c <= '9' => c - '0'
    case c if c >= 'a' && c <= 'f' => c - 'a' + 10
    case c if c >= 'A' && c <= 'F' => c - 'A' + 10
    case _ => -1
  }

  /** RFC 9112 §7.1 chunked decoding; null on violation, lenient at EOF. */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var i = 0
    while (true) {
      if (i >= b.length) return out.toByteArray // truncated tail: keep
      var size = 0L
      var any = false
      while (i < b.length && hexVal(b(i)) >= 0) {
        size = size * 16 + hexVal(b(i)); i += 1; any = true
        if (size > MaxInflated) return null
      }
      if (!any) return null // no hex where a chunk size must be
      // skip chunk extensions up to the line end
      while (i < b.length && b(i) != '\r' && b(i) != '\n') i += 1
      if (i < b.length && b(i) == '\r') i += 1
      if (i >= b.length) return out.toByteArray // truncated in framing
      if (b(i) != '\n') return null
      i += 1
      if (size == 0) return out.toByteArray // last-chunk; trailers ignored
      val n = math.min(size, (b.length - i).toLong).toInt
      out.write(b, i, n)
      i += n
      if (n < size) return out.toByteArray // truncated inside chunk data
      if (i < b.length && b(i) == '\r') i += 1
      if (i < b.length) {
        if (b(i) != '\n') return null // data must end at CRLF
        i += 1
      }
    }
    null // unreachable
  }

  // closes `in` on every exit path: the zlib Inflater and (for zstd) the
  // native decompression context are freed eagerly, not left to a
  // finalizer — this runs per record on the ingest hot path, where
  // finalizer-paced native memory is an OOM vector
  private def inflateThrough(in: java.io.InputStream): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val buf = new Array[Byte](1 << 16)
      var total = 0
      var n = in.read(buf)
      while (n > 0) {
        total += n
        if (total > MaxInflated) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()

  def gunzip(b: Array[Byte]): Array[Byte] =
    try inflateThrough(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)))
    catch { case _: Exception => null }

  def inflate(b: Array[Byte]): Array[Byte] =
    try inflateThrough(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(b)))
    catch {
      case _: Exception =>
        // the raw-deflate (no zlib wrapper) shape many servers send
        try inflateThrough(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b),
          new java.util.zip.Inflater(true)))
        catch { case _: Exception => null }
    }

  /** `Content-Encoding: zstd` (RFC 8878) — decoded, not dropped: zstd-jni
    * already ships on Spark's classpath (it backs Spark's own shuffle/
    * parquet codecs), so supporting the coding costs nothing. Same
    * [[MaxInflated]] cap and null-on-malformed contract as gzip/deflate;
    * `setContinuous` accepts the streaming-written frames (no embedded
    * content size) real servers emit. */
  def unzstd(b: Array[Byte]): Array[Byte] =
    try {
      val zin = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b))
      zin.setContinuous(true)
      inflateThrough(zin)
    } catch { case _: Exception => null }

  /** `Content-Encoding: br` (RFC 7932) — the most common coding on the
    * modern web after gzip, decoded by the pure-Scala [[BrotliKernel]]
    * (nothing on Spark's classpath decodes Brotli). Same [[MaxInflated]]
    * cap and null-on-malformed contract as the other codings — the kernel
    * implements both natively. */
  def unbrotli(b: Array[Byte]): Array[Byte] =
    BrotliKernel.decompress(b, MaxInflated)

  def decodeBody(body: Array[Byte], te: UTF8String,
      ce: UTF8String): Array[Byte] = {
    var b = body
    val teS = if (te == null) "" else te.toString.trim.toLowerCase(java.util.Locale.ROOT)
    if (teS.nonEmpty && teS != "identity") {
      val tokens = teS.split(",").map(_.trim).filter(t => t.nonEmpty && t != "identity")
      if (!tokens.forall(_ == "chunked")) return null // TE gzip etc: unsupported
      if (tokens.nonEmpty) { b = dechunk(b); if (b == null) return null }
    }
    val ceS = if (ce == null) "" else ce.toString.trim.toLowerCase(java.util.Locale.ROOT)
    ceS match {
      case "" | "identity" => b
      case "gzip" | "x-gzip" => gunzip(b)
      case "deflate" => inflate(b)
      case "zstd" => unzstd(b)
      case "br" => unbrotli(b)
      case _ => null // compress / coding lists: drop, don't garble
    }
  }
}

/**
 * `http_body_decode(body BINARY, transfer_encoding STRING,
 * content_encoding STRING) → BINARY` — undo the HTTP body codings per
 * [[HttpBodyKernels]]; null result means "unsupported or malformed coding,
 * drop the record". Null-safe: null in any input → null.
 */
case class HttpBodyDecode(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with Serializable {
  override def prettyName: String = "http_body_decode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // a legal all-inputs-present call can still yield null (bad coding)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType &&
        second.dataType.isInstanceOf[StringType] &&
        third.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, STRING, STRING), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def nullSafeEval(b: Any, te: Any, ce: Any): Any =
    HttpBodyKernels.decodeBody(b.asInstanceOf[Array[Byte]],
      te.asInstanceOf[UTF8String], ce.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, te, ce) =>
      s"""${ev.value} = graft.functions.HttpBodyKernels.decodeBody($b, $te, $ce);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/**
 * Runtime kernel for [[HtmlToText]] — the single-pass twin of
 * [[graft.sources.WarcSource.htmlText]]'s chained-`regexp_replace`
 * pipeline. The regex chain is the SPECIFICATION (kept, and spec-pinned
 * equal); this kernel exists because the chain costs ~22 full
 * regex-engine passes (each a scan + copy) per document on the ingest
 * hot path — the kernel does the same work in two linear char scans with
 * zero regex machinery. Equivalence is exact BY CONSTRUCTION, pass for
 * pass:
 *
 *  - scan 1 = `regexp_replace("(?is)<(script|style)[^>]*>.*?</\1>|<!--.*?-->", " ")`:
 *    left-to-right, a script/style open tag (`<script` + any non-`>` run +
 *    `>`, case-insensitive, no word boundary — `<scriptfoo>` opens a block,
 *    exactly like the regex) whose matching `</script>`/`</style>` exists
 *    becomes ONE space (lazy close = first occurrence); a closed comment
 *    becomes one space; anything else — including an UNCLOSED open tag or
 *    comment — copies through one char and rescans (so blocks INSIDE an
 *    unclosed comment are still removed, which is why this cannot fuse
 *    with scan 2: the regex chain removes them in its own full pass first);
 *  - scan 2 = tag strip + entity decode + whitespace collapse, interleaved
 *    (safe: a stripped tag emits a space, which can neither create nor
 *    break an entity match; entity outputs are never rescanned, matching
 *    the chain's amp-LAST ordering where `&amp;lt;` yields literal
 *    "&lt;"): `<` + any non-`>` run + `>` → one space ( `<` with no later
 *    `>` stays literal); `&name;` per the 17-entry table (case-sensitive)
 *    + `&amp;`; numeric refs by VALUE for table characters and `&#38;`/
 *    `&#x26;` (leading zeros unbounded, like the `0*` patterns), else
 *    stripped to a space only within the chain's digit-count caps (≤7
 *    decimal / ≤6 hex digits COUNTING zeros), else literal; ASCII
 *    whitespace runs collapse to one space with leading/trailing trimmed.
 */
object HtmlTextKernel {
  // value → replacement for every character the chain's entity table
  // decodes (named, decimal and hex forms all share the codepoint)
  private val entityByValue: java.util.HashMap[Long, String] = {
    val m = new java.util.HashMap[Long, String]()
    m.put(160L, " "); m.put(60L, "<"); m.put(62L, ">"); m.put(34L, "\"")
    m.put(39L, "'"); m.put(8211L, "–"); m.put(8212L, "—")
    m.put(8216L, "‘"); m.put(8217L, "’"); m.put(8220L, "“")
    m.put(8221L, "”"); m.put(8230L, "…"); m.put(183L, "·")
    m.put(169L, "©"); m.put(174L, "®"); m.put(8482L, "™"); m.put(233L, "é")
    m
  }
  private val namedEntities: Array[(String, String)] = Array(
    "nbsp;" -> " ", "lt;" -> "<", "gt;" -> ">", "quot;" -> "\"",
    "apos;" -> "'", "ndash;" -> "–", "mdash;" -> "—", "lsquo;" -> "‘",
    "rsquo;" -> "’", "ldquo;" -> "“", "rdquo;" -> "”", "hellip;" -> "…",
    "middot;" -> "·", "copy;" -> "©", "reg;" -> "®", "trade;" -> "™",
    "eacute;" -> "é", "amp;" -> "&")

  /** Scan 1 shared with [[MainTextKernel]] (which segments blocks over the
    * same script/style/comment-free view the text extraction sees). */
  private[functions] def stripScriptStyleComments(s: String): String =
    stripBlocks(s)

  /** Scan 1: script/style blocks and closed comments → one space each. */
  private def stripBlocks(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var advanced = false
      if (c == '<') {
        val name =
          if (s.regionMatches(true, i + 1, "script", 0, 6)) "script"
          else if (s.regionMatches(true, i + 1, "style", 0, 5)) "style"
          else null
        if (name != null) {
          // the open tag: any non-'>' run then '>'
          var j = i + 1 + name.length
          while (j < n && s.charAt(j) != '>') j += 1
          if (j < n) {
            // lazy close: the first exact `</name>` (case-insensitive)
            val close = "</" + name + ">"
            var e = j + 1
            var found = -1
            while (found < 0 && e + close.length <= n) {
              if (s.regionMatches(true, e, close, 0, close.length)) found = e
              else e += 1
            }
            if (found >= 0) {
              sb.append(' ')
              i = found + close.length
              advanced = true
            }
          }
        } else if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          if (e >= 0) { sb.append(' '); i = e + 3; advanced = true }
        }
      }
      if (!advanced) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def extract(in: UTF8String): UTF8String = {
    val s = stripBlocks(in.toString)
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(c: Char): Unit =
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
          c == '\r') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
    def emitStr(str: String): Unit = {
      var k = 0
      while (k < str.length) { emit(str.charAt(k)); k += 1 }
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val j = s.indexOf('>', i + 1)
        if (j >= 0) { emit(' '); i = j + 1 }
        else { emit('<'); i += 1 } // no '>' to EOF: the regex leaves it
      } else if (c == '&') {
        var matched = false
        if (i + 1 < n && s.charAt(i + 1) == '#') {
          // numeric reference: optional x/X, digit run, ';'
          var j = i + 2
          val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
          if (hex) j += 1
          val digitsStart = j
          var value = 0L
          var saturated = false
          while (j < n && {
            val d = s.charAt(j)
            if (hex) (d >= '0' && d <= '9') || (d >= 'a' && d <= 'f') ||
              (d >= 'A' && d <= 'F')
            else d >= '0' && d <= '9'
          }) {
            if (!saturated) {
              value = value * (if (hex) 16 else 10) + Character.digit(s.charAt(j), 16)
              if (value > 0x7FFFFFFFL) saturated = true // only compared vs small table values
            }
            j += 1
          }
          val nDigits = j - digitsStart
          if (nDigits > 0 && j < n && s.charAt(j) == ';') {
            if (!saturated && value == 38L) { emit('&'); i = j + 1; matched = true }
            else {
              val repl = if (saturated) null else entityByValue.get(value)
              if (repl != null) { emitStr(repl); i = j + 1; matched = true }
              else if ((!hex && nDigits <= 7) || (hex && nDigits <= 6)) {
                emit(' '); i = j + 1; matched = true
              } // else: over the chain's digit caps — stays literal
            }
          }
        } else {
          var k = 0
          while (!matched && k < namedEntities.length) {
            val (pat, repl) = namedEntities(k)
            if (s.startsWith(pat, i + 1)) {
              emitStr(repl); i = i + 1 + pat.length; matched = true
            }
            k += 1
          }
        }
        if (!matched) { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

/**
 * `html_to_text(html STRING) → STRING` — single-pass HTML → text
 * extraction, value-identical to [[graft.sources.WarcSource.htmlText]]'s
 * regex chain (the chain is the specification; [[HtmlTextKernel]] explains
 * the pass-for-pass equivalence, and the spec fuzzes them against each
 * other). Null in → null out.
 */
case class HtmlToText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def prettyName: String = "html_to_text"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    HtmlTextKernel.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlTextKernel.extract($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `charset_decode(payload BINARY, charset STRING) → STRING` — decode bytes
 * per a server-declared charset label with U+FFFD replacement, UTF-8
 * fallback on unknown labels (see [[CharsetDecodeKernel]] for the exact
 * contract and why the built-in `decode` cannot serve here). Null in either
 * input → null (an EMPTY charset label means UTF-8 — coalesce a nullable
 * label to '' upstream).
 */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "charset_decode"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(bytes: Any, cs: Any): Any =
    CharsetDecodeKernel.decode(bytes.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.functions.CharsetDecodeKernel.decode($b, $c);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
