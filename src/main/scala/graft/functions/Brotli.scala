package graft.functions

/**
 * Pure-Scala/JVM Brotli (RFC 7932) DECODER — `Content-Encoding: br` is the
 * most common content coding on the modern web after gzip, and the crawl
 * front door was null-dropping every br-coded page (the disposition census
 * measures the loss as `unsupported_coding`). No Brotli decoder exists on
 * Spark's classpath (zstd/gzip/deflate do), so the coding is implemented
 * here from the public specification.
 *
 * Everything in this file derives from RFC 7932 alone: the stream framing
 * (§9), prefix-code encodings (§3), context modeling (§7), the distance
 * ring and postfix scheme (§4), and the static dictionary with its 121
 * word transforms (§8, Appendices A/B). The dictionary bytes, the literal
 * context lookup table and the transform table are the RFC's normative
 * appendix DATA, shipped as resources under `graft/brotli/` (extracted
 * from a system libbrotli by `dev/brotli/extract_tables.py` — see that
 * script for the empirical derivation and cross-checks). Correctness is
 * pinned by `BrotliSpec` against 225 vectors produced by an independent
 * encoder (libbrotli) across qualities 0–11, windows 10–24 and payload
 * shapes from empty to 1 MiB.
 *
 * Contract (the crawl-robust shape shared with [[HttpBodyKernels]]):
 * `decompress(bytes, cap)` returns the decoded bytes, or NULL on any
 * malformed framing, over-cap output (zip-bomb defense), trailing
 * garbage, or truncation — never throws, never loops unboundedly. One
 * call is one record on the 100 TB ingest hot path: all tables are
 * per-call (no shared mutable state, thread-safe by construction), the
 * output is bounded by the cap, and Huffman decoding is table-based
 * (8-bit root + second level), not bit-by-bit tree walking.
 */
object BrotliKernel {

  /** Decode failure — control flow only, no stack trace (this fires once
    * per malformed record on the ingest path). `debugTrace` restores the
    * stack for test-time diagnosis of WHICH check rejected a stream. */
  private[graft] var debugTrace = false
  private final class Malformed(trace: Boolean)
      extends RuntimeException(null, null, false, trace)
  private def bad(): Nothing = throw new Malformed(debugTrace)

  // ---- static data (RFC 7932 appendices, shipped as resources) ----------

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"missing resource graft/brotli/$name")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Appendix A: the 122,784-byte static dictionary. */
  private lazy val Dictionary: Array[Byte] = {
    val d = resource("dictionary.bin")
    require(d.length == 122784, s"brotli dictionary: ${d.length} bytes")
    d
  }

  /** §8: log2(word count) per word length 4..24 (index = length). The
    * offsets are the running sum of `length << bits`; the total closing at
    * exactly 122,784 cross-checks the table against the dictionary blob. */
  private val DictSizeBits: Array[Int] =
    Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8,
      7, 7, 6, 6, 5, 5)
  private lazy val DictOffsets: Array[Int] = {
    val off = new Array[Int](26)
    var i = 4
    while (i <= 24) { off(i + 1) = off(i) + (i << DictSizeBits(i)); i += 1 }
    require(off(25) == 122784, s"dictionary offsets close at ${off(25)}")
    off
  }

  /** §7.1: literal context lookup — 512 bytes per mode (LSB6, MSB6, UTF8,
    * SIGNED): `ctx = lut[mode*512 + p1] | lut[mode*512 + 256 + p2]`. */
  private lazy val ContextLut: Array[Byte] = {
    val t = resource("context_lut.bin")
    require(t.length == 2048, s"brotli context lut: ${t.length} bytes")
    t
  }

  /** Appendix B: the 121 transforms as (prefix, word-op, suffix); op 0 =
    * identity, 1..9 = omit-last-N, 10/11 = uppercase-first/all (the
    * UTF-8-aware "ferment" of §8), 12..20 = omit-first-(N-11). */
  private lazy val (transformPrefix: Array[Array[Byte]],
      transformOp: Array[Int], transformSuffix: Array[Array[Byte]]) = {
    val b = resource("transforms.bin")
    var i = 0
    val n = b(i) & 0xff; i += 1
    require(n == 121, s"brotli transforms: $n")
    val pre = new Array[Array[Byte]](n)
    val op = new Array[Int](n)
    val suf = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      val pl = b(i) & 0xff; i += 1
      pre(t) = java.util.Arrays.copyOfRange(b, i, i + pl); i += pl
      op(t) = b(i) & 0xff; i += 1
      val sl = b(i) & 0xff; i += 1
      suf(t) = java.util.Arrays.copyOfRange(b, i, i + sl); i += sl
      require(pl + sl <= MaxTransformGrowth, s"transform $t adds $pl+$sl")
      t += 1
    }
    require(i == b.length)
    (pre, op, suf)
  }

  // §5: insert-length codes (base, extra bits) and copy-length codes.
  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5,
    5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  // §5: the 11 cells of the 704-symbol insert-and-copy code; cells 0-1
  // imply distance code 0 (reuse last distance).
  private val CellInsOff = Array(0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopyOff = Array(0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16)
  // §6: block-count code — 26 symbols (offset, extra bits); values
  // cross-checked against libbrotli's _kBrotliPrefixCodeRanges by the
  // extraction script.
  private val BlockLenOffset = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65,
    81, 97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
    8433, 16625)
  private val BlockLenBits = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5,
    5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  // §3.5: order in which code-length-code lengths are read.
  private val CodeLengthOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
    10, 11, 12, 13, 14, 15)
  // §3.5: the fixed prefix code for code-length-code lengths, as a 16-entry
  // peek-4-bits table (symbol values 0..5).
  private val ClcLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClcValue = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  // ---- bit reader (LSB-first, §2) ----------------------------------------

  private final class BitReader(in: Array[Byte]) {
    private var buf = 0L      // next bits, LSB-first
    private var cnt = 0       // valid bits in buf
    private var pos = 0       // next byte of `in` to load
    var consumed = 0L         // bits logically consumed so far

    private def fill(): Unit =
      while (cnt <= 56 && pos < in.length) {
        buf |= (in(pos) & 0xffL) << cnt
        cnt += 8
        pos += 1
      }

    /** Peek up to 15 bits; missing bytes beyond EOF read as zero (legal —
      * peeks are speculative; only CONSUMING past EOF is malformed). */
    def peek(n: Int): Int = { fill(); (buf & ((1L << n) - 1)).toInt }

    def drop(n: Int): Unit = {
      consumed += n
      if (consumed > in.length.toLong * 8) bad()
      buf >>>= n
      cnt -= n
      // cnt may go negative only transiently at EOF where peeked zeros
      // were consumed within the final-byte bound checked above
      if (cnt < 0) { cnt = 0; buf = 0L }
    }

    def readBits(n: Int): Int = {
      if (n == 0) return 0
      fill()
      if (cnt < n && pos >= in.length && consumed + n > in.length.toLong * 8)
        bad()
      val v = (buf & ((1L << n) - 1)).toInt
      drop(n)
      v
    }

    /** Align to a byte boundary; the skipped pad bits must be zero when
      * `checkZero` (final padding and metadata padding per §9.2). */
    def jumpToByteBoundary(checkZero: Boolean): Unit = {
      val pad = ((8 - (consumed & 7)) & 7).toInt
      if (pad > 0) {
        val v = readBits(pad)
        if (checkZero && v != 0) bad()
      }
    }

    /** Copy `len` bytes starting at the current (byte-aligned) position —
      * the ISUNCOMPRESSED path. */
    def copyBytes(dst: Array[Byte], off: Int, len: Int): Unit = {
      if ((consumed & 7) != 0) bad()
      var start = (consumed >> 3).toInt
      if (start + len > in.length) bad()
      System.arraycopy(in, start, dst, off, len)
      consumed += len.toLong * 8
      // resync the look-ahead buffer past the copied region
      start += len
      buf = 0L; cnt = 0; pos = start
    }

    def atEnd: Boolean = consumed == in.length.toLong * 8
  }

  // ---- canonical prefix codes (§3) ---------------------------------------

  /** One decoded prefix code: an 8-bit root table with second-level
    * sub-tables for codes longer than 8 bits (the standard canonical-code
    * construction — bounded memory even for adversarial 15-bit codes,
    * single lookup on the hot path). Entry layout: (bits << 16) | value;
    * root entries for long codes store (rootBits + subBits, subtable base). */
  private final class Prefix(val tab: Array[Int]) {
    def decode(br: BitReader): Int = {
      var e = tab(br.peek(8))
      var bits = e >>> 16
      if (bits > 8) {
        br.drop(8)
        e = tab((e & 0xffff) + br.peek(bits - 8))
        bits = e >>> 16
      }
      br.drop(bits)
      e & 0xffff
    }
  }

  private val Root = 8
  private val MaxLen = 15

  private def nextKey(key: Int, len: Int): Int = {
    var step = 1 << (len - 1)
    while ((key & step) != 0) step >>= 1
    (key & (step - 1)) + step
  }

  /** Build the two-level table from code lengths (0 = absent). The code
    * must be COMPLETE (Kraft sum exactly 1) unless exactly one symbol is
    * present (then a 0-bit code). */
  private def buildPrefix(lengths: Array[Int]): Prefix = {
    val count = new Array[Int](MaxLen + 1)
    var nSym = 0
    var single = -1
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > MaxLen) bad()
      if (l > 0) { count(l) += 1; nSym += 1; single = i }
      i += 1
    }
    if (nSym == 0) bad()
    if (nSym == 1) {
      val t = new Array[Int](256)
      java.util.Arrays.fill(t, single) // bits = 0
      return new Prefix(t)
    }
    // completeness check (32768 = 2^15 of code space)
    var space = 0L
    var l = 1
    while (l <= MaxLen) { space += count(l).toLong << (MaxLen - l); l += 1 }
    if (space != (1 << MaxLen)) bad()
    // symbols in canonical order: increasing length, ties by symbol value
    val offsets = new Array[Int](MaxLen + 2)
    l = 1
    while (l <= MaxLen) { offsets(l + 1) = offsets(l) + count(l); l += 1 }
    val sorted = new Array[Int](nSym)
    val fillIdx = offsets.clone()
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { sorted(fillIdx(lengths(i))) = i; fillIdx(lengths(i)) += 1 }
      i += 1
    }
    // total size: root + one subtable per distinct long-code root prefix
    // (each subtable at most 2^(15-8) entries; the number of long-code
    // root slots is the long codes' total code space / 2^(15-8))
    val totalSize = {
      var left = 0
      var ln = Root + 1
      while (ln <= MaxLen) { left += count(ln) << (MaxLen - ln); ln += 1 }
      256 + ((left >> (MaxLen - Root)) << (MaxLen - Root))
    }
    val tab = new Array[Int](totalSize)
    var key = 0
    var symIdx = 0
    var len = 1
    while (len <= Root) {
      var c = count(len)
      while (c > 0) {
        val e = (len << 16) | sorted(symIdx)
        symIdx += 1
        var idx = key
        while (idx < 256) { tab(idx) = e; idx += 1 << len }
        key = nextKey(key, len)
        c -= 1
      }
      len += 1
    }
    // second level: subtable sizes derive from the REMAINING counts (codes
    // not yet placed — the current one included), exactly the canonical
    // construction; using total counts would undersize a subtable whose
    // prefix-mates were already placed, and the longest (rarest) codes
    // would then alias to the wrong symbol
    val remaining = count.clone()
    var subBase = 256
    var low = -1
    var subBits = 0
    len = Root + 1
    while (len <= MaxLen) {
      var c = count(len)
      while (c > 0) {
        if ((key & 0xff) != low) {
          low = key & 0xff
          subBits = {
            var left = 1 << (len - Root)
            var ln = len
            var break = false
            while (!break && ln < MaxLen) {
              left -= remaining(ln)
              if (left <= 0) break = true
              else { ln += 1; left <<= 1 }
            }
            ln - Root
          }
          tab(low) = ((Root + subBits) << 16) | subBase
          subBase += 1 << subBits
        }
        val e = ((len - Root) << 16) | sorted(symIdx)
        symIdx += 1
        remaining(len) -= 1
        val base = tab(low) & 0xffff
        var idx = key >> Root
        while (idx < (1 << subBits)) { tab(base + idx) = e; idx += 1 << (len - Root) }
        key = nextKey(key, len)
        c -= 1
      }
      len += 1
    }
    new Prefix(tab)
  }

  /** Read one prefix-code description (§3.4/§3.5) over `alphabetSize`. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): Prefix = {
    val alphaBits = 32 - Integer.numberOfLeadingZeros(alphabetSize - 1)
    val hskip = br.readBits(2)
    if (hskip == 1) {
      // simple code: 1..4 explicit symbols
      val nSym = br.readBits(2) + 1
      val syms = new Array[Int](nSym)
      var i = 0
      while (i < nSym) {
        val s = br.readBits(alphaBits)
        if (s >= alphabetSize) bad()
        syms(i) = s
        i += 1
      }
      // distinctness required; code lengths attach to the symbols IN THE
      // ORDER READ (the stream lists them most-frequent first) — only
      // symbols of EQUAL length are value-ordered, which buildPrefix's
      // canonical (length, symbol) sort already does. A full value sort
      // here would misassign the asymmetric 1,2,2 / 1,2,3,3 length sets.
      i = 0
      while (i < nSym) {
        var j = i + 1
        while (j < nSym) { if (syms(i) == syms(j)) bad(); j += 1 }
        i += 1
      }
      val lengths = new Array[Int](alphabetSize)
      nSym match {
        case 1 => lengths(syms(0)) = 1 // rebuilt as 0-bit by buildPrefix
        case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case 4 =>
          if (br.readBits(1) == 0) syms.foreach(s => lengths(s) = 2)
          else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      if (nSym == 1) {
        val t = new Array[Int](256)
        java.util.Arrays.fill(t, syms(0))
        return new Prefix(t)
      }
      return buildPrefix(lengths)
    }
    // complex code: first the code-length code (18 symbols, fixed VLC)
    val clcLengths = new Array[Int](18)
    var space = 32
    var numCodes = 0
    var i = hskip
    while (i < 18 && space > 0) {
      val k = br.peek(4)
      br.drop(ClcLen(k))
      val v = ClcValue(k)
      clcLengths(CodeLengthOrder(i)) = v
      if (v != 0) { space -= 32 >> v; numCodes += 1 }
      i += 1
    }
    if (!(numCodes == 1 || space == 0)) bad()
    val clc = buildPrefix(clcLengths)
    // then the actual code lengths with 16/17 repeat semantics
    val lengths = new Array[Int](alphabetSize)
    var symbol = 0
    var prevLen = 8
    var repeat = 0
    var repeatLen = 0
    var space2 = 1 << MaxLen
    while (symbol < alphabetSize && space2 > 0) {
      val cl = clc.decode(br)
      if (cl < 16) {
        repeat = 0
        lengths(symbol) = cl
        symbol += 1
        if (cl != 0) { prevLen = cl; space2 -= (1 << MaxLen) >> cl }
      } else {
        val extra = if (cl == 16) 2 else 3
        val newLen = if (cl == 16) prevLen else 0
        if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
        val oldRepeat = repeat
        if (repeat > 0) { repeat -= 2; repeat <<= extra }
        repeat += br.readBits(extra) + 3
        val delta = repeat - oldRepeat
        if (symbol + delta > alphabetSize) bad()
        var j = 0
        while (j < delta) { lengths(symbol) = repeatLen; symbol += 1; j += 1 }
        if (repeatLen != 0) space2 -= delta << (MaxLen - repeatLen)
      }
    }
    if (space2 != 0) bad()
    buildPrefix(lengths)
  }

  // ---- variable-length integers ------------------------------------------

  /** §9.2 block-type counts / context-tree counts: 1..256. */
  private def readVarLenUint8(br: BitReader): Int =
    if (br.readBits(1) == 0) 1
    else {
      val n = br.readBits(3)
      if (n == 0) 2 else (1 << n) + br.readBits(n) + 1
    }

  /** §9.1 WBITS. */
  private def readWindowBits(br: BitReader): Int = {
    if (br.readBits(1) == 0) return 16
    var n = br.readBits(3)
    if (n != 0) return 17 + n
    n = br.readBits(3)
    if (n == 0) 17
    else if (n == 1) bad() // reserved in RFC 7932
    else 8 + n // 10..15
  }

  // ---- context maps (§7.3) ----------------------------------------------

  private def readContextMap(br: BitReader, size: Int,
      numTrees: Int): Array[Byte] = {
    val map = new Array[Byte](size)
    if (numTrees == 1) return map
    val rleMax = if (br.readBits(1) == 1) br.readBits(4) + 1 else 0
    val code = readPrefixCode(br, numTrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = code.decode(br)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        val reps = (1 << sym) + br.readBits(sym)
        if (i + reps > size) bad()
        i += reps // zeros already there
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (br.readBits(1) == 1) inverseMoveToFront(map)
    var j = 0
    while (j < size) { if ((map(j) & 0xff) >= numTrees) bad(); j += 1 }
    map
  }

  private def inverseMoveToFront(v: Array[Byte]): Unit = {
    val mtf = new Array[Byte](256)
    var i = 0
    while (i < 256) { mtf(i) = i.toByte; i += 1 }
    i = 0
    while (i < v.length) {
      val idx = v(i) & 0xff
      val value = mtf(idx)
      var j = idx
      while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
      mtf(0) = value
      v(i) = value
      i += 1
    }
  }

  // ---- dictionary word transforms (§8) -----------------------------------

  /** §8 "ferment": uppercase one position of a (possibly multi-byte) UTF-8
    * character; returns the number of bytes covered. */
  private def fermentAt(b: Array[Byte], off: Int, end: Int): Int = {
    val c = b(off) & 0xff
    if (c < 192) {
      if (c >= 'a' && c <= 'z') b(off) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (off + 1 < end) b(off + 1) = (b(off + 1) ^ 32).toByte
      2
    } else {
      if (off + 2 < end) b(off + 2) = (b(off + 2) ^ 5).toByte
      3
    }
  }

  /** Apply transform `t` to the dictionary word at dict[wordOff, len);
    * append to `out` at `pos`; returns the new position. `out` must have
    * room for len + 13 (max prefix 5 + max suffix 8 fits; checked by
    * caller against the output bound). */
  private def applyTransform(t: Int, wordOff: Int, len: Int,
      out: Array[Byte], pos0: Int): Int = {
    var pos = pos0
    val pre = transformPrefix(t)
    System.arraycopy(pre, 0, out, pos, pre.length)
    pos += pre.length
    val op = transformOp(t)
    var wOff = wordOff
    var wLen = len
    if (op >= 12) { val n = op - 11; wOff += math.min(n, wLen); wLen -= math.min(n, wLen) }
    else if (op >= 1 && op <= 9) wLen -= math.min(op, wLen)
    val wordStart = pos
    System.arraycopy(Dictionary, wOff, out, pos, wLen)
    pos += wLen
    if (op == 10) { if (wLen > 0) fermentAt(out, wordStart, pos) }
    else if (op == 11) {
      var i = wordStart
      while (i < pos) i += fermentAt(out, i, pos)
    }
    val suf = transformSuffix(t)
    System.arraycopy(suf, 0, out, pos, suf.length)
    pos + suf.length
  }

  // ---- the decoder --------------------------------------------------------

  /** Max bytes a transformed dictionary word can add beyond the raw word:
    * longest transform prefix + suffix in Appendix B is well under this. */
  private val MaxTransformGrowth = 32

  /**
   * Decompress a complete Brotli stream. Returns null on ANY malformed
   * input, on output exceeding `maxOutput`, or on trailing garbage after
   * the final meta-block — the crawl-ingest drop contract.
   */
  def decompress(input: Array[Byte], maxOutput: Int): Array[Byte] =
    try decode(input, maxOutput)
    catch {
      case _: Malformed => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }

  /** Test-only: decode WITHOUT the null-on-malformed wrapper, so specs can
    * see which check rejected a stream (pair with [[debugTrace]]). */
  private[graft] def decompressOrThrow(input: Array[Byte],
      maxOutput: Int): Array[Byte] = decode(input, maxOutput)

  private def decode(input: Array[Byte], maxOutput: Int): Array[Byte] = {
    if (input.length == 0) bad()
    val br = new BitReader(input)
    val wbits = readWindowBits(br)
    val windowSize = (1 << wbits) - 16

    var out = new Array[Byte](math.max(64,
      math.min(math.min(input.length.toLong * 4, 1L << 20), maxOutput.toLong).toInt))
    var pos = 0
    def ensure(extra: Int): Unit = {
      if (extra < 0 || pos.toLong + extra > maxOutput) bad()
      if (pos + extra > out.length) {
        val doubled = math.min(out.length.toLong * 2, maxOutput.toLong).toInt
        out = java.util.Arrays.copyOf(out, math.max(doubled, pos + extra))
      }
    }

    // distance ring (§4): most recent first; initial values per the spec
    var d1 = 4; var d2 = 11; var d3 = 15; var d4 = 16
    var p1 = 0; var p2 = 0 // last two output bytes (context, §7.1)

    var isLast = false
    while (!isLast) {
      isLast = br.readBits(1) == 1
      if (isLast && br.readBits(1) == 1) {
        // ISLASTEMPTY
        br.jumpToByteBoundary(checkZero = true)
        if (!br.atEnd) bad()
        return java.util.Arrays.copyOf(out, pos)
      }
      val mnibbles = br.readBits(2)
      if (mnibbles == 3) {
        // metadata meta-block (§9.2): skipped, content-free
        if (br.readBits(1) != 0) bad() // reserved
        val skipBytes = br.readBits(2)
        var skipLen = 0
        var i = 0
        while (i < skipBytes) {
          val b = br.readBits(8)
          if (i + 1 == skipBytes && skipBytes > 1 && b == 0) bad()
          skipLen |= b << (8 * i)
          i += 1
        }
        if (skipBytes > 0) skipLen += 1
        br.jumpToByteBoundary(checkZero = true)
        var left = skipLen
        val junk = new Array[Byte](math.min(left, 1 << 16))
        while (left > 0) {
          val n = math.min(left, junk.length)
          br.copyBytes(junk, 0, n)
          left -= n
        }
      } else {
        val nibbles = 4 + mnibbles
        val lenBits = br.readBits(nibbles * 4)
        if (nibbles > 4 && (lenBits >> ((nibbles - 1) * 4)) == 0) bad()
        var mlen = lenBits + 1
        val uncompressed = !isLast && br.readBits(1) == 1
        if (uncompressed) {
          br.jumpToByteBoundary(checkZero = false)
          ensure(mlen)
          br.copyBytes(out, pos, mlen)
          pos += mlen
          p1 = out(pos - 1) & 0xff
          p2 = if (pos > 1) out(pos - 2) & 0xff else 0
        } else {
          // ---- meta-block header (§9.3) ----
          val nbl = new Array[Int](3)
          val btypeTree = new Array[Prefix](3)
          val blenTree = new Array[Prefix](3)
          val blockLen = new Array[Int](3)
          val btype = new Array[Int](3)
          val prevBtype = new Array[Int](3)
          var cat = 0
          while (cat < 3) {
            nbl(cat) = readVarLenUint8(br)
            btype(cat) = 0
            prevBtype(cat) = 1
            if (nbl(cat) >= 2) {
              btypeTree(cat) = readPrefixCode(br, nbl(cat) + 2)
              blenTree(cat) = readPrefixCode(br, 26)
              val s = blenTree(cat).decode(br)
              blockLen(cat) = BlockLenOffset(s) + br.readBits(BlockLenBits(s))
            } else blockLen(cat) = Int.MaxValue
            cat += 1
          }
          def switchBlock(c: Int): Unit = {
            val sym = btypeTree(c).decode(br)
            val nt =
              if (sym == 0) prevBtype(c)
              else if (sym == 1) (btype(c) + 1) % nbl(c)
              else sym - 2
            prevBtype(c) = btype(c)
            btype(c) = nt
            val s = blenTree(c).decode(br)
            blockLen(c) = BlockLenOffset(s) + br.readBits(BlockLenBits(s))
          }
          val npostfix = br.readBits(2)
          val ndirect = br.readBits(4) << npostfix
          val contextModes = new Array[Int](nbl(0))
          var i = 0
          while (i < nbl(0)) { contextModes(i) = br.readBits(2); i += 1 }
          val ntreesL = readVarLenUint8(br)
          val litCmap = readContextMap(br, nbl(0) * 64, ntreesL)
          val ntreesD = readVarLenUint8(br)
          val distCmap = readContextMap(br, nbl(2) * 4, ntreesD)
          val litTrees = Array.fill(ntreesL)(readPrefixCode(br, 256))
          val cmdTrees = Array.fill(nbl(1))(readPrefixCode(br, 704))
          val distAlphabet = 16 + ndirect + (48 << npostfix)
          val distTrees = Array.fill(ntreesD)(readPrefixCode(br, distAlphabet))

          // ---- command loop (§9.3) ----
          var ctxBase = contextModes(0) << 9
          while (mlen > 0) {
            if (blockLen(1) == 0) switchBlock(1)
            blockLen(1) -= 1
            val cmd = cmdTrees(btype(1)).decode(br)
            val cell = cmd >>> 6
            val insCode = CellInsOff(cell) + ((cmd >>> 3) & 7)
            val copyCode = CellCopyOff(cell) + (cmd & 7)
            val implicitD0 = cell < 2
            var insLen = InsBase(insCode) + br.readBits(InsExtra(insCode))
            val copyLen = CopyBase(copyCode) + br.readBits(CopyExtra(copyCode))
            if (insLen > mlen) bad()
            mlen -= insLen
            // literals
            ensure(insLen)
            while (insLen > 0) {
              if (blockLen(0) == 0) {
                switchBlock(0)
                ctxBase = contextModes(btype(0)) << 9
              }
              blockLen(0) -= 1
              val tree =
                if (ntreesL == 1) litTrees(0)
                else {
                  val ctx = (ContextLut(ctxBase + p1) |
                    ContextLut(ctxBase + 256 + p2)) & 0xff
                  litTrees(litCmap((btype(0) << 6) + ctx) & 0xff)
                }
              val b = tree.decode(br)
              out(pos) = b.toByte
              pos += 1
              p2 = p1
              p1 = b
              insLen -= 1
            }
            if (mlen > 0) {
              // distance
              var dcode = 0
              if (!implicitD0) {
                if (blockLen(2) == 0) switchBlock(2)
                blockLen(2) -= 1
                val distCtx = math.min(copyLen - 2, 3)
                val tree =
                  if (ntreesD == 1) distTrees(0)
                  else distTrees(distCmap((btype(2) << 2) + distCtx) & 0xff)
                dcode = tree.decode(br)
              }
              var distance = 0
              if (dcode == 0) distance = d1
              else if (dcode < 16) {
                distance = dcode match {
                  case 1 => d2
                  case 2 => d3
                  case 3 => d4
                  case 4 => d1 - 1
                  case 5 => d1 + 1
                  case 6 => d1 - 2
                  case 7 => d1 + 2
                  case 8 => d1 - 3
                  case 9 => d1 + 3
                  case 10 => d2 - 1
                  case 11 => d2 + 1
                  case 12 => d2 - 2
                  case 13 => d2 + 2
                  case 14 => d2 - 3
                  case _ => d2 + 3
                }
                if (distance <= 0) bad()
              } else if (dcode < 16 + ndirect) {
                distance = dcode - 16 + 1
              } else {
                val x = dcode - ndirect - 16
                val postfix = x & ((1 << npostfix) - 1)
                val hcode = x >>> npostfix
                val ndistbits = 1 + (hcode >>> 1)
                val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                distance = ((offset + br.readBits(ndistbits)) << npostfix) +
                  postfix + ndirect + 1
              }
              val maxDist = math.min(pos, windowSize)
              if (distance <= maxDist) {
                // back-reference (overlap-safe byte copy)
                if (copyLen > mlen) bad()
                mlen -= copyLen
                ensure(copyLen)
                var src = pos - distance
                var n = copyLen
                while (n > 0) { out(pos) = out(src); pos += 1; src += 1; n -= 1 }
                p1 = out(pos - 1) & 0xff
                p2 = if (pos > 1) out(pos - 2) & 0xff else 0
                // the ring updates for every non-zero distance code (§4);
                // code 0 ("reuse last") leaves it untouched
                if (dcode != 0) { d4 = d3; d3 = d2; d2 = d1; d1 = distance }
              } else {
                // static dictionary reference (§8)
                if (copyLen < 4 || copyLen > 24) bad()
                val wordId = distance - maxDist - 1
                val shift = DictSizeBits(copyLen)
                val index = wordId & ((1 << shift) - 1)
                val t = wordId >>> shift
                if (t > 120) bad()
                ensure(copyLen + MaxTransformGrowth)
                val newPos = applyTransform(t,
                  DictOffsets(copyLen) + index * copyLen, copyLen, out, pos)
                val produced = newPos - pos
                if (produced > mlen) bad()
                mlen -= produced
                pos = newPos
                if (pos > 0) p1 = out(pos - 1) & 0xff
                if (pos > 1) p2 = out(pos - 2) & 0xff
                // ring NOT updated for dictionary references (§8)
              }
            }
          }
        }
      }
    }
    br.jumpToByteBoundary(checkZero = true)
    if (!br.atEnd) bad()
    java.util.Arrays.copyOf(out, pos)
  }
}
