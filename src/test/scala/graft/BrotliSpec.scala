package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BrotliKernel

/**
 * Pins [[graft.functions.BrotliKernel]] — the pure-Scala RFC 7932 decoder —
 * against 225 vectors produced by an INDEPENDENT implementation
 * (libbrotli, via `dev/brotli/gen_vectors.py`) across qualities 0–11,
 * windows 10–24, generic/text modes, and payloads from empty through
 * 1 MiB of text/HTML/UTF-8/binary/random bytes. The random payloads force
 * UNCOMPRESSED meta-blocks; q10/q11 English leans on the static
 * dictionary, its 121 transforms and context modeling; q0/q1 exercise the
 * fast-path stream shapes.
 *
 * Robustness side: truncations and corruptions of valid streams plus
 * seeded random garbage must never throw, hang or over-allocate — the
 * kernel's null-on-malformed contract is what lets one hostile record on
 * the crawl ingest path fail alone instead of killing a segment task.
 */
class BrotliSpec extends AnyFunSuite {

  private lazy val vectors: Seq[(Array[Byte], Array[Byte])] = {
    val in = new java.util.zip.GZIPInputStream(
      getClass.getResourceAsStream("/brotli/vectors.bin.gz"), 1 << 16)
    val data = try {
      val out = new java.io.ByteArrayOutputStream(1 << 24)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    val bb = java.nio.ByteBuffer.wrap(data)
    val count = bb.getInt()
    (0 until count).map { _ =>
      val rawLen = bb.getInt()
      val compLen = bb.getInt()
      val raw = new Array[Byte](rawLen)
      bb.get(raw)
      val comp = new Array[Byte](compLen)
      bb.get(comp)
      (raw, comp)
    }
  }

  private val Cap = 64 << 20

  test("every libbrotli vector decodes byte-identically") {
    assert(vectors.size >= 200, s"vector corpus too small: ${vectors.size}")
    var failures = List.empty[String]
    vectors.zipWithIndex.foreach { case ((raw, comp), i) =>
      val got = BrotliKernel.decompress(comp, Cap)
      if (got == null)
        failures ::= s"vector $i (raw ${raw.length}, comp ${comp.length}): null"
      else if (!java.util.Arrays.equals(got, raw))
        failures ::= s"vector $i (raw ${raw.length}, comp ${comp.length}): " +
          s"got ${got.length} bytes, first diff at " +
          got.zip(raw).indexWhere(p => p._1 != p._2)
    }
    assert(failures.isEmpty,
      s"${failures.size}/${vectors.size} vectors failed:\n" +
        failures.take(10).mkString("\n"))
  }

  test("truncated streams return null, never throw") {
    // every strict prefix of a small vector + sampled prefixes of a large
    // one: the final meta-block can never complete, so all must be null
    val small = vectors.filter(v => v._2.length in (4 to 64)).head._2
    (0 until small.length).foreach { n =>
      assert(BrotliKernel.decompress(small.take(n), Cap) == null,
        s"prefix of $n/${small.length} bytes did not fail")
    }
    val big = vectors.maxBy(_._2.length)._2
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val n = rnd.nextInt(big.length)
      BrotliKernel.decompress(big.take(n), Cap) // must not throw
    }
  }

  private implicit final class InRange(private val v: Int) {
    def in(r: Range): Boolean = r.contains(v)
  }

  test("corrupted streams never throw or hang") {
    val rnd = new scala.util.Random(99)
    vectors.take(60).foreach { case (_, comp) =>
      val b = comp.clone()
      val idx = rnd.nextInt(b.length)
      b(idx) = (b(idx) ^ (1 << rnd.nextInt(8))).toByte
      BrotliKernel.decompress(b, Cap) // null or garbage — just no crash
    }
  }

  test("random garbage never throws") {
    val rnd = new scala.util.Random(2026)
    (0 until 500).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      BrotliKernel.decompress(b, Cap)
    }
    assert(BrotliKernel.decompress(Array.emptyByteArray, Cap) == null)
  }

  test("the output cap rejects, not truncates") {
    val (raw, comp) = vectors.filter(_._1.length > 10000).head
    assert(BrotliKernel.decompress(comp, raw.length - 1) == null,
      "over-cap output must yield null (zip-bomb defense)")
    val ok = BrotliKernel.decompress(comp, raw.length)
    assert(ok != null && ok.length == raw.length,
      "an exact-cap decode must succeed")
  }

  test("trailing garbage after the final meta-block is malformed") {
    val comp = vectors.filter(_._2.length in (4 to 64)).head._2
    assert(BrotliKernel.decompress(comp ++ Array[Byte](1), Cap) == null)
    assert(BrotliKernel.decompress(comp ++ Array[Byte](0, 0), Cap) == null)
  }
}
