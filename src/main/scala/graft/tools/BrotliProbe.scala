package graft.tools

import graft.functions.BrotliKernel

/**
 * Decode-throughput probe for [[graft.functions.BrotliKernel]] — the
 * number that matters at 100 TB is decompressed MB/s per core on
 * crawl-shaped payloads (br appears on a large share of modern web
 * responses, so this sits directly on the ingest hot path beside the
 * gzip segment reader, whose own sentinel is ~88 MB/s on this host).
 *
 * Method: embedded representative payloads (HTML page ×64, English text,
 * binary ints) compressed at q5/q11 by libbrotli at vector-generation
 * time live in the committed BrotliSpec corpus; here we re-load that
 * corpus, warm up, then time repeated decodes and report MIN-pass
 * throughput (the standard low-noise estimator used by the other probes).
 */
object BrotliProbe {
  def main(args: Array[String]): Unit = {
    // the corpus lives in TEST resources (it pins BrotliSpec); the probe
    // reads it from the checkout
    val path = Seq("src/test/resources/brotli/vectors.bin.gz",
      "/root/repo/src/test/resources/brotli/vectors.bin.gz")
      .find(p => new java.io.File(p).isFile)
      .getOrElse(sys.error("vectors.bin.gz not found"))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(path), 1 << 16)
    val data = {
      val out = new java.io.ByteArrayOutputStream(1 << 24)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
    val bb = java.nio.ByteBuffer.wrap(data)
    val vectors = (0 until bb.getInt()).map { _ =>
      val rawLen = bb.getInt(); val compLen = bb.getInt()
      val raw = new Array[Byte](rawLen); bb.get(raw)
      val comp = new Array[Byte](compLen); bb.get(comp)
      (raw, comp)
    }
    // the big text/html/binary payloads only — tiny vectors measure call
    // overhead, not decode speed
    val big = vectors.filter(_._1.length >= 65536)
    println(s"[brotli-probe] ${big.size} payloads, " +
      s"${big.map(_._1.length.toLong).sum / (1 << 20)} MiB raw")
    var best = 0.0
    (0 until 5).foreach { pass =>
      val t0 = System.nanoTime()
      var bytes = 0L
      big.foreach { case (raw, comp) =>
        val got = BrotliKernel.decompress(comp, 64 << 20)
        require(got != null && got.length == raw.length)
        bytes += got.length
      }
      val mbps = bytes / 1e6 / ((System.nanoTime() - t0) / 1e9)
      if (mbps > best) best = mbps
      println(f"[brotli-probe] pass $pass: $mbps%.1f MB/s decompressed")
    }
    println(f"[brotli-probe] best: $best%.1f MB/s")
  }
}
