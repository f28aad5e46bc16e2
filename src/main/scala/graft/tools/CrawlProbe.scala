package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.streaming.CrawlIngest

/**
 * Measures the streaming crawl bridge's cost shape (SCALING.md): the
 * 100 TB claim under test is that a micro-batch costs O(batch) — parse +
 * quality gate + banded dedup probe + two bounded appends — INDEPENDENT of
 * how much corpus has already been ingested. Two probes:
 *
 *  1. corpus-independence: W successive segments of the same size ingest
 *     through the same bridge; per-batch wall time must stay flat while
 *     the stored dedup index grows W-fold.
 *  2. per-doc scaling: one segment at 4x the docs should cost ~4x (parse
 *     and probe are linear in batch size), not 16x.
 *
 *   sbt 'runMain graft.tools.CrawlProbe'
 */
object CrawlProbe {

  /** Deterministic synthetic crawl doc: ~45 tokens of hash-picked vocab
    * with enough stopwords/alpha to clear the quality gate, unique enough
    * (doc id salts every pick) to not near-dup across docs. */
  private val vocab = Array("system", "value", "result", "measure", "test",
    "window", "stable", "under", "load", "remains", "shows", "that",
    "the", "a", "of", "in", "and", "is", "to", "with", "for", "on",
    "signal", "batch", "stream", "record", "segment", "quality", "gate",
    "probe", "index", "corpus", "stays", "bounded", "linear", "flat")

  private def docText(id: Long): String =
    (0 until 45).map { i =>
      vocab(math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(s"$id:$i"), vocab.length))
    }.mkString(" ")

  private def rec(uri: String, text: String): Array[Byte] = {
    val p = s"<html><body><p>$text</p></body></html>".getBytes(UTF_8)
    val h = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-05-06T07:08:09Z\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(UTF_8)
    h ++ p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def writeSegment(path: java.io.File, lo: Long, n: Int): Unit = {
    val out = new java.io.FileOutputStream(path)
    (0 until n).foreach { i =>
      val g = new GZIPOutputStream(out)
      g.write(rec(s"http://probe.test/${lo + i}", docText(lo + i)))
      g.finish()
    }
    out.close()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = new java.io.File("/tmp/graft_crawl_probe")
    graft.tools.LocalFs.deleteRec(base)
    val segs = new java.io.File(base, "segments"); segs.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    Dedup.buildDedupIndex(Seq((0L, docText(1L << 40))).toDF("doc_id", "text"),
      "doc_id", "text", dedupPath)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // probe 1: W same-size waves — per-batch cost vs grown corpus
    val perDoc = 500
    val waves = 8
    println(s"[crawl] wave size=$perDoc docs/segment, $waves waves")
    (0 until waves).foreach { w =>
      val f = new java.io.File(segs, f"seg-$w%05d.warc.gz")
      writeSegment(f, w.toLong * perDoc + 1, perDoc)
      val t = timed(CrawlIngest.ingestSegments(spark, Seq(f.getAbsolutePath),
        docsPath, dedupPath, w.toLong))
      val corpus = spark.read.parquet(docsPath).count()
      println(f"[crawl] wave=$w t=$t%.2fs corpus=$corpus")
    }

    // probe 2: one 4x segment — per-doc linearity
    val big = new java.io.File(segs, "seg-big.warc.gz")
    writeSegment(big, 1L << 30, perDoc * 4)
    val tBig = timed(CrawlIngest.ingestSegments(spark,
      Seq(big.getAbsolutePath), docsPath, dedupPath, 100L))
    println(f"[crawl] big segment (${perDoc * 4} docs) t=$tBig%.2fs")

    // probe 4 (runs before 3 to reuse the warm session): segment-parallel
    // batches — 8 segments in ONE micro-batch vs the 8 single-segment
    // waves above. binaryFiles gives one task per segment, so the parse/
    // extract/quality work fans out across cores and the batch costs far
    // less than 8x a single wave (the fixed per-batch overhead amortizes) —
    // the shape a real trigger (maxFilesPerTrigger segments) runs at.
    val wideSegs = (0 until 8).map { i =>
      val f = new java.io.File(segs, f"wide-$i%05d.warc.gz")
      writeSegment(f, (100L + i) * perDoc + 1, perDoc)
      f.getAbsolutePath
    }
    val tWide = timed(CrawlIngest.ingestSegments(spark, wideSegs,
      docsPath, dedupPath, 200L))
    println(f"[crawl] 8-segment batch (${8 * perDoc} docs) t=$tWide%.2fs")

    // probe 3: raw decode throughput of the explicit-framing gzip reader
    // vs the JDK reader on the same multi-member bytes — the hand-rolled
    // framing must not tax the decode (both bottleneck on Inflater)
    val bytes = java.nio.file.Files.readAllBytes(big.toPath)
    def drainAll(mk: () => java.io.InputStream): (Double, Long) = {
      var total = 0L
      val t = timed {
        (0 until 5).foreach { _ =>
          val in = mk(); val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { total += n; n = in.read(buf) }
          in.close()
        }
      }
      (t, total)
    }
    drainAll(() => new graft.sources.WarcSource.MultiMemberGzipInputStream(
      new java.io.ByteArrayInputStream(bytes))) // JIT warm-up
    val (tOurs, nOurs) = drainAll(() =>
      new graft.sources.WarcSource.MultiMemberGzipInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    val (tJdk, nJdk) = drainAll(() => new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16))
    require(nOurs == nJdk, s"decoded byte counts diverged: $nOurs vs $nJdk")
    println(f"[crawl] gzip decode: ours=${nOurs / tOurs / 1e6}%.0f MB/s " +
      f"jdk=${nJdk / tJdk / 1e6}%.0f MB/s (${nOurs / 5} bytes/pass)")
    spark.stop()
  }
}
