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
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(base)
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
    spark.stop()
  }
}
