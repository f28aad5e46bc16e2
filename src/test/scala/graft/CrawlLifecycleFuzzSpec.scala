package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.CrawlIngest

/**
 * Lifecycle fuzz for the crawl bridge — the [[LifecycleFuzzSpec]]
 * discipline applied to the ingestion front door: a seeded random sequence
 * of {new segment, full replay, torn replay, tiered dedup fold} steps with
 * the exactly-once invariant checked after every step: every fresh text
 * ever introduced appears in the documents table EXACTLY once (replays
 * must not duplicate it, near-dup reintroductions must not re-land it,
 * folds must not forget it).
 *
 * Torn replays only target the most recent batch while it is still
 * unfolded: a marker deletion simulates a crash BEFORE the marker commit,
 * and a fold can only have consumed marked batches — deleting a folded
 * batch's marker would fabricate a state no crash can produce.
 */
class CrawlLifecycleFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(uri: String, text: String): Array[Byte] = {
    val p = s"<html><body><p>$text</p></body></html>".getBytes(UTF_8)
    val h = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-05-06T07:08:09Z\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(UTF_8)
    h ++ p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def revisitRec(uri: String, digest: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: revisit\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-05-06T07:08:09Z\r\n" +
      s"WARC-Payload-Digest: $digest\r\n" +
      "Content-Type: application/http\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)

  private def writeSegment(path: java.io.File,
      recs: Seq[Array[Byte]]): Unit = {
    val out = new java.io.FileOutputStream(path)
    recs.foreach { r =>
      val g = new GZIPOutputStream(out); g.write(r); g.finish()
    }
    out.close()
  }

  // quality-passing, pairwise-distinct texts: 45 hash-picked tokens per id
  // (the CrawlProbe generator) — two distinct ids share only the vocab's
  // base rate of shingles, far below the near-dup threshold
  private val vocab = Array("system", "value", "result", "measure", "test",
    "window", "stable", "under", "load", "remains", "shows", "that",
    "the", "a", "of", "in", "and", "is", "to", "with", "for", "on",
    "signal", "batch", "stream", "record", "segment", "quality", "gate",
    "probe", "index", "corpus", "stays", "bounded", "linear", "flat")

  private def freshText(n: Int): String =
    (0 until 45).map { i =>
      vocab(math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(s"fuzz:$n:$i"), vocab.length))
    }.mkString(" ")

  // seed overridable for local sweeps (env — sbt's forked test JVM
  // inherits the environment but not launcher -D flags):
  //   GRAFT_FUZZ_SEED=7 sbt 'testOnly graft.CrawlLifecycleFuzzSpec'
  private val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(12L)

  test(s"crawl bridge lifecycle fuzz: 25 seeded steps keep exactly-once (seed=$seed)") {
    val base = new java.io.File("/tmp/graft_test_crawl_fuzz")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(base)
    val segs = new java.io.File(base, "segments"); segs.mkdirs()
    val docsPath = s"$base/documents"
    val dedupPath = s"$base/dedup_index"
    val revPath = s"$base/revisits"
    Dedup.buildDedupIndex(Seq((0L, freshText(999)))
      .toDF("doc_id", "text"), "doc_id", "text", dedupPath)

    val rnd = new scala.util.Random(seed)
    var nextText = 0
    var nextBatch = 0L
    var introduced = Vector.empty[String] // unique fresh texts, in order
    var revIntroduced = Vector.empty[String] // unique revisit urls, in order
    var lastBatch: Option[(String, Long)] = None // (segment path, batchId)
    var lastBatchFolded = true
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(docsPath).getFileSystem(conf)

    def checkInvariant(step: Int): Unit = {
      val landed = spark.read.parquet(docsPath)
        .groupBy($"text").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      introduced.foreach { t =>
        assert(landed.getOrElse(t, 0L) == 1L,
          s"step $step: text '${t.take(40)}…' count=${landed.getOrElse(t, 0L)}")
      }
      assert(landed.size == introduced.size,
        s"step $step: ${landed.size} landed texts vs ${introduced.size} introduced")
      // the revisit LEDGER holds the same exactly-once invariant: every
      // revisit record ever ingested appears once, whatever replays/tears
      // happened (urls are unique per record by construction)
      if (revIntroduced.nonEmpty) {
        val ledger = spark.read.parquet(revPath)
          .groupBy($"url").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        revIntroduced.foreach { u =>
          assert(ledger.getOrElse(u, 0L) == 1L,
            s"step $step: revisit '$u' count=${ledger.getOrElse(u, 0L)}")
        }
        assert(ledger.size == revIntroduced.size,
          s"step $step: ${ledger.size} ledger urls vs ${revIntroduced.size}")
      }
    }

    (0 until 25).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // new segment: 1-3 fresh docs + maybe a reintroduction
          val n = 1 + rnd.nextInt(3)
          val fresh = (0 until n).map { _ =>
            val t = freshText(nextText); nextText += 1; t
          }
          val reintro = if (introduced.nonEmpty && rnd.nextBoolean())
            Seq(introduced(rnd.nextInt(introduced.size))) else Seq.empty
          val texts = rnd.shuffle(fresh ++ reintro)
          // 0-2 revisit records ride along in the same segment — the
          // crawler's dedup verdicts, landed into the fifth store
          val nRev = rnd.nextInt(3)
          val revUrls = (0 until nRev)
            .map(i => s"http://fuzz.test/rev/$nextBatch/$i")
          val f = new java.io.File(segs, f"seg-$nextBatch%05d.warc.gz")
          writeSegment(f, texts.zipWithIndex.map { case (t, i) =>
            rec(s"http://fuzz.test/$nextBatch/$i", t)
          } ++ revUrls.map(u => revisitRec(u, s"sha1:D$nextBatch")))
          CrawlIngest.ingestSegments(spark, Seq(f.getAbsolutePath),
            docsPath, dedupPath, nextBatch, revisitsPath = Some(revPath))
          introduced = introduced ++ fresh
          revIntroduced = revIntroduced ++ revUrls
          lastBatch = Some((f.getAbsolutePath, nextBatch))
          lastBatchFolded = false
          nextBatch += 1
        case 2 => // replay (possibly torn) of the newest unfolded batch
          lastBatch.foreach { case (seg, id) =>
            if (!lastBatchFolded) {
              // randomly tear zero, one, or more markers — a crash between
              // the appends and their marker commits
              if (rnd.nextBoolean())
                fs.delete(new org.apache.hadoop.fs.Path(
                  s"$docsPath/_stream/b$id"), false)
              if (rnd.nextBoolean())
                fs.delete(new org.apache.hadoop.fs.Path(
                  s"$dedupPath/_stream/b${Dedup.STREAM_BATCH_BASE + id}"),
                  false)
              if (rnd.nextBoolean())
                fs.delete(new org.apache.hadoop.fs.Path(
                  s"$revPath/_stream/b$id"), false)
            }
            CrawlIngest.ingestSegments(spark, Seq(seg), docsPath,
              dedupPath, id, revisitsPath = Some(revPath))
          }
        case 3 => // tiered fold of the dedup index (marked batches only)
          Dedup.compactDedupIndex(spark, dedupPath, tiered = true)
          lastBatchFolded = true
      }
      if (introduced.nonEmpty) checkInvariant(step)
    }
    assert(introduced.size >= 15, s"fuzz too shallow: ${introduced.size}")
  }
}
