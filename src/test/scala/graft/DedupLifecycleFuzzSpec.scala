package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/**
 * Seeded lifecycle fuzz for the STORED DEDUP INDEX — the third stored
 * artifact, same discipline as [[LifecycleFuzzSpec]] (ANN) and
 * [[TextLifecycleFuzzSpec]] (BM25): random interleavings of batch appends
 * (including a retried append under the SAME batch id — the
 * replace-by-batch-id idempotence shape), takedown tombstones, and
 * flat/tiered compactions, verified between steps.
 *
 * The invariants are chosen to be deterministic under MinHash estimation
 * noise (near-threshold pairs between RANDOM docs are the estimator's to
 * call, so the fuzz never asserts their absence):
 *  - an exact-copy probe of a LIVE corpus doc always self-matches at
 *    jaccard 1.0 (identical text => identical signature — LSH recall on
 *    exact dups is 1, the guarantee web-scale dedup leans on);
 *  - NO pair ever targets a tombstoned corpus id (takedowns mask
 *    immediately, compactions must not resurrect them);
 *  - every reported pair targets a live corpus doc at or above threshold.
 */
class DedupLifecycleFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seeded dedup-index fuzz: 25 random append/delete/compact steps keep the probe contract") {
    import spark.implicits._
    val path = "/tmp/graft_test_index/dedup_lifecycle_fuzz"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(path))

    // seed overridable for local sweeps (env; forked test JVMs inherit it):
    //   GRAFT_FUZZ_SEED=7 sbt 'testOnly graft.DedupLifecycleFuzzSpec'
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(42L))
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray", "yankee", "zulu")
    def doc(id: Long): String = {
      val r = new scala.util.Random(id * 2654435761L + 13)
      Seq.fill(6 + r.nextInt(10))(vocab(r.nextInt(vocab.length)))
        .mkString(" ")
    }
    val PROBE_BASE = 1000000L

    var live = Map.empty[Long, String]
    var nextId = 0L
    var nextBatch = 1L
    val init = (0L until 60L).map(i => i -> doc(i))
    nextId = 60L
    live = init.toMap
    Dedup.buildDedupIndex(init.toDF("doc_id", "text"), "doc_id", "text",
      path, shingleSize = 3, numHashes = 64, bands = 16)

    var deleted = Set.empty[Long]
    def verify(step: Int): Unit = if (live.nonEmpty) {
      // probe with exact copies of live docs AND of recently-deleted ones
      // (a taken-down doc's text may still live elsewhere — only the
      // tombstoned ID must stay invisible)
      val liveIds = rnd.shuffle(live.keys.toSeq.sorted).take(10)
      val delIds = rnd.shuffle(deleted.toSeq.sorted).take(3)
      val probes = (liveIds.map(id => (PROBE_BASE + id, live(id))) ++
        delIds.map(id => (PROBE_BASE + id, doc(id)))).toDF("doc_id", "text")
      val got = Dedup.nearDupAgainstDedupIndex(spark, path, probes,
          "doc_id", "text", threshold = 0.8)
        .collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"),
          r.getAs[Double]("jaccard")))
      got.foreach { case (_, cid, j) =>
        assert(live.contains(cid),
          s"step $step: pair targets non-live corpus doc $cid")
        assert(j >= 0.8, s"step $step: pair below threshold: $j")
      }
      liveIds.foreach { id =>
        assert(got.exists { case (b, c, j) =>
          b == PROBE_BASE + id && c == id && j == 1.0 },
          s"step $step: live doc $id lost its exact self-match")
      }
    }
    verify(0)

    var retryable: Option[(org.apache.spark.sql.DataFrame, Long)] = None
    (1 to 25).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append a stream micro-batch under the marker
          // protocol (the daily-crawl ingest shape)
          val n = 5 + rnd.nextInt(10)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            live += id -> doc(id)
            (id, live(id))
          }
          val df = rows.toDF("doc_id", "text")
          val bid = nextBatch; nextBatch += 1
          Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(df, bid)
          if (retryable.isEmpty || rnd.nextBoolean())
            retryable = Some((df, bid))
        case 2 => // the checkpoint REPLAY: re-run a committed batch id —
          // the marker must no-op it even after compactions folded the
          // original (a re-append would duplicate every pair row)
          retryable.foreach { case (df, bid) =>
            Dedup.appendDedupBatchIdempotent("doc_id", "text", path)(df, bid)
          }
        case 3 => // takedowns (can hit docs from any batch, any tier)
          if (live.nonEmpty) {
            val ids = live.keys.toSeq.sorted
            val del = rnd.shuffle(ids)
              .take(1 + rnd.nextInt(math.max(1, ids.length / 8)))
            Dedup.deleteFromDedupIndex(spark, path, del)
            live --= del
            deleted ++= del
          }
        case 4 | 5 => // compact: flat or tiered fold (vacuums tombstones)
          Dedup.compactDedupIndex(spark, path, tiered = rnd.nextBoolean())
      }
      if (step % 3 == 0) verify(step)
    }
    Dedup.compactDedupIndex(spark, path)
    verify(9999)
  }
}
