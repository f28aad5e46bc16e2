package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex

/**
 * Seeded lifecycle fuzz for the STORED TEXT INDEX — the BM25 twin of
 * [[LifecycleFuzzSpec]]: random interleavings of idempotent stream-batch
 * appends (including exact replays of an already-committed batch id, the
 * at-least-once checkpoint shape), doc tombstones (including docs that
 * arrived in a not-yet-folded stream batch), and flat/tiered compactions,
 * verified between steps against a driver-side model.
 *
 * The invariant checked is the candidate-set contract, which is stable
 * across the whole lifecycle regardless of the stats regime (pre-vacuum
 * scoring intentionally keeps deleted docs in idf/avgdl — the directed
 * bm25_after_delete/_vacuum oracles pin the score values): a query's
 * indexed candidates are EXACTLY the live docs containing at least one
 * query term — no tombstone resurrections, no lost appends, no duplicate
 * ids from replayed batches, at every step.
 */
class TextLifecycleFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seeded text-index fuzz: 25 random append/delete/compact steps keep the candidate contract") {
    import spark.implicits._
    val path = "/tmp/graft_test_index/text_lifecycle_fuzz"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(path))

    // seed overridable for local sweeps (env; forked test JVMs inherit it):
    //   GRAFT_FUZZ_SEED=7 sbt 'testOnly graft.TextLifecycleFuzzSpec'
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(42L))
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray", "yankee", "zulu")
    def doc(id: Long): String = {
      val r = new scala.util.Random(id * 2654435761L + 7)
      Seq.fill(5 + r.nextInt(11))(vocab(r.nextInt(vocab.length)))
        .mkString(" ")
    }
    val queryTerms = Seq("alpha", "juliet", "tango")

    var live = Map.empty[Long, String]
    var nextId = 0L
    var nextBatch = 0L
    val init = (0L until 80L).map(i => i -> doc(i))
    nextId = 80L
    live = init.toMap
    TextIndex.buildTextIndex(init.toDF("doc_id", "text"), "doc_id", "text",
      path, nBuckets = 8)

    def verify(step: Int): Unit = {
      val got = TextIndex.bm25SearchIndexed(spark, path, queryTerms,
          n = 100000)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val want = live.filter { case (_, t) =>
        t.split(" ").exists(queryTerms.contains) }.keySet
      assert(got == want,
        s"step $step: candidates diverged — missing ${want -- got}, " +
          s"phantom ${got -- want}")
    }
    verify(0)

    // one committed batch kept around to REPLAY later (at-least-once)
    var replayable: Option[(org.apache.spark.sql.DataFrame, Long)] = None

    (1 to 25).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append a stream micro-batch under the marker protocol
          val n = 5 + rnd.nextInt(11)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            live += id -> doc(id)
            (id, live(id))
          }
          val df = rows.toDF("doc_id", "text")
          val bid = nextBatch; nextBatch += 1
          TextIndex.appendBatchIdempotent("doc_id", "text", path)(df, bid)
          if (replayable.isEmpty || rnd.nextBoolean())
            replayable = Some((df, bid))
        case 2 => // the checkpoint REPLAY: re-run a committed batch id —
          // the marker must make it a no-op (no duplicate ids, no double
          // df), even if compactions have folded the original since
          replayable.foreach { case (df, bid) =>
            TextIndex.appendBatchIdempotent("doc_id", "text", path)(df, bid)
          }
        case 3 => // tombstone a random slice (stream-batch docs included)
          if (live.nonEmpty) {
            val ids = live.keys.toSeq.sorted
            val del = rnd.shuffle(ids)
              .take(1 + rnd.nextInt(math.max(1, ids.length / 8)))
            TextIndex.deleteDocs(spark, path, del)
            live --= del
          }
        case 4 | 5 => // compact: flat or tiered fold (vacuums tombstones)
          TextIndex.compactTextIndex(spark, path,
            tiered = rnd.nextBoolean())
      }
      if (step % 3 == 0) verify(step)
    }
    TextIndex.compactTextIndex(spark, path)
    verify(9999)
  }
}
