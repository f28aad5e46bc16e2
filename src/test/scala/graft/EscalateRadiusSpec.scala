package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.DiskannIndex

/**
 * Property pin for the SHARED escalate-until-stable radius kernel
 * ([[DiskannIndex.escalateRadius]]) — the one definition both the point
 * path and the distributed per-(query, shard) kernel run. Modeled against
 * a PERFECT searcher (round(kk, _) = the true top-kk by (dist, id)), which
 * makes three contracts provable and therefore assertable on every trial:
 *
 *  1. the output is ALWAYS the true in-radius set, maxResults-prefixed —
 *     at any exit, top-kk ∩ radius is exactly the first min(kk, |want|)
 *     in-radius rows;
 *  2. `confirmed = true` implies the output is the COMPLETE in-radius set
 *     (the exactness the SQL scan's no-bail path rests on);
 *  3. an in-radius population larger than maxResults is ALWAYS returned
 *     unconfirmed — the loud-truncation signal can never be missed (no
 *     stable exit can clear the radius below the cap, and the cap exit
 *     cannot prove cover).
 *
 * Complements the end-to-end radius oracles, which pin the kernel against
 * real graphs but cannot sweep 200 random (corpus, radius, cap) shapes.
 */
class EscalateRadiusSpec extends AnyFunSuite {

  test("perfect-round model: exact prefix always, confirmed implies complete, over-cap is loud") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(600)
      val corpus = Seq.tabulate(n)(i => (i.toLong, rnd.nextDouble()))
        .sortBy { case (id, d) => (d, id) }
      val radius = rnd.nextDouble()
      val maxResults = 1 + rnd.nextInt(400)
      def round(kk: Int, l: Int): Seq[(Long, Double)] = corpus.take(kk)
      val (hits, confirmed) = DiskannIndex.escalateRadius(round _,
        radius, searchListSize = 1 + rnd.nextInt(64), maxResults, n.toLong)
      val want = corpus.filter(_._2 <= radius)
      assert(hits == want.take(maxResults),
        s"trial $trial: hits are not the true in-radius prefix " +
          s"(n=$n r=$radius cap=$maxResults got=${hits.length} want=${want.length})")
      if (confirmed)
        assert(hits == want,
          s"trial $trial: confirmed but incomplete (${hits.length} of ${want.length})")
      if (want.length > maxResults)
        assert(!confirmed,
          s"trial $trial: ${want.length} in-radius rows over cap $maxResults silently confirmed")
    }
  }

  test("degenerate shapes: empty corpus, radius covering everything, cap of 1") {
    def roundOf(corpus: Seq[(Long, Double)])(kk: Int, l: Int) = corpus.take(kk)
    // empty corpus: confirmed empty at any cap
    val (e, ce) = DiskannIndex.escalateRadius(roundOf(Seq.empty) _,
      0.5, 16, 100, 0L)
    assert(e.isEmpty && ce)
    // radius covers the whole corpus exactly at the cap boundary: complete
    // and confirmed (the cap matched, never cut)
    val all = Seq.tabulate(64)(i => (i.toLong, i / 100.0))
    val (h, c) = DiskannIndex.escalateRadius(roundOf(all) _, 1.0, 16, 64, 64L)
    assert(h == all && c, s"boundary cap: got ${h.length} confirmed=$c")
    // cap of 1 under 2 in-radius rows: one row back, loudly unconfirmed
    val two = Seq((0L, 0.1), (1L, 0.2))
    val (h1, c1) = DiskannIndex.escalateRadius(roundOf(two) _, 0.5, 16, 1, 2L)
    assert(h1 == Seq((0L, 0.1)) && !c1)
  }
}
