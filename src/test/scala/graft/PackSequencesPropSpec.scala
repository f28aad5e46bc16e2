package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the greedy first-fit packing rule — the pure sweep
  * logic is re-stated here and checked for the invariants the distributed
  * operator's spec asserts on fixtures: every doc assigned exactly once,
  * sequences never overflow unless they hold a single oversized doc, and
  * sequence ids are dense and ordered. (The DataFrame operator is gated by
  * CurationSpec + the recursive-CTE oracle; this pins the RULE itself over
  * arbitrary inputs.) */
object PackSequencesPropSpec extends Properties("packSequencesRule") {

  /** Reference implementation of the sweep (mirrors Curation.packSequences's
    * mapPartitions body over one bucket, docs pre-sorted by id). */
  private def pack(tokens: List[Long], budget: Long): List[Long] = {
    var seqId = 0L
    var running = 0L
    var first = true
    tokens.map { n =>
      if (first) { running = n; first = false }
      else if (running + n > budget) { seqId += 1; running = n }
      else running += n
      seqId
    }
  }

  private val inputs: Gen[(List[Long], Long)] = for {
    budget <- Gen.chooseNum(1L, 500L)
    toks <- Gen.listOf(Gen.chooseNum(0L, 700L))
  } yield (toks, budget)

  property("every doc gets exactly one sequence") = forAll(inputs) {
    case (toks, budget) => pack(toks, budget).length == toks.length
  }

  property("no sequence overflows unless it is a single doc") =
    forAll(inputs) { case (toks, budget) =>
      val bySeq = toks.zip(pack(toks, budget)).groupBy(_._2)
      bySeq.values.forall(g => g.map(_._1).sum <= budget || g.length == 1)
    }

  property("sequence ids are dense, start at 0, and never decrease") =
    forAll(inputs) { case (toks, budget) =>
      val ids = pack(toks, budget)
      ids.isEmpty || (ids.head == 0L &&
        ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 })
    }

  property("greedy is maximal: a new sequence opens only on true overflow") =
    forAll(inputs) { case (toks, budget) =>
      val ids = pack(toks, budget)
      ids.isEmpty || {
        val pairs = toks.zip(ids)
        ids.zip(ids.tail).zipWithIndex.forall { case ((a, b), i) =>
          b == a || pairs.filter(_._2 == a).map(_._1).sum + toks(i + 1) > budget
        }
      }
    }
}
