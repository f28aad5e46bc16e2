package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.index.LabelSets

/** Property tests for the sorted-set label algebra — the Spark analog of the
  * reference's pure-Rust unit layer (labels/mod.rs:249-425): the fast
  * sorted-merge kernels must agree with naive Set semantics on ALL inputs. */
object LabelSetsPropSpec extends Properties("LabelSets") {

  private val rawLabels: Gen[Array[Short]] =
    Gen.listOf(Gen.chooseNum[Short](-5, 5)).map(_.toArray)

  property("normalize sorts, dedups, is idempotent") = forAll(rawLabels) { raw =>
    val n = LabelSets.normalize(raw)
    n.toSeq == raw.distinct.sorted.toSeq && LabelSets.normalize(n).toSeq == n.toSeq
  }

  property("overlaps == nonempty set intersection") =
    forAll(rawLabels, rawLabels) { (a, b) =>
      val na = LabelSets.normalize(a)
      val nb = LabelSets.normalize(b)
      LabelSets.overlaps(na, nb) == a.toSet.intersect(b.toSet).nonEmpty
    }

  property("overlaps symmetric; empty matches nothing (P1)") =
    forAll(rawLabels, rawLabels) { (a, b) =>
      val na = LabelSets.normalize(a)
      val nb = LabelSets.normalize(b)
      Prop(LabelSets.overlaps(na, nb) == LabelSets.overlaps(nb, na)) &&
        Prop(!LabelSets.overlaps(na, Array.emptyShortArray))
    }

  property("containsIntersection == (a ∩ b ⊆ self)") =
    forAll(rawLabels, rawLabels, rawLabels) { (s, a, b) =>
      val expected = a.toSet.intersect(b.toSet).subsetOf(s.toSet)
      LabelSets.containsIntersection(LabelSets.normalize(s),
        LabelSets.normalize(a), LabelSets.normalize(b)) == expected
    }
}
