package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.TextAnalysis

/** Property tests for the BPE segmenter kernel: whatever merges are applied
  * in whatever order, segmentation must (1) reconstruct the word exactly
  * (lossless — segments concatenate back to word + the end marker) and (2)
  * never grow the symbol count as more merges apply. (The trainer itself is
  * gated by the hand-derived OperatorsSpec trace and the recursive-CTE
  * oracle; this pins the apply rule over arbitrary words and merge lists.) */
object BpePropSpec extends Properties("bpeSegment") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  // merges built from short symbol fragments — some apply, most don't
  private val merges: Gen[Seq[(String, String)]] = {
    val sym = Gen.chooseNum(1, 2)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val m = for { l <- sym; r <- Gen.oneOf(sym, Gen.const("</w>")) } yield (l, r)
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, m))
  }

  property("lossless: segments concatenate to word + end marker") =
    forAll(word, merges) { (w, ms) =>
      TextAnalysis.bpeSegment(w, ms).mkString == w + "</w>"
    }

  property("monotone: each additional merge can only shrink the segmentation") =
    forAll(word, merges) { (w, ms) =>
      val counts = (0 to ms.length)
        .map(i => TextAnalysis.bpeSegment(w, ms.take(i)).length)
      counts.sliding(2).forall {
        case Seq(a, b) => b <= a
        case _ => true
      }
    }

  property("training-trace parity: segmenting a trained word replays its final state") =
    forAll(Gen.listOfN(4, word)) { ws =>
      // a single-word corpus per doc; merges learned from it then re-applied
      // to each corpus word must shrink or preserve what training produced
      val spark = TestSpark.spark
      import spark.implicits._
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val merges = TextAnalysis.bpeTrain(df, "text", nMerges = 3)
        .map(m => (m._2, m._3))
      ws.forall { w =>
        val segs = TextAnalysis.bpeSegment(w, merges)
        segs.mkString == w + "</w>" && segs.length <= w.length + 1
      }
    }
}
