package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the sliding-window chunking RULE (starts every
  * `stride` chars, windows of `chunkSize`): full coverage when
  * stride ≤ chunkSize, dense chunk indexes, reconstructability from the
  * stride-aligned prefixes. (The DataFrame operator is gated by the
  * DuckDB oracle `chunk_sliding` + OperatorsSpec fixtures; this pins the
  * window arithmetic itself over arbitrary inputs.) */
object SlidingChunksPropSpec extends Properties("slidingChunksRule") {

  /** Reference restatement of TextAnalysis.slidingChunks's window math. */
  private def chunks(text: String, chunkSize: Int, stride: Int): List[(Int, Int, String)] = {
    val stop = math.max(text.length, 1) - 1
    (0L to stop by stride.toLong).toList.zipWithIndex.map { case (s, ix) =>
      (ix, s.toInt, text.substring(s.toInt, math.min(s.toInt + chunkSize, text.length)))
    }
  }

  private val inputs: Gen[(String, Int, Int)] = for {
    text <- Gen.stringOfN(200, Gen.alphaNumChar).flatMap(s =>
      Gen.chooseNum(0, 200).map(s.take))
    chunkSize <- Gen.chooseNum(1, 50)
    stride <- Gen.chooseNum(1, 50)
  } yield (text, chunkSize, stride)

  property("every char covered when stride <= chunkSize; empty doc keeps one chunk") =
    forAll(inputs) { case (text, chunkSize, stride0) =>
      val stride = math.min(stride0, chunkSize)
      val cs = chunks(text, chunkSize, stride)
      val covered = cs.flatMap { case (_, s, c) => s until (s + c.length) }.toSet
      cs.nonEmpty && (text.isEmpty || covered == (0 until text.length).toSet)
    }

  property("chunk indexes dense from 0; starts are the stride multiples below len") =
    forAll(inputs) { case (text, chunkSize, stride) =>
      val cs = chunks(text, chunkSize, stride)
      cs.map(_._1) == cs.indices.toList &&
        cs.map(_._2) == (0 until math.max(text.length, 1) by stride).toList
    }

  property("concatenating stride-prefixes of the chunks reconstructs the text") =
    forAll(inputs) { case (text, chunkSize, stride0) =>
      val stride = math.min(stride0, chunkSize)
      val cs = chunks(text, chunkSize, stride)
      cs.map(_._3.take(stride)).mkString == text
    }
}
