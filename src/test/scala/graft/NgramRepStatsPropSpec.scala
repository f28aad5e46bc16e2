package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.NgramRepStats

/** Pins the NgramRepStats expression (the map-side kernel behind
  * gopher_repetition) against an independent Scala restatement over
  * arbitrary token streams: same top-gram election (max count, ties to the
  * lexicographically smallest gram), same per-occurrence duplicated-gram
  * char accounting, same space-joined total. The DataFrame query itself is
  * gated by the DuckDB oracle; this covers the n/edge-case space the 500
  * fixed docs cannot. */
object NgramRepStatsPropSpec extends Properties("ngramRepStats") {

  private def evalStats(toks: Seq[String], n: Int): (Long, Long, Long, Long) = {
    val expr = NgramRepStats(
      Literal.create(Seq.empty[String], ArrayType(StringType)), n)
    val arr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): Any).toArray)
    val row = expr.nullSafeEval(arr).asInstanceOf[InternalRow]
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** Independent restatement of the spec. */
  private def model(toks: Seq[String], n: Int): (Long, Long, Long, Long) = {
    val total = toks.map(_.length.toLong).sum + math.max(0, toks.length - 1)
    if (toks.length < n) (0L, 0L, 0L, total)
    else {
      val grams = toks.sliding(n).map(_.mkString(" ")).toList
      val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
      val (topG, topC) = counts.toSeq.minBy { case (g, c) => (-c, g) }
      val dup = counts.collect { case (g, c) if c >= 2 => c * g.length }.sum
      (topC, topG.length.toLong, dup, total)
    }
  }

  // small alphabet so gram collisions actually happen
  private val token: Gen[String] =
    Gen.oneOf(Gen.const("a"), Gen.const("b"), Gen.const("ab"),
      Gen.const("xyz"), Gen.stringOfN(2, Gen.alphaLowerChar))
  private val inputs: Gen[(List[String], Int)] = for {
    len <- Gen.chooseNum(0, 30)
    toks <- Gen.listOfN(len, token)
    n <- Gen.chooseNum(1, 6)
  } yield (toks, n)

  property("expression == independent model on arbitrary token streams") =
    forAll(inputs) { case (toks, n) =>
      evalStats(toks, n) == model(toks, n)
    }

  property("degenerate all-same-token stream: top gram covers everything") =
    forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 6)) { (len, n) =>
      val toks = List.fill(len)("x")
      val (topC, topChars, dup, total) = evalStats(toks, n)
      val nGrams = math.max(0, len - n + 1)
      (len < n && topC == 0L) || (
        topC == nGrams.toLong &&
        topChars == (2 * n - 1).toLong &&
        total == (2 * len - 1).toLong &&
        (nGrams < 2 || dup == nGrams.toLong * (2 * n - 1)))
    }
}
