package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

/** Salting must change the SHUFFLE, never the RESULT. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of fact rows share key 1 — the power-law shape salting exists for
  private val fact = (1 to 1000).map { i =>
    (if (i <= 900) 1L else (i % 50).toLong, i.toLong, i * 1.5)
  }.toDF("k", "rid", "v")
  private val dim = (0 to 49).map(k => (k.toLong, s"name$k"))
    .toDF("k", "name")
  // dim key 999 matches nothing; fact key 1 matches once
  private val dimSparse = Seq((1L, "one"), (999L, "ghost")).toDF("k", "name")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("inner/left/semi/anti: byte-identical to the plain join") {
    for (jt <- Seq("inner", "left_outer")) {
      val plain = fact.join(dim, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(fact, dim, "k", "rid", 8, jt)
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(sorted(salted) == sorted(plain), s"$jt diverged")
    }
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = fact.join(dimSparse, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(fact, dimSparse, "k", "rid", 8, jt)
      assert(sorted(salted) == sorted(plain), s"$jt diverged")
    }
  }

  test("the hot key actually spreads across salts") {
    // mirrors saltedJoin's salt expression (xxhash64 of seed + id column)
    val spread = fact.filter($"k" === 1L)
      .withColumn("__salt",
        pmod(xxhash64(lit("salt"), $"rid"), lit(8L)))
      .select($"__salt").distinct().count()
    assert(spread == 8L, s"900 hot rows landed on only $spread of 8 salts")
  }

  test("dim-multiplying join types are rejected") {
    val e = intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(fact, dim, "k", "rid", 8, "full_outer"))
    assert(e.getMessage.contains("full_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(fact, dim, "k", "rid", 8, "right"))
  }
}
