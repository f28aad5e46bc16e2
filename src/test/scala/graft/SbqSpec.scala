package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sbq
import graft.functions.Sbq.{SbqModel, WelfordState}

/** Mirrors sbq/quantize.rs semantics (SURVEY.md §2.4). */
class SbqSpec extends AnyFunSuite {

  test("1-bit quantization: bit set iff v > mean") {
    val m = SbqModel(10, Array(0.5, 0.5, 0.5), Array(1, 1, 1), bitsPerDim = 1)
    val code = m.quantize(Array(0.4f, 0.6f, 0.5f))
    assert(code.length == 1)
    assert(code(0) == 2L) // only dim 1 strictly above mean
  }

  test("2-bit quantization: z-score bucketing with unary fill") {
    // mean 0, population variance 1 (m2 = count), so z == v
    val m = SbqModel(4, Array(0.0), Array(4.0), bitsPerDim = 2)
    // index = (z + 2) / (4/3); ranges: z<-2/3 -> 00, z in [-2/3, 2/3) -> 01,
    // z in [2/3, 2) -> 11 (floor(index)=2), z >= 2 -> clamped at 2 ones
    assert(m.quantize(Array(-3f))(0) == 0L)   // index < 1
    assert(m.quantize(Array(0f))(0) == 1L)    // index 1.5 -> 1 one
    assert(m.quantize(Array(1f))(0) == 3L)    // index 2.25 -> 2 ones
    assert(m.quantize(Array(10f))(0) == 3L)   // clamped at bitsPerDim
  }

  test("2-bit packing positions: dim i occupies bits 2i, 2i+1") {
    val m = SbqModel(1, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0), bitsPerDim = 2)
    val code = m.quantize(Array(0f, 10f, 0f)) // dims: 1 one, 2 ones, 1 one
    assert(code(0) == ((1L << 0) | (3L << 2) | (1L << 4)))
  }

  test("word spill: >32 dims at 2 bits uses a second 64-bit word") {
    val d = 40
    val m = SbqModel(1, Array.fill(d)(0.0), Array.fill(d)(1.0), bitsPerDim = 2)
    val code = m.quantize(Array.fill(d)(10f))
    assert(code.length == 2)
    assert(code(0) == -1L) // all 64 bits set
    assert(code(1) == (1L << 16) - 1) // remaining 8 dims * 2 bits
  }

  test("default bits per dim follows the <900 rule") {
    assert(Sbq.defaultBitsPerDim(64) == 2)
    assert(Sbq.defaultBitsPerDim(899) == 2)
    assert(Sbq.defaultBitsPerDim(900) == 1)
    assert(Sbq.defaultBitsPerDim(1536) == 1)
  }

  test("Welford merge matches sequential reduce (Chan combine correctness)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val parts = List.fill(3)(
        List.fill(rnd.nextInt(20))(Array(rnd.nextFloat() * 20f - 10f)))
      val seqState = parts.flatten.foldLeft(Sbq.TrainAggregator.zero)(
        Sbq.TrainAggregator.reduce)
      val mergedState = parts
        .map(_.foldLeft(Sbq.TrainAggregator.zero)(Sbq.TrainAggregator.reduce))
        .foldLeft(Sbq.TrainAggregator.zero)(Sbq.TrainAggregator.merge)
      assert(seqState.count == mergedState.count)
      if (seqState.count > 0) {
        assert(math.abs(seqState.mean(0) - mergedState.mean(0)) < 1e-9)
        assert(math.abs(seqState.m2(0) - mergedState.m2(0)) < 1e-7)
      }
    }
  }

  test("distributed train matches naive stats on real data") {
    val spark = TestSpark.spark
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(7) // force multi-partition merge
    val model = Sbq.train(df, "embedding")
    assert(model.count == 500 && model.dim == 64 && model.bitsPerDim == 2)
    import spark.implicits._
    val vecs = df.select($"embedding").as[Array[Float]].collect()
    val naiveMean = (0 until 64).map(i => vecs.map(_(i).toDouble).sum / vecs.length)
    val naiveVar = (0 until 64).map { i =>
      val m = naiveMean(i); vecs.map(v => (v(i) - m) * (v(i) - m)).sum / vecs.length
    }
    (0 until 64).foreach { i =>
      assert(math.abs(model.mean(i) - naiveMean(i)) < 1e-9)
      assert(math.abs(model.variance(i) - naiveVar(i)) < 1e-9)
    }
  }
}
