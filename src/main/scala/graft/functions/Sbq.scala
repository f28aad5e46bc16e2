package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * SBQ (scalar binary quantization) — the reference's only aggregate
 * (SURVEY.md §2.4).
 *
 * Training is a one-pass per-dimension Welford `count/mean/m2` over all
 * vectors (pgvectorscale sbq/quantize.rs:104-152), expressed here as a typed
 * `Aggregator` whose merge is Chan's parallel-variance combine — which is
 * exactly Spark's two-phase (partial + final) aggregation, so training
 * scales to any number of partitions with one shuffle of O(dim) state.
 *
 * Quantization mirrors sbq/quantize.rs:52-102:
 *  - 1 bit/dim: bit set iff v > mean[i]
 *  - 2 bits/dim: z = (v - mean)/sqrt(m2/count) (population variance);
 *    index = (z + 2) / (4 / (bits+1)); index < 1 → all zeros, else
 *    min(floor(index), bits) ones filled in ascending bit positions
 *  - bits are packed LSB-first into 64-bit words at position i*bits
 * Bits/dim default follows meta_page.rs:312-323: 2 if dims < 900 else 1.
 */
object Sbq {

  case class WelfordState(count: Long, mean: Array[Double], m2: Array[Double])

  case class SbqModel(count: Long, mean: Array[Double], m2: Array[Double],
      bitsPerDim: Int) extends Serializable {
    def dim: Int = mean.length
    def variance(i: Int): Double = if (count > 0) m2(i) / count else 0.0

    def quantizedWords(d: Int): Int = {
      val numBits = d * bitsPerDim
      (numBits + 63) / 64
    }

    def quantize(v: Array[Float]): Array[Long] = {
      val out = new Array[Long](quantizedWords(v.length))
      if (bitsPerDim == 1) {
        var i = 0
        while (i < v.length) {
          if (v(i) > mean(i)) out(i >> 6) |= 1L << (i & 63)
          i += 1
        }
      } else {
        val ranges = bitsPerDim + 1
        var i = 0
        while (i < v.length) {
          val stdDev = math.sqrt(variance(i))
          val z = (v(i) - mean(i)) / stdDev
          val index = (z + 2.0) / (4.0 / ranges)
          if (index >= 1.0) {
            val countOnes = math.min(math.floor(index).toInt, bitsPerDim)
            val bitPosition = i * bitsPerDim
            var j = 0
            while (j < countOnes) {
              val p = bitPosition + j
              out(p >> 6) |= 1L << (p & 63)
              j += 1
            }
          }
          i += 1
        }
      }
      out
    }
  }

  /** meta_page.rs:312-323. */
  def defaultBitsPerDim(dims: Int): Int = if (dims < 900) 2 else 1

  /** Welford update/merge in double; single partial row of O(dim) per task. */
  object TrainAggregator extends Aggregator[Array[Float], WelfordState, WelfordState] {
    override def zero: WelfordState = WelfordState(0L, Array.empty, Array.empty)

    override def reduce(b: WelfordState, a: Array[Float]): WelfordState = {
      if (b.count == 0L) {
        val mean = new Array[Double](a.length)
        val m2 = new Array[Double](a.length)
        var i = 0
        while (i < a.length) { mean(i) = a(i); i += 1 }
        WelfordState(1L, mean, m2)
      } else {
        require(b.mean.length == a.length,
          s"sbq_train: dimension mismatch ${b.mean.length} vs ${a.length}")
        val n = b.count + 1
        var i = 0
        while (i < a.length) {
          val delta = a(i) - b.mean(i)
          b.mean(i) += delta / n
          val delta2 = a(i) - b.mean(i)
          b.m2(i) += delta * delta2
          i += 1
        }
        WelfordState(n, b.mean, b.m2)
      }
    }

    /** Chan's parallel combine — associative, so safe as a partial-agg merge. */
    override def merge(x: WelfordState, y: WelfordState): WelfordState = {
      if (x.count == 0L) y
      else if (y.count == 0L) x
      else {
        val n = x.count + y.count
        val mean = new Array[Double](x.mean.length)
        val m2 = new Array[Double](x.mean.length)
        var i = 0
        while (i < mean.length) {
          val delta = y.mean(i) - x.mean(i)
          mean(i) = x.mean(i) + delta * y.count / n
          m2(i) = x.m2(i) + y.m2(i) + delta * delta * x.count * y.count / n
          i += 1
        }
        WelfordState(n, mean, m2)
      }
    }

    override def finish(r: WelfordState): WelfordState = r
    override def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
    override def outputEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  }

  /** Distributed pass 1 of the index build: train the quantizer model. */
  def train(df: DataFrame, vecCol: String, bitsPerDim: Option[Int] = None): SbqModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Float]] =
      df.select(col(vecCol)).na.drop().as[Array[Float]]
    val st = ds.select(TrainAggregator.toColumn).head()
    SbqModel(st.count, st.mean, st.m2,
      bitsPerDim.getOrElse(defaultBitsPerDim(st.mean.length)))
  }

  /** Per-dimension training stats as a DataFrame (dim, cnt, mean, variance). */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(vecCol)).na.drop().as[Array[Float]]
    // the typed aggregate's product output is flattened to top-level columns
    ds.select(TrainAggregator.toColumn)
      .select(col("count").as("cnt"), posexplode(arrays_zip(col("mean"), col("m2"))))
      .select(col("pos").as("dim"), col("cnt"),
        col("col.mean").as("mean"),
        (col("col.m2") / col("cnt")).as("variance"))
  }

  /** Quantize a vector column with a broadcast-closed model → ARRAY<BIGINT>. */
  def encodeUdf(spark: SparkSession, model: SbqModel): Column => Column = {
    val enc = udf((v: Array[Float]) => if (v == null) null else model.quantize(v))
    c => enc(c)
  }
}
