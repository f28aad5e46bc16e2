package graft.tools

import graft.functions.{PanamaKernels, VectorKernels}

/**
 * A/B microbenchmark: scalar `VectorKernels` loops vs the Panama Vector
 * API kernels (`PanamaKernels`), on the exact shapes the serving path
 * pays — 768-dim f32 (the default embedding width) and 96-word packed
 * SBQ codes. No Spark: this isolates the kernel, the way the reference's
 * `distance/mod.rs` benches do. Prints one JSON line; numbers land in
 * SCALING.md §SIMD with the adoption decision.
 *
 * Measurement discipline: per-variant warm-up (JIT + vector species
 * resolution), then best-of-5 timed passes over a working set larger than
 * L2 so the comparison includes realistic memory traffic; a checksum is
 * accumulated and printed so the loops cannot be dead-code-eliminated.
 */
object SimdBench {
  private val Dim = 768
  private val N = 4096 // 4096 × 768 × 4 B = 12 MiB working set
  private val Words = 96 // 768 dims × 1 bit... 96 packed u64 per code at 8 bits/dim

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(N)(Array.fill(Dim)(rnd.nextFloat() * 2f - 1f))
    val q = Array.fill(Dim)(rnd.nextFloat() * 2f - 1f)
    val codes = Array.fill(N)(Array.fill(Words)(rnd.nextLong()))
    val qc = Array.fill(Words)(rnd.nextLong())

    def time(label: String)(pass: () => Double): (String, Double, Double) = {
      var best = Double.MaxValue
      var sink = 0.0
      (0 until 2).foreach(_ => sink += pass()) // warm-up
      (0 until 5).foreach { _ =>
        val t0 = System.nanoTime()
        sink += pass()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (label, best, sink)
    }

    val lanes =
      try PanamaKernels.floatLanes()
      catch { case _: Throwable => 0 }
    if (lanes == 0) {
      println("""{"error":"jdk.incubator.vector module absent at runtime"}""")
      return
    }

    val results = Seq(
      time("dot_scalar") { () =>
        var s = 0.0; var i = 0
        while (i < N) { s += VectorKernels.dot(vecs(i), q); i += 1 }; s
      },
      time("dot_panama_f32") { () =>
        var s = 0.0; var i = 0
        while (i < N) { s += PanamaKernels.dotF(vecs(i), q); i += 1 }; s
      },
      time("dot_panama_f64lanes") { () =>
        var s = 0.0; var i = 0
        while (i < N) { s += PanamaKernels.dotD(vecs(i), q); i += 1 }; s
      },
      time("l2sq_scalar") { () =>
        var s = 0.0; var i = 0
        while (i < N) { s += VectorKernels.l2sq(vecs(i), q); i += 1 }; s
      },
      time("l2sq_panama_f32") { () =>
        var s = 0.0; var i = 0
        while (i < N) { s += PanamaKernels.l2sqF(vecs(i), q); i += 1 }; s
      },
      time("hamming_scalar") { () =>
        var s = 0L; var i = 0
        while (i < N) { s += VectorKernels.hamming(codes(i), qc); i += 1 }
        s.toDouble
      }
    )
    // bit-compatibility probe: does the lane-reduced kernel reproduce the
    // sequential accumulation exactly? (expected: NO — documented why)
    var bitIdentical = true
    var maxUlpDiff = 0L
    (0 until 256).foreach { i =>
      val a = VectorKernels.dot(vecs(i), q)
      val b = PanamaKernels.dotF(vecs(i), q)
      if (a != b) {
        bitIdentical = false
        maxUlpDiff = math.max(maxUlpDiff,
          math.abs(java.lang.Double.doubleToLongBits(a) -
            java.lang.Double.doubleToLongBits(b)))
      }
    }
    val m = results.map { case (l, t, _) => l -> t }.toMap
    val sink = results.map(_._3).sum
    def r(x: Double) = f"$x%.6f"
    println(s"""{"lanes":$lanes,"dim":$Dim,"n":$N,""" +
      s""""dot_scalar_s":${r(m("dot_scalar"))},""" +
      s""""dot_panama_f32_s":${r(m("dot_panama_f32"))},""" +
      s""""dot_panama_f64lanes_s":${r(m("dot_panama_f64lanes"))},""" +
      s""""l2sq_scalar_s":${r(m("l2sq_scalar"))},""" +
      s""""l2sq_panama_f32_s":${r(m("l2sq_panama_f32"))},""" +
      s""""hamming_scalar_s":${r(m("hamming_scalar"))},""" +
      s""""speedup_dot":${r(m("dot_scalar") / m("dot_panama_f32"))},""" +
      s""""speedup_l2sq":${r(m("l2sq_scalar") / m("l2sq_panama_f32"))},""" +
      s""""bit_identical":$bitIdentical,"max_ulp_diff":$maxUlpDiff,""" +
      s""""checksum":${r(sink)}}""")
  }
}
