package graft.functions;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD distance kernels on the Panama Vector API (JEP 414, incubating in
 * JDK 17) — the JVM analog of the reference's mandated AVX2/NEON kernels
 * with 4-way FMA unrolls (pgvectorscale distance/mod.rs:325-435).
 *
 * IMPORTANT SEMANTICS: these kernels accumulate per-lane and reduce at the
 * end, so the floating-point ADDITION ORDER differs from the sequential
 * scalar loops in {@code VectorKernels}. Double addition is not
 * associative: results can differ from the scalar kernels in the last
 * ulps. The engine's determinism discipline (stored artifacts + DuckDB
 * oracle hash-matching + resumable-scan byte-equality) requires bit-stable
 * distances, so these kernels are OFF by default and gated behind
 * {@code -Dgraft.simd=true}; {@code tools/SimdBench} measures whether the
 * speedup would ever justify relaxing that contract (see SCALING.md).
 *
 * Two accumulation variants are provided:
 *  - {@code *F}: float lanes + float accumulator (maximum SIMD width,
 *    the reference's own precision — it accumulates in f32);
 *  - {@code *D}: float load widened to double lanes (the scalar kernels'
 *    precision, half the lane width).
 *
 * Compiled via javac with {@code --add-modules jdk.incubator.vector};
 * callers must catch {@link NoClassDefFoundError} and fall back when the
 * module is absent at runtime (see {@code VectorKernels.simdAvailable}).
 */
public final class PanamaKernels {
    private static final VectorSpecies<Float> FS = FloatVector.SPECIES_PREFERRED;
    private static final VectorSpecies<Double> DS = DoubleVector.SPECIES_PREFERRED;

    private PanamaKernels() {}

    /** Lane width probe; also forces class init so callers can detect the
     *  missing module eagerly. */
    public static int floatLanes() { return FS.length(); }

    public static double dotF(float[] a, float[] b) {
        int i = 0;
        int upper = FS.loopBound(a.length);
        FloatVector acc = FloatVector.zero(FS);
        for (; i < upper; i += FS.length()) {
            FloatVector va = FloatVector.fromArray(FS, a, i);
            FloatVector vb = FloatVector.fromArray(FS, b, i);
            acc = va.fma(vb, acc);
        }
        double s = acc.reduceLanes(VectorOperators.ADD);
        for (; i < a.length; i++) s += a[i] * b[i];
        return s;
    }

    public static double l2sqF(float[] a, float[] b) {
        int i = 0;
        int upper = FS.loopBound(a.length);
        FloatVector acc = FloatVector.zero(FS);
        for (; i < upper; i += FS.length()) {
            FloatVector d = FloatVector.fromArray(FS, a, i)
                .sub(FloatVector.fromArray(FS, b, i));
            acc = d.fma(d, acc);
        }
        double s = acc.reduceLanes(VectorOperators.ADD);
        for (; i < a.length; i++) {
            double d = a[i] - b[i];
            s += d * d;
        }
        return s;
    }

    /** Double-lane variant: same precision class as the scalar kernels
     *  (every product and sum in f64), half the lanes of {@link #dotF}. */
    public static double dotD(float[] a, float[] b) {
        int i = 0;
        int n = a.length;
        DoubleVector acc = DoubleVector.zero(DS);
        int lanes = DS.length();
        int upper = n - (n % lanes);
        double[] ad = new double[lanes];
        double[] bd = new double[lanes];
        for (; i < upper; i += lanes) {
            for (int j = 0; j < lanes; j++) { ad[j] = a[i + j]; bd[j] = b[i + j]; }
            acc = DoubleVector.fromArray(DS, ad, 0)
                .fma(DoubleVector.fromArray(DS, bd, 0), acc);
        }
        double s = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) s += (double) a[i] * (double) b[i];
        return s;
    }

    /** XOR + per-lane popcount-free Hamming: vectorized XOR, scalar
     *  bit-count of the lanes (JDK 17's Vector API has no BIT_COUNT
     *  lanewise op; it arrived in 19). Integer adds are associative, so
     *  this IS bit-identical to the scalar kernel. */
    public static long hamming(long[] a, long[] b) {
        long acc = 0L;
        for (int i = 0; i < a.length; i++) acc += Long.bitCount(a[i] ^ b[i]);
        return acc;
    }
}
