package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Vector distance / transform scalar functions as native Catalyst expressions
 * with whole-stage-codegen bodies (tight primitive loops the JIT can
 * auto-vectorize — the Spark-idiomatic analog of the reference's SIMD
 * kernels, pgvectorscale/src/access_method/distance/mod.rs:87-323).
 *
 * Accumulation is done in double after widening each float element, matching
 * DuckDB's behavior on `CAST(v AS DOUBLE[])` so oracle results agree bit-wise.
 *
 * Distance semantics mirror the reference's SQL-visible surface
 * (SURVEY.md §2.3, §4.3):
 *   - vec_l2sq: squared L2, ordering-only form (distance/mod.rs:115-116)
 *   - vec_l2: true L2 (sqrt) — pgvector `<->` projection semantics
 *   - vec_neg_dot: negated inner product — pgvector `<#>` (distance/mod.rs:173-190)
 *   - vec_cosine_dist: 1 - cos similarity — pgvector `<=>`; the reference's
 *     `distance_cosine` assumes pre-normalized inputs and computes 1-dot
 *     (distance/mod.rs:192-223); the general form here divides by norms and
 *     reduces to the same value on normalized vectors.
 *   - vec_normalize: L2-normalize unless zero or already ~1
 *     (preprocess_cosine, distance/mod.rs:225-253)
 *   - hamming_dist: popcount of XOR over packed u64 words
 *     (distance_xor_optimized, distance/mod.rs:255-323)
 */
abstract class BinaryFloatVectorExpression extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatVec(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java statement(s) computing `double ${resultVar}` from ArrayData a, b. */
  protected def loopCode(a: String, b: String, n: String, result: String): String
  protected def evalVectors(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    require(a.numElements() == b.numElements(),
      s"$prettyName: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    evalVectors(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: dimension mismatch");
         |}
         |${loopCode(a, b, n, res)}
         |${ev.value} = $res;
       """.stripMargin
    })
  }
}

case class VectorDot(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_dot"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String =
    s"""double $res = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  $res += ((double) $a.getFloat(i)) * ((double) $b.getFloat(i));
       |}""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; acc += d * d; i += 1
    }
    acc
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String =
    s"""double $res = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double d = ((double) $a.getFloat(i)) - ((double) $b.getFloat(i));
       |  $res += d * d;
       |}""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VectorL2(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_l2"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String =
    s"""double $res = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double d = ((double) $a.getFloat(i)) - ((double) $b.getFloat(i));
       |  $res += d * d;
       |}
       |$res = java.lang.Math.sqrt($res);""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VectorNegDot(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_neg_dot"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    -acc
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String =
    s"""double $res = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  $res += ((double) $a.getFloat(i)) * ((double) $b.getFloat(i));
       |}
       |$res = -$res;""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VectorCosineDistance(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_cosine_dist"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    1.0 - dot / math.sqrt(na * nb)
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String = {
    s"""double ${res}_dot = 0.0; double ${res}_na = 0.0; double ${res}_nb = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  ${res}_dot += x * y; ${res}_na += x * x; ${res}_nb += y * y;
       |}
       |double $res = 1.0 - ${res}_dot / java.lang.Math.sqrt(${res}_na * ${res}_nb);""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * L1 (taxicab) distance — pgvector's `<+>` operator (vector_l1_ops, pgvector
 * ≥0.7). Same widen-to-double accumulation as the other kernels so DuckDB's
 * `abs(CAST(a AS DOUBLE[])[i] - ...)` oracle agrees bit-wise.
 */
case class VectorL1(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {
  override def prettyName: String = "vec_l1"
  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      acc += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble); i += 1
    }
    acc
  }
  override protected def loopCode(a: String, b: String, n: String, res: String): String =
    s"""double $res = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  $res += java.lang.Math.abs(((double) $a.getFloat(i)) - ((double) $b.getFloat(i)));
       |}""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a single vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatVec(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("acc")
      s"""
         |double $res = 0.0;
         |final int ${res}_n = $a.numElements();
         |for (int i = 0; i < ${res}_n; i++) {
         |  double x = (double) $a.getFloat(i); $res += x * x;
         |}
         |${ev.value} = java.lang.Math.sqrt($res);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * L2-normalize; no-op when the norm is already ~1 (within f32 epsilon) or the
 * vector is all-zero — mirrors `preprocess_cosine` (distance/mod.rs:225-253).
 * Interpreted-eval only: runs once per ingested vector in build jobs, off the
 * per-comparison hot path.
 */
case class VectorNormalize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "vec_normalize"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatVec(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    if (norm == 0.0 || math.abs(norm - 1.0) < java.lang.Math.ulp(1.0f)) a.copy()
    else {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (a.getFloat(i) / norm).toFloat; i += 1 }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between bit-packed ARRAY<BIGINT> codes (popcount of XOR). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "hamming_dist"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longVec(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // unsafe array getters do NOT bounds-check — a silent OOB read, not an
    // error, without this (pgvector errors on dimension mismatch likewise)
    require(n == b.numElements(),
      s"$prettyName: code length mismatch $n vs ${b.numElements()}")
    var acc = 0L; var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("acc")
      s"""
         |long $res = 0L;
         |final int ${res}_n = $a.numElements();
         |if (${res}_n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: code length mismatch");
         |}
         |for (int i = 0; i < ${res}_n; i++) {
         |  $res += java.lang.Long.bitCount($a.getLong(i) ^ $b.getLong(i));
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Sign-threshold binary quantization — pgvector's `binary_quantize(vector)`
 * (pgvector ≥0.7): bit i is set iff v[i] > 0. Output is bit-PACKED
 * ARRAY<BIGINT> (dim i → word i/64, bit i%64, same layout as the SBQ codes
 * [[HammingDistance]] consumes), not pgvector's textual `bit(n)` — the packed
 * form is what a columnar engine wants: 64× smaller than the float vector and
 * directly comparable with [[HammingDistance]] / [[JaccardDistance]].
 */
case class BinaryQuantize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "binary_quantize"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatVec(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) > 0f) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      s"""
         |final int $n = $a.numElements();
         |final long[] $words = new long[($n + 63) >> 6];
         |for (int i = 0; i < $n; i++) {
         |  if ($a.getFloat(i) > 0f) $words[i >> 6] |= 1L << (i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Jaccard distance between bit-packed ARRAY<BIGINT> codes — pgvector's `<%>`
 * (bit_jaccard_ops, pgvector ≥0.7): 1 - popcount(a&b)/popcount(a|b). Both
 * all-zero (union = 0, where pgvector's float math yields NaN) is defined as
 * distance 0.0 here — two empty sets are identical, and a total value keeps
 * ORDER BY deterministic across engines.
 */
case class JaccardDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "jaccard_dist"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longVec(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // unsafe array getters do NOT bounds-check — a silent OOB read, not an
    // error, without this (pgvector errors on dimension mismatch likewise)
    require(n == b.numElements(),
      s"$prettyName: code length mismatch $n vs ${b.numElements()}")
    var inter = 0L; var union = 0L; var i = 0
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      inter += java.lang.Long.bitCount(x & y)
      union += java.lang.Long.bitCount(x | y)
      i += 1
    }
    if (union == 0L) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("acc")
      s"""
         |long ${res}_inter = 0L; long ${res}_union = 0L;
         |final int ${res}_n = $a.numElements();
         |if (${res}_n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: code length mismatch");
         |}
         |for (int i = 0; i < ${res}_n; i++) {
         |  long x = $a.getLong(i); long y = $b.getLong(i);
         |  ${res}_inter += java.lang.Long.bitCount(x & y);
         |  ${res}_union += java.lang.Long.bitCount(x | y);
         |}
         |${ev.value} = ${res}_union == 0L
         |  ? 0.0 : 1.0 - ((double) ${res}_inter) / ((double) ${res}_union);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared input-type validation (ExpectsInputTypes is private[sql]). */
private[graft] object GraftTypeChecks {
  private def check(name: String, elem: DataType, dts: Seq[DataType]): TypeCheckResult = {
    val ok = dts.forall {
      case ArrayType(e, _) => e == elem
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ARRAY<${elem.simpleString.toUpperCase}> arguments, got " +
        dts.map(_.simpleString).mkString(", "))
  }
  def floatVec(name: String, dts: DataType*): TypeCheckResult = check(name, FloatType, dts)
  def longVec(name: String, dts: DataType*): TypeCheckResult = check(name, LongType, dts)
}
