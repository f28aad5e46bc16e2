package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ingestion surface for embedding tables (SURVEY.md §2.1 S4 — the build
 * source). The reference reads vectors out of a Postgres heap table; the
 * Spark-native equivalents are the file formats embedding pipelines actually
 * produce. Every reader returns the canonical schema
 *
 *   (id LONG, vec ARRAY<FLOAT> [, labels ARRAY<SHORT>])
 *
 * with the reference's ingest semantics applied (§1.3): rows with NULL
 * vectors are dropped (build.rs:493-498 skips them), label arrays are
 * sorted+deduped with NULL elements removed (labels/mod.rs:31-37,188-204),
 * and a declared dimension is enforced up front — a wrong-width vector fails
 * the job instead of corrupting the index (the analog of the `atttypmod`
 * check at build.rs:253 and the 16k/2k dim caps at build.rs:192-196).
 */
object EmbeddingSources {

  val MaxDims = 16000 // build.rs:192
  val MaxDimsPlain = 2000 // build.rs:196

  /** Normalize an arbitrary (id, vec[, labels]) frame to the canonical
    * schema + reference null semantics. `dim` > 0 additionally asserts the
    * vector width (distributed check; fails fast on first violation). */
  def canonical(df: DataFrame, idCol: String, vecCol: String,
      labelsCol: Option[String] = None, dim: Int = 0): DataFrame = {
    require(dim <= MaxDims, s"dim $dim exceeds the $MaxDims-dim cap")
    val base = df.select(
      col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(FloatType)).as("vec"),
      labelsCol.map(c => array_sort(array_distinct(filter(
          col(c).cast(ArrayType(ShortType)), x => x.isNotNull))))
        .getOrElse(lit(null).cast(ArrayType(ShortType))).as("labels"))
      .filter(col("vec").isNotNull) // NULL vectors are never indexed
    if (dim <= 0) base
    else base.withColumn("vec",
      when(size(col("vec")) === dim, col("vec")).otherwise(
        raise_error(concat(lit(s"embedding dimension mismatch: expected $dim, got "),
          size(col("vec")).cast(StringType)))))
  }

  /** CSV with the vector as a delimited string column (the common export
    * format: `id,"0.1;0.2;..."`). */
  def readCsv(spark: SparkSession, path: String, idCol: String = "id",
      vecCol: String = "vec", vecDelim: String = ";", dim: Int = 0,
      header: Boolean = true): DataFrame = {
    val raw = spark.read.option("header", header.toString).csv(path)
    canonical(
      raw.withColumn(vecCol, split(col(vecCol), java.util.regex.Pattern.quote(vecDelim))
        .cast(ArrayType(FloatType))),
      idCol, vecCol, None, dim)
  }

  /** JSON-lines with a native array field per row:
    * `{"id": 1, "vec": [0.1, 0.2], "labels": [3]}`. */
  def readJson(spark: SparkSession, path: String, idCol: String = "id",
      vecCol: String = "vec", labelsCol: Option[String] = None,
      dim: Int = 0): DataFrame =
    canonical(spark.read.json(path), idCol, vecCol, labelsCol, dim)

  /** Parquet (the native format of the pipeline). */
  def readParquet(spark: SparkSession, path: String, idCol: String = "id",
      vecCol: String = "vec", labelsCol: Option[String] = None,
      dim: Int = 0): DataFrame =
    canonical(spark.read.parquet(path), idCol, vecCol, labelsCol, dim)

  /** ORC (the other columnar format Spark reads natively). */
  def readOrc(spark: SparkSession, path: String, idCol: String = "id",
      vecCol: String = "vec", labelsCol: Option[String] = None,
      dim: Int = 0): DataFrame =
    canonical(spark.read.orc(path), idCol, vecCol, labelsCol, dim)

  /** Packed-binary vectors (fvecs / numpy-export style): a BINARY column of
    * little-endian float32s becomes the canonical ARRAY<FLOAT>. The unpack
    * is a narrow expression, so the conversion composes with the scan. */
  def fromPackedFloats(df: DataFrame, idCol: String, binCol: String,
      labelsCol: Option[String] = None, dim: Int = 0): DataFrame = {
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unpack_float32_le", es => UnpackFloat32LE(es.head), "built-in")
    canonical(
      df.withColumn(binCol, call_function("unpack_float32_le", col(binCol))),
      idCol, binCol, labelsCol, dim)
  }
}

/** Reinterpret a BINARY column as little-endian float32s → ARRAY<FLOAT>
  * (the layout of fvecs payloads and raw numpy float32 dumps). Rejects
  * lengths that are not a multiple of 4. */
case class UnpackFloat32LE(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def prettyName: String = "unpack_float32_le"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    require(bytes.length % 4 == 0,
      s"$prettyName: ${bytes.length} bytes is not a whole number of float32s")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Any](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = buf.getFloat(i * 4); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): UnpackFloat32LE = copy(child = c)
}
