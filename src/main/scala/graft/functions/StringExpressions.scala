package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Runtime kernel for [[CharsetDecode]] — static so generated code calls it
 * directly (one static call per row inside whole-stage codegen; the decode
 * itself dominates, exactly like the built-in `decode`).
 *
 * Contract (the crawl-ingestion decode semantics, where the charset name
 * comes from an UNTRUSTED HTTP header and the bytes from an untrusted
 * server):
 *  - charset name empty/unknown/unsupported → fall back to UTF-8 (never
 *    throw on a bad label; a 100 TB ingest must not die on one typo'd
 *    `charset=utf8mb4` header);
 *  - malformed byte sequences and unmappable characters REPLACE with U+FFFD
 *    (the browser behavior), never throw — unlike Spark's built-in `decode`,
 *    which (a) whitelists six charsets unless a legacy flag is set, so
 *    windows-1252/Shift_JIS are unreachable, and (b) raises
 *    MALFORMED_CHARACTER_CODING under ANSI on bad bytes;
 *  - deterministic: same bytes + same label → same string, everywhere.
 */
object CharsetDecodeKernel {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Charset]()

  private def lookup(name: UTF8String): Charset = {
    if (name == null) return StandardCharsets.UTF_8
    val s = name.toString.trim
    if (s.isEmpty) StandardCharsets.UTF_8
    else cache.computeIfAbsent(s.toLowerCase(java.util.Locale.ROOT), k =>
      try Charset.forName(k)
      catch { case _: Exception => StandardCharsets.UTF_8 })
  }

  def decode(bytes: Array[Byte], charsetName: UTF8String): UTF8String = {
    val cs = lookup(charsetName)
    // CharsetDecoder instances are not thread-safe → one per call; cheap
    // next to the decode pass itself
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
  }
}

/**
 * `charset_decode(payload BINARY, charset STRING) → STRING` — decode bytes
 * per a server-declared charset label with U+FFFD replacement, UTF-8
 * fallback on unknown labels (see [[CharsetDecodeKernel]] for the exact
 * contract and why the built-in `decode` cannot serve here). Null in either
 * input → null (an EMPTY charset label means UTF-8 — coalesce a nullable
 * label to '' upstream).
 */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "charset_decode"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(bytes: Any, cs: Any): Any =
    CharsetDecodeKernel.decode(bytes.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.functions.CharsetDecodeKernel.decode($b, $c);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
