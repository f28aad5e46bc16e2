package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text analysis for large-scale training-data pipelines: token counting,
 * n-gram language ID, quality scoring, document fingerprinting. All hot-path
 * operations are either Catalyst built-ins (codegen'd, pushdown-friendly) or
 * narrow custom expressions — no shuffles beyond the caller's aggregations.
 */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text → zero tokens). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: whitespace tokens plus extra splits
    * on digit/letter boundaries and punctuation (a cheap, deterministic
    * stand-in for a real tokenizer's token count). */
  def subwordCount(text: Column): Column =
    size(filter(split(trim(text), "[\\s]+|(?<=[a-z])(?=[A-Z0-9])|(?=[^\\w\\s])"),
      t => length(t) > 0))

  /** Tiny per-language stopword profiles for n-gram language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /**
   * Stopword-profile language ID: argmax of per-language stopword hit counts
   * with a deterministic priority order on ties ("und" = unknown when no
   * profile matches at all).
   */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    // build nested CASE: languages in fixed priority order; strict > keeps
    // the tie-break deterministic (first language in order wins ties)
    val langsOrdered = Seq("en", "es", "de", "fr", "zh")
    val hits = langsOrdered.map(l => l -> stopwordHits(toks, stopwords(l))).toMap
    val best = langsOrdered.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestHits), l) =>
        val h = hits(l)
        (when(h > bestHits, lit(l)).otherwise(bestLang),
          when(h > bestHits, h).otherwise(bestHits))
    }
    best._1
  }

  /**
   * Quality signals in the Gopher/C4 style: token stats, alpha/digit/punct
   * ratios, stopword ratio, plus a composite [0,1] score. All built-ins.
   */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    val nChar = length(text).cast(DoubleType)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast(DoubleType)
    val digit = length(regexp_replace(text, "[^0-9]", "")).cast(DoubleType)
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast(DoubleType)
    val stopHits = stopwordHits(toks, stopwords("en")).cast(DoubleType)
    val avgTokLen = when(nTok > 0, (aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType)) / nTok).otherwise(lit(0.0))
    val alphaRatio = when(nChar > 0, alpha / nChar).otherwise(0.0)
    val digitRatio = when(nChar > 0, digit / nChar).otherwise(0.0)
    val punctRatio = when(nChar > 0, punct / nChar).otherwise(0.0)
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(0.0)
    // composite: reward alphabetic text with sane token lengths & stopwords
    val score =
      (alphaRatio * 0.4) +
        (least(stopRatio * lit(5.0), lit(1.0)) * 0.3) +
        (when(avgTokLen >= 3 && avgTokLen <= 10, 1.0).otherwise(0.0) * 0.2) +
        ((lit(1.0) - least(digitRatio * 5.0, lit(1.0))) * 0.1)
    Seq(
      "n_tokens" -> nTok,
      "avg_token_len" -> avgTokLen,
      "alpha_ratio" -> alphaRatio,
      "digit_ratio" -> digitRatio,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "doc_fingerprint", es => DocFingerprint(es.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", es => SimHash64(es.head), "built-in")
  }

  def doc_fingerprint(spark: SparkSession, text: Column): Column = {
    register(spark); call_function("doc_fingerprint", text)
  }
  def simhash64(spark: SparkSession, toks: Column): Column = {
    register(spark); call_function("simhash64", toks)
  }
}

/** 64-bit FNV-1a with a final avalanche — deterministic, dependency-free. */
private[operators] object Hash64 {
  final def bytes(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    avalanche(h)
  }
  final def avalanche(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }
}

/**
 * Winnowing document fingerprint (Karp-Rabin style): lowercase + collapse
 * whitespace, hash every k-char gram, take the minimum gram hash per sliding
 * window of w grams, and combine the selected hashes order-independently.
 * Near-identical documents produce identical fingerprints with high
 * probability; any single-character edit changes at most w window minima.
 */
case class DocFingerprint(child: Expression, k: Int = 8, w: Int = 16)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "doc_fingerprint"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
      .toLowerCase.replaceAll("\\s+", " ").trim
    val b = s.getBytes("UTF-8")
    if (b.length < k) Hash64.bytes(b, 0, b.length)
    else {
      val nGrams = b.length - k + 1
      val gramHash = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) { gramHash(i) = Hash64.bytes(b, i, i + k); i += 1 }
      var acc = 0L
      var start = 0
      while (start < nGrams) {
        val end = math.min(start + w, nGrams)
        var mn = Long.MaxValue
        var j = start
        while (j < end) { if (gramHash(j) < mn) mn = gramHash(j); j += 1 }
        acc ^= Hash64.avalanche(mn) // order-independent combine of window minima
        start += w
      }
      acc
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * 64-bit SimHash over a token array: each token votes ±1 per bit position of
 * its 64-bit hash; the sign of each bit-sum forms the signature. Documents
 * with small Hamming distance between signatures share most tokens.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        val h = Hash64.bytes(b, 0, b.length)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) sig |= 1L << bit; bit += 1 }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
