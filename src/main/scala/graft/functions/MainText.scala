package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Main-content (boilerplate-reduced) HTML extraction — the quality ceiling
 * of the whole curation family at 100 TB: `html_to_text` keeps
 * nav/footer/cookie-banner text, and that boilerplate dominates near-dup
 * pair volume (every page of a site shares its chrome) and skews every
 * per-document quality ratio. This kernel implements the PUBLIC
 * block-scoring family of algorithms (jusText, Pomikálek 2011;
 * Boilerpipe, Kohlschütter et al., WSDM 2010; Readability's
 * unlikely-candidates class/id heuristic) in a deterministic,
 * language-agnostic form:
 *
 *  1. segment the tag-stripped document into BLOCKS at block-level tag
 *     boundaries (`p`, `div`, `h1-h6`, `li`, `table` rows/cells,
 *     `article`, `section`, …);
 *  2. per block, track its text (via [[HtmlTextKernel.extract]] — the
 *     same tag-strip/entity/whitespace semantics as `html_to_text`, so
 *     `main_text` is always a sub-sequence of `text`'s vocabulary) and
 *     its ANCHOR text (characters inside `<a>`);
 *  3. classify a block as boilerplate when ANY of:
 *     - it sits inside a structurally-boilerplate element
 *       (`nav`/`header`/`footer`/`aside`/`form`), the HTML5 semantic
 *       signal;
 *     - an ancestor's `class`/`id` matches the unlikely-candidates token
 *       set (`cookie`, `consent`, `banner`, `sidebar`, `menu`, …) — the
 *       Readability-class heuristic that catches cookie/GDPR banners,
 *       share bars and ad slots that density alone cannot;
 *     - its text is shorter than `minBlockChars` (isolated short strings
 *       are navigation/labels, not prose);
 *     - its link density (anchor chars / text chars) exceeds
 *       `maxLinkDensity` (link farms, breadcrumbs, tag clouds);
 *  4. emit the GOOD blocks' texts joined by single spaces.
 *
 * Deliberately heuristic-grade but DETERMINISTIC (same bytes → same
 * main_text on every engine), single-pass over the block-stripped
 * document plus one [[HtmlTextKernel.extract]] per emitted block —
 * linear, no regex machinery, no shuffle. Tag nesting is tracked with a
 * bounded lenient stack (crawl HTML is unbalanced as a rule: an unmatched
 * close tag pops to the nearest matching open, overflow past 256 levels
 * is treated as flat).
 */
object MainTextKernel {
  private val DefaultMinBlockChars = 25
  private val DefaultMaxLinkDensity = 0.33

  /** Block-boundary tags: opening OR closing one ends the current block.
    * (The HTML5 block-level set that matters for text segmentation;
    * inline tags — a, span, em, b, … — keep the block running.) */
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "dl", "dt", "dd", "table", "tr", "td", "th", "thead", "tbody",
      "blockquote", "pre", "article", "section", "header", "footer", "nav",
      "aside", "form", "main", "figure", "figcaption", "body", "html",
      "head", "title", "br", "hr", "fieldset", "address", "center")
      .foreach(s.add)
    s
  }

  /** Structurally-boilerplate containers (HTML5 semantics). */
  private val BadTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("nav", "header", "footer", "aside", "form").foreach(s.add)
    s
  }

  /** The unlikely-candidates token set, matched as SUBSTRINGS of a
    * lowercased class/id attribute value (the public Readability/
    * arc90 heuristic family). */
  private val BadAttrTokens: Array[String] = Array(
    "cookie", "consent", "gdpr", "banner", "breadcrumb", "sidebar",
    "side-bar", "menu", "navbar", "navigation", "footer", "header",
    "social", "share", "comment", "disqus", "promo", "sponsor", "popup",
    "related", "widget", "advert", "-ad-", "ad-slot", "adslot", "pager",
    "pagination", "masthead", "subscribe", "newsletter")

  private def attrsLookBoilerplate(attrs: String): Boolean = {
    // scan class="..." and id="..." values (case-insensitive, quoted or
    // bare) for the token set
    val a = attrs.toLowerCase(java.util.Locale.ROOT)
    var found = false
    var from = 0
    while (!found && from < a.length) {
      val ci = a.indexOf("class", from)
      val ii = a.indexOf("id", from)
      val i = if (ci < 0) ii else if (ii < 0) ci else math.min(ci, ii)
      if (i < 0) return false
      val isClass = i == ci
      var j = i + (if (isClass) 5 else 2)
      while (j < a.length && (a.charAt(j) == ' ' || a.charAt(j) == '=')) j += 1
      val quote = if (j < a.length &&
        (a.charAt(j) == '"' || a.charAt(j) == '\'')) a.charAt(j) else ' '
      val vStart = if (quote != ' ') j + 1 else j
      var vEnd = vStart
      while (vEnd < a.length && a.charAt(vEnd) != quote &&
        (quote != ' ' || a.charAt(vEnd) != ' ')) vEnd += 1
      val v = a.substring(vStart, math.min(vEnd, a.length))
      var k = 0
      while (!found && k < BadAttrTokens.length) {
        if (v.contains(BadAttrTokens(k))) found = true
        k += 1
      }
      from = i + 2
    }
    found
  }

  private final val MaxDepth = 256

  def extract(in: UTF8String): UTF8String =
    extract(in, DefaultMinBlockChars, DefaultMaxLinkDensity)

  def extract(in: UTF8String, minBlockChars: Int,
      maxLinkDensity: Double): UTF8String = {
    val s = HtmlTextKernel.stripScriptStyleComments(in.toString)
    val n = s.length
    val out = new java.lang.StringBuilder(n / 2)
    // lenient tag stack: names + whether the element is boilerplate
    val stackName = new Array[String](MaxDepth)
    val stackBad = new Array[Boolean](MaxDepth)
    var depth = 0
    var badDepth = 0     // count of boilerplate ancestors
    var anchorDepth = 0  // count of open <a>
    // current block: raw html pieces + raw anchor pieces
    val block = new java.lang.StringBuilder(256)
    val anchor = new java.lang.StringBuilder(64)

    def endBlock(): Unit = {
      if (block.length > 0) {
        val inBad = badDepth > 0
        val text = HtmlTextKernel
          .extract(UTF8String.fromString(block.toString)).toString
        if (!inBad && text.length >= minBlockChars) {
          val aText = if (anchor.length == 0) "" else HtmlTextKernel
            .extract(UTF8String.fromString(anchor.toString)).toString
          if (aText.length.toDouble / text.length <= maxLinkDensity) {
            if (out.length > 0) out.append(' ')
            out.append(text)
          }
        }
        block.setLength(0)
        anchor.setLength(0)
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = i + 1 < n && s.charAt(i + 1) == '/'
        var j = i + (if (close) 2 else 1)
        val nameStart = j
        while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
        val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        val tagEnd = s.indexOf('>', j)
        if (tagEnd < 0) {
          // unterminated '<' to EOF stays literal — same as html_to_text
          block.append(c)
          if (anchorDepth > 0) anchor.append(c)
          i += 1
        } else if (name.isEmpty) {
          // a name-less construct (<!doctype>, <?xml?>, "</<", <>): no
          // structural meaning, but html_to_text strips ANY <...> span —
          // mirror that here so a dangling '<' can never strand inside a
          // block whose closing '>' lies beyond the block boundary (the
          // block text re-extraction would then keep it literal while the
          // full extraction stripped it)
          block.append(' ')
          if (anchorDepth > 0) anchor.append(' ')
          i = tagEnd + 1
        } else {
          val attrs = s.substring(j, tagEnd)
          val selfClosed = attrs.endsWith("/") ||
            name == "br" || name == "hr" || name == "img" ||
            name == "meta" || name == "link" || name == "input"
          if (BlockTags.contains(name)) endBlock()
          if (!close && !selfClosed) {
            if (name == "a") anchorDepth += 1
            val bad = BadTags.contains(name) || attrsLookBoilerplate(attrs)
            if (depth < MaxDepth) {
              stackName(depth) = name
              stackBad(depth) = bad
              depth += 1
            }
            if (bad) badDepth += 1
          } else if (close) {
            if (name == "a" && anchorDepth > 0) anchorDepth -= 1
            // pop to the nearest matching open (lenient unbalanced-HTML
            // handling); an unmatched close is ignored
            var k = depth - 1
            while (k >= 0 && stackName(k) != name) k -= 1
            if (k >= 0) {
              var m = depth - 1
              while (m >= k) {
                if (stackBad(m)) badDepth -= 1
                if (stackName(m) == "a" && anchorDepth > 0) anchorDepth -= 1
                m -= 1
              }
              depth = k
            }
          }
          // the tag itself contributes a separator inside the block so
          // inline-tag boundaries don't glue words (same as tag→space in
          // html_to_text)
          block.append(' ')
          if (anchorDepth > 0 || (close && name == "a")) anchor.append(' ')
          i = tagEnd + 1
        }
      } else {
        block.append(c)
        if (anchorDepth > 0) anchor.append(c)
        i += 1
      }
    }
    endBlock()
    UTF8String.fromString(out.toString)
  }
}

/**
 * `main_html_text(html STRING) → STRING` — boilerplate-reduced main
 * content per [[MainTextKernel]] (block segmentation + structural/
 * class-id/length/link-density scoring, the public jusText/Boilerpipe/
 * Readability family). Null in → null out.
 */
case class MainHtmlText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def prettyName: String = "main_html_text"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    MainTextKernel.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MainTextKernel.extract($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
