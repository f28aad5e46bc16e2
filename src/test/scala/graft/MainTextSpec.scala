package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MainTextKernel

/** Unit pins for [[graft.functions.MainTextKernel]] — the block-scoring
  * boilerplate reducer (jusText/Boilerpipe/Readability family). The
  * fixture-level behavior (chrome page through the real bridge) is pinned
  * by WarcSourceSpec + the `warc_main_text` oracle; these are the edge
  * semantics. */
class MainTextSpec extends AnyFunSuite {
  private def m(html: String): String =
    MainTextKernel.extract(UTF8String.fromString(html)).toString

  private val prose = "This sentence is long enough to pass the minimum " +
    "block length threshold easily."

  test("structural boilerplate containers drop regardless of content") {
    for (tag <- Seq("nav", "header", "footer", "aside", "form"))
      assert(m(s"<body><$tag><p>$prose</p></$tag><p>$prose</p></body>")
        == prose, s"<$tag> content must drop")
  }

  test("unlikely class/id tokens drop the subtree") {
    assert(m(s"""<div class="cookie-banner"><p>$prose</p></div><p>$prose</p>""")
      == prose)
    assert(m(s"""<div id="sidebar"><p>$prose</p></div><p>$prose</p>""")
      == prose)
    // an innocent class keeps the block
    assert(m(s"""<div class="article-body"><p>$prose</p></div>""") == prose)
  }

  test("short blocks drop, long blocks stay") {
    assert(m("<p>Too short.</p>") == "")
    assert(m(s"<p>$prose</p>") == prose)
  }

  test("high link density drops a block") {
    val linky = "<p><a href=\"/a\">First long anchor text here</a> " +
      "<a href=\"/b\">Second long anchor text here</a> glue</p>"
    assert(m(linky) == "")
    // prose with one small link inside stays
    val oneLink = s"<p>$prose See <a href=\"/x\">here</a> for more " +
      "information about everything.</p>"
    assert(m(oneLink).startsWith("This sentence"))
  }

  test("good blocks join with single spaces in document order") {
    val a = "First paragraph of genuine article prose, long enough to stay."
    val b = "Second paragraph of genuine article prose, also long enough."
    assert(m(s"<article><p>$a</p><p>$b</p></article>") == s"$a $b")
  }

  test("unbalanced/lenient HTML never throws and recovers scope") {
    // unclosed <nav>: everything after stays suppressed until a close pops
    assert(m(s"<nav><p>$prose</p><p>$prose</p>") == "")
    // stray close tags are ignored
    assert(m(s"</div></nav><p>$prose</p>") == prose)
    // a close tag pops intervening unclosed opens (lenient stack)
    assert(m(s"<div><span><p>$prose</p></div><p>$prose</p>") == s"$prose $prose")
  }

  test("empty and markup-free inputs") {
    assert(m("") == "")
    assert(m(prose) == prose) // bare text = one block
  }

  test("fuzz: main_text tokens ⊆ html_to_text tokens, and never a throw") {
    // main_text is a SELECTION of the full extraction, never a rewrite:
    // every whitespace token it emits must appear among html_to_text's
    // tokens for the same document (block text reuses HtmlTextKernel, so
    // the containment holds even on the broken markup real crawls carry)
    val rnd = new scala.util.Random(151515)
    val frags = Array(
      "<p>", "</p>", "<div>", "</div>", "<a href=\"/x\">", "</a>",
      "<nav>", "</nav>", "<footer>", "</footer>", "<br>", "<span>",
      "</span>", "<div class=\"cookie\">", "<div class=\"content\">",
      "<!doctype html>", "<!-- note -->", "<!--", "<script>x</script>",
      "<script>", "<style>a{}</style>", "< notag", "&amp;", "&#8212;",
      "&nbsp;", "&broken", "words of ordinary prose ", "linktext ",
      "Another reasonably long sentence fragment to fill blocks up. ",
      "short ", "  ", "\n", "é漢字 ", "<p est>", "x>y ", "</", ">")
    (0 until 400).foreach { _ =>
      val html = (0 until (2 + rnd.nextInt(40)))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      val main = m(html) // must not throw
      val full = graft.functions.HtmlTextKernel
        .extract(UTF8String.fromString(html)).toString
      val fullTokens = full.split(" ").toSet
      val bad = main.split(" ").filter(t => t.nonEmpty && !fullTokens(t))
      assert(bad.isEmpty,
        s"main_text tokens ${bad.toSeq} not in full extraction\n" +
          s"html=$html\nmain=$main\nfull=$full")
    }
  }
}
