package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Round-13: HTML main-text extraction — the tag walk, raw script/
  * style skipping, entity decoding, and the link-density boilerplate
  * rule, pinned on hand fixtures including malformed input. */
class HtmlExtractSpec extends AnyFunSuite {

  private def ex(html: String) = TextAnalysis.htmlMainText(html)

  test("plain paragraphs extract verbatim with whitespace collapsed") {
    val e = ex("<html><body><p>hello   world</p>\n<p>second\tblock</p></body></html>")
    assert(e.text == "hello world second block")
    assert(e.nLinks == 0 && e.nScripts == 0 && e.droppedBlocks == 0)
  }

  test("script and style content is raw-skipped, even when it contains decoy markup") {
    val e = ex("""<body><p>real</p><script>var s = "<p>decoy</p> <a href='x'>no</a>";</script>
      |<style>p { color: red; } /* <div>also decoy</div> */</style><p>text</p></body>""".stripMargin)
    assert(e.text == "real text")
    assert(e.nScripts == 1)
    assert(e.nLinks == 0, "decoy <a> inside script must not count")
  }

  test("many script blocks and mixed-case close tags all raw-skip (single-pass scan)") {
    // A real crawled page shape: dozens of script blocks. The close-tag
    // scan must be ignore-case (</SCRIPT>, </Script>) and must not
    // re-copy the document per block (regionMatches scan, no toLowerCase).
    val blocks = (1 to 40).map { i =>
      val close = if (i % 3 == 0) "</SCRIPT>" else if (i % 3 == 1) "</Script>" else "</script>"
      s"<script>var x$i = '<p>decoy $i</p>';$close"
    }.mkString
    val e = ex(s"<body><p>head</p>$blocks<STYLE>p{}</StYlE><p>tail</p></body>")
    assert(e.text == "head tail")
    assert(e.nScripts == 40)
    assert(e.nLinks == 0)
  }

  test("link-density rule: navs die, prose with incidental links lives") {
    val e = ex(
      """<div><a href="/">Home</a> <a href="/b">About</a></div>
        |<p>read the <a href="/doc">full manual</a> for details and background</p>""".stripMargin)
    // nav: 2 words, 2 link words -> dropped; prose: 9 words, 2 link words -> kept
    assert(e.text == "read the full manual for details and background")
    assert(e.droppedBlocks == 1)
    assert(e.nLinks == 3)
  }

  test("exactly-half link density is kept (strictly-more-than-half dies)") {
    val e = ex("<p>go <a href='/'>here now</a> ok</p><p>x <a href='/'>y z</a></p>")
    // block 1: 4 words, 2 linked -> kept; block 2: 3 words, 2 linked -> dropped
    assert(e.text == "go here now ok")
    assert(e.droppedBlocks == 1)
  }

  test("entities decode in text") {
    val e = ex("<p>&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>")
    assert(e.text == """& <tag> "q" 's' end""")
  }

  test("malformed input never throws: unclosed tags, stray closers, truncation") {
    assert(ex("<p>open block never closed").text == "open block never closed")
    assert(ex("</p></div>text<p>more").text == "text more")
    assert(ex("<p>cut off <a hre").text == "cut off")
    assert(ex("<script>never closed <p>gone</p>").text == "")
    assert(ex("").text == "")
    assert(ex("no tags at all").text == "no tags at all")
  }

  test("nested inline tags are transparent; only p/div bound blocks") {
    val e = ex("<div><span>one <b>two</b></span> three</div><p><em>four</em></p>")
    assert(e.text == "one two three four")
    assert(e.droppedBlocks == 0)
  }

  // --- URL canonicalization (the crawl-dedup companion) ---

  private def cu(u: String) = TextAnalysis.canonicalUrl(u)

  test("url: case, default ports, fragments, trailing slash") {
    assert(cu("HTTPS://Example.COM:443/a/b/#frag") == "https://example.com/a/b")
    assert(cu("http://HOST.net:80/") == "http://host.net/")
    assert(cu("http://host.net:8080/x") == "http://host.net:8080/x", "non-default port kept")
    assert(cu("https://h.com/a//b/") == "https://h.com/a//b", "only ONE trailing slash trimmed")
    assert(cu("https://h.com") == "https://h.com", "no path stays bare")
  }

  test("url: tracking params stripped, survivors sorted, values kept") {
    assert(cu("https://h.com/p?utm_source=a&b=2&a=1&gclid=xyz&fbclid=q&ref=z")
      == "https://h.com/p?a=1&b=2")
    assert(cu("https://h.com/p?z=1&z=0&a") == "https://h.com/p?a&z=0&z=1",
      "duplicate keys sort by value; bare keys survive")
    assert(cu("https://h.com/p?utm_only=1") == "https://h.com/p")
  }

  test("url: non-URLs canonicalize to themselves, never throw") {
    assert(cu("not a url") == "not a url")
    assert(cu("  mailto:x@y.z  ") == "mailto:x@y.z")
    assert(cu("://weird") == "://weird")
    assert(cu("") == "")
  }
}
