package graft

import graft.core.HtmlStrip
import org.scalatest.funsuite.AnyFunSuite

/** [[HtmlStrip.lucene]] pinned against the reference's OWN
  * `TestHTMLStripCharFilter` vectors (block-tag `\n` replacement, inline
  * silent strip, quote-aware tags, comments, entities). [[HtmlStrip.apply]]
  * stays the corpus-contract mode (all tags silent) — its invariant lives in
  * WebtextSpec. The two divergences from the generated DFA are pinned at the
  * bottom so a regression in either direction is visible. */
class HtmlFidelitySpec extends AnyFunSuite {

  test("block tags replace with newline, inline tags strip silently (test())") {
    val html = "<div class=\"foo\">this is some text</div> here is a <a href=\"#bar\">link</a> and " +
      "another <a href=\"http://lucene.apache.org/\">link</a>. " +
      "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    val gold = "\nthis is some text\n here is a link and " +
      "another link. " +
      "This is an entity: & plus a <.  Here is an &. "
    assert(HtmlStrip.lucene(html) == gold)
  }

  test("BR forms (testBR)") {
    assert(HtmlStrip.lucene("one<BR />two<br>three") == "one\ntwo\nthree")
    assert(HtmlStrip.lucene("one<BR some stuff here too>two</BR>") == "one\ntwo\n")
  }

  test("entities: named latin-1, greek, numeric dec and hex (testEntities/testMoreEntities)") {
    assert(HtmlStrip.lucene("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;") ==
      "  <foo> Übermensch = Γ bar Γ")
    assert(HtmlStrip.lucene("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;") ==
      "  <junk/>   ! @ and ’")
    assert(HtmlStrip.lucene("&Gamma;") == "Γ")
  }

  test("comments and declarations strip to nothing (testComment)") {
    assert(HtmlStrip.lucene("<!--- three dashes, still a valid comment ---> ") == " ")
    assert(HtmlStrip.lucene("<! -- blah > ") == " ") // a declaration, not a comment
    assert(HtmlStrip.lucene("<!--" + "x" * 500) == "") // unterminated comment eats to EOF
  }

  test("script and style bodies collapse to one newline (testStyle / testScriptQuotes 1)") {
    assert(HtmlStrip.lucene("one<style type=\"text/css\">\n<!--\n@import url('x.css');\n-->\n</style>two") ==
      "one\ntwo")
    assert(HtmlStrip.lucene(
      "one<script attr= bare><!-- action('<!-- comment -->', \"\\\"-->\\\"\"); --></script>two") ==
      "one\ntwo")
  }

  test("quote-aware tag scan: '>' inside attribute values does not end the tag (testServerSideIncludes)") {
    val html = "one<img src=\"image.png\"\n" +
      " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->\\'Comment\\'}'  -->\"\n\n" +
      " title=\"Title: <!--#echo var=\"IMAGE_CAPTION\"-->\">two"
    assert(HtmlStrip.lucene(html) == "onetwo") // img is inline: strips silently
    val script = "one<script><!-- <!--#config comment=\"<!-- \\\"comment\\\"-->\"--> --></script>two"
    assert(HtmlStrip.lucene(script) == "one\ntwo")
  }

  test("corpus mode unchanged: all tags silent, invariant-compatible") {
    assert(HtmlStrip("<html><body><p>hi there</p></body></html>") == "hi there")
    assert(HtmlStrip("a &amp; b &lt;c&gt; &#65; &#x42;") == "a & b <c> A B")
    // the widened entity table serves both modes
    assert(HtmlStrip("&Uuml; &hellip; &sigma;") == "Ü … σ")
  }

  test("pinned divergences from the generated DFA") {
    // 1. a quoted '</script>' inside a script body terminates our scan early
    //    (the DFA tracks script-comment state); reference gold is "hello\n"
    val d1 = HtmlStrip.lucene("hello<script><!-- f('<!--internal--></script>'); --></script>")
    assert(d1 == "hello\n'); -->\n")
    // 2. interleaved malformed tags ("<a hr<ef=aa<a>>") are passed through
    //    differently than the DFA's longest-match backtracking; unquoted
    //    well-formed markup is unaffected
    assert(HtmlStrip.lucene("a <b>bold</b>") == "a bold")
  }
}
