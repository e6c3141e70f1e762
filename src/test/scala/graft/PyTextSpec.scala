package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Extract
import graft.util.PyText

/** CPython-parity unit tests (expected values computed with CPython 3.11:
  * `html.unescape`, `re.sub/split`, `urllib.parse.quote`).
  */
class PyTextSpec extends AnyFunSuite {

  test("unescape basic entities") {
    assert(PyText.unescapeHtml("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;") ==
      "a & b <c> \"d\" 'e'")
    assert(PyText.unescapeHtml("25 &deg;C &times; 4 &frac12;") == "25 °C × 4 ½")
    assert(PyText.unescapeHtml("x&nbsp;y") == "x y")
    assert(PyText.unescapeHtml("&#65;&#x42;&#X43;") == "ABC")
  }

  test("unescape is single-pass (no re-scan)") {
    assert(PyText.unescapeHtml("&amp;lt;") == "&lt;") // CPython: not "<"
    assert(PyText.unescapeHtml("&amp;amp;") == "&amp;")
  }

  test("unknown entity left intact") {
    assert(PyText.unescapeHtml("AT&T; &bogus; &") == "AT&T; &bogus; &")
  }

  test("collapse whitespace incl U+00A0 and U+0085 (Python \\s)") {
    assert(PyText.collapseWs("a  \t\nb") == "a b")
    assert(PyText.pyStrip("  x  ") == "x")
  }

  test("pyQuote matches urllib.parse.quote") {
    assert(PyText.pyQuote("fig 9 a.png") == "fig%209%20a.png")
    assert(PyText.pyQuote("a/b c.png") == "a/b%20c.png")
    assert(PyText.pyQuote("naïve.png") == "na%C3%AFve.png")
    assert(PyText.pyQuote("x_~-.png") == "x_~-.png")
    assert(PyText.pyQuote("q+r&s.png") == "q%2Br%26s.png")
  }

  test("splitWithCaptures keeps groups like re.split") {
    val p = Pattern.compile("\\s*\\(([a-d])\\)\\s*")
    assert(PyText.splitWithCaptures(p, "intro (a) one (b) two") ==
      Vector("intro", "a", "one", "b", "two"))
    assert(PyText.splitWithCaptures(p, "(a) starts") == Vector("", "a", "starts"))
    assert(PyText.splitWithCaptures(p, "no parts here") == Vector("no parts here"))
  }

  test("split1 = re.split maxsplit=1") {
    val p = Pattern.compile("\\s+(?:Mark|Solution)\\s+")
    assert(PyText.split1(p, "q text Solution s text Mark more") ==
      (("q text", "s text Mark more", true)))
    assert(PyText.split1(p, "no split") == (("no split", "", false)))
  }

  test("chemical formula fixes (reference order and quirks)") {
    assert(Extract.fixChemicalFormulas("the ion Mg 2+ reacts") == "the ion Mg2+reacts")
    assert(Extract.fixChemicalFormulas("a SO 4 2- ion") == "a SO42- ion")
    assert(Extract.fixChemicalFormulas("Na + combines") == "Na+combines")
    assert(Extract.fixChemicalFormulas("CO 3 2- appears") == "CO32- appears")
  }

  test("cleanText pipeline order: unescape, collapse, strip, chem") {
    assert(Extract.cleanText("  Mg&nbsp;2+  x ") == "Mg2+x")
    assert(Extract.cleanText(null) == "")
    assert(Extract.cleanText("") == "")
  }
}
