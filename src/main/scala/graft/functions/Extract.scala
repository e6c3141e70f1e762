package graft.functions

import java.util.regex.Pattern

import graft.util.{HElem, Html, PyText}

/** The byte-identical text-extraction core.
  *
  * Reproduces, exactly, the reference spider's text pipeline:
  *   - `clean_text`            `/root/reference/core/main.py:16-26`
  *   - `fix_chemical_formulas` `/root/reference/core/main.py:28-63`
  *   - `extract_full_text`     `/root/reference/core/main.py:65-72`
  * on the fixture/generator alphabet (see `graft.util.PyText` for the
  * CPython-parity primitives).
  */
object Extract {

  // fix_chemical_formulas: three ordered regex substitutions …
  private val chem1 = Pattern.compile("\\b([A-Z][a-z]?)\\s+(\\d+)\\s*([+-])\\s*")
  private val chem2 = Pattern.compile("\\b([A-Z][a-z]?)\\s+([+-])\\s*")
  private val chem3 = Pattern.compile("\\b([A-Z][a-z]?[A-Z]?[a-z]?)\\s+(\\d*)\\s*([+-])\\s*")
  // … then an ordered literal replace table (core/main.py:46-58; dict
  // insertion order is semantic — Python 3.7+ preserves it).
  private val chemLiterals: Seq[(String, String)] = Seq(
    "Mg 2+" -> "Mg2+", "Ca 2+" -> "Ca2+", "Na +" -> "Na+", "K +" -> "K+",
    "OH -" -> "OH-", "CO 3 2-" -> "CO32-", "SO 4 2-" -> "SO42-",
    "NO 3 -" -> "NO3-", "Cl -" -> "Cl-", "Na +1" -> "Na+1", "Na + " -> "Na+")

  /** Exact no-op precheck for [[fixChemicalFormulas]]: every one of the
    * three regexes and the eleven literal replacements can only fire on a
    * '+' or '-' whose PRECEDING char is a digit or whitespace (chem1: sign
    * after `\d+\s*`; chem2/chem3: sign after `\s+`/`\s*`; every literal has
    * ' ' or a digit before its sign). One char scan instead of three regex
    * passes + eleven literal scans on the ~95% of texts with no such sign —
    * this function runs on EVERY extracted text (clean_text), the parse
    * hot path.
    */
  private def maybeChem(s: String): Boolean = {
    var i = 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '+' || c == '-') {
        val p = s.charAt(i - 1)
        if ((p >= '0' && p <= '9') || PyText.isPySpace(p)) return true
      }
      i += 1
    }
    false
  }

  /** `fix_chemical_formulas(text)` — core/main.py:28-63. */
  def fixChemicalFormulas(text: String): String = {
    if (text == null || text.isEmpty) return text
    if (!maybeChem(text)) return text
    var t = chem1.matcher(text).replaceAll("$1$2$3")
    t = chem2.matcher(t).replaceAll("$1$2")
    t = chem3.matcher(t).replaceAll("$1$2$3")
    chemLiterals.foreach { case (bad, good) => t = t.replace(bad, good) }
    t
  }

  /** `clean_text(text)` — core/main.py:16-26.
    * unescape → collapse `\s+` → strip → chemical-formula fix.
    */
  def cleanText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    fixChemicalFormulas(PyText.pyStrip(PyText.collapseWs(PyText.unescapeHtml(text))))
  }

  /** `extract_full_text(element)` — core/main.py:65-72:
    * all descendant text nodes joined with " ", then cleaned.
    */
  def fullText(e: HElem): String = cleanText(e.joinedText(" "))

  /** Whole-page extracted text: the engine's `text` column contract — every
    * text node of the document in order, joined with " ", cleaned. The pages
    * generator computes the golden value from its raw segments; this function
    * must reproduce it byte-identically from `html` alone.
    */
  def pageText(html: String): String = fullText(Html.parse(html))

  def pageText(htmlBytes: Array[Byte]): String =
    pageText(new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8))
}
