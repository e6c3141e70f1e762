package graft.util

import java.util.regex.{Matcher, Pattern}

/** Python-parity text primitives.
  *
  * The reference pipeline (`/root/reference/core/main.py:16-63`) cleans text
  * with CPython's `html.unescape`, `re.sub(r"\s+", " ", ...)` and `str.strip`.
  * Java's `\s` and `String.trim` differ from CPython on non-ASCII whitespace
  * (U+00A0, U+0085, Unicode Z category), and Java's `String.split` drops
  * captured groups that CPython's `re.split` keeps. These helpers reproduce
  * the CPython behaviour exactly on the alphabet our page generator emits,
  * which is what the byte-identical-extracted-text invariant requires.
  */
object PyText {

  /** CPython `\s` / `str.isspace` character class (Unicode semantics).
    * ASCII fast path first (exact): `Character.getType` is a table walk and
    * ran per char of every cleaned text on the parse hot path; no char below
    * 0x80 is in the Unicode Z categories except ' ' itself.
    */
  def isPySpace(c: Char): Boolean =
    if (c < 0x80) (c >= 0x09 && c <= 0x0d) || c == ' ' || (c >= 0x1c && c <= 0x1f)
    else c == '\u0085' || {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR
    }

  /** Python `str.strip()` (no-arg form). */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Python `re.sub(r"\s+", " ", s)` with Unicode `\s`. */
  def collapseWs(s: String): String = {
    // no-op fast path: most hot-path inputs (text nodes joined with single
    // spaces) contain no runs and no non-' ' whitespace — one scan, and the
    // copy/allocation is skipped entirely. A change is needed only when a
    // non-' ' py-space occurs, or a ' ' is followed by more py-space.
    var k = 0
    val m = s.length
    var dirty = false
    while (k < m && !dirty) {
      val c = s.charAt(k)
      if (c == ' ') { if (k + 1 < m && isPySpace(s.charAt(k + 1))) dirty = true }
      else if (isPySpace(c)) dirty = true
      k += 1
    }
    if (!dirty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isPySpace(c)) {
        sb.append(' ')
        while (i < n && isPySpace(s.charAt(i))) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  // --- html.unescape (single-pass, no re-scan of replacements) -------------

  /** Named entities the page generator may emit (strict subset of the HTML5
    * table CPython's `html.unescape` uses; all forms here require the
    * trailing `;`, which the generator always writes).
    */
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "ndash" -> "–", "mdash" -> "—",
    "deg" -> "°", "times" -> "×", "divide" -> "÷",
    "plusmn" -> "±", "sup2" -> "²", "sup3" -> "³",
    "frac12" -> "½", "frac14" -> "¼", "micro" -> "µ",
    "middot" -> "·", "alpha" -> "α", "beta" -> "β",
    "gamma" -> "γ", "pi" -> "π", "Delta" -> "Δ",
    "rarr" -> "→", "larr" -> "←", "le" -> "≤", "ge" -> "≥",
    "ne" -> "≠", "minus" -> "−", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "cent" -> "¢", "pound" -> "£",
    "copy" -> "©", "reg" -> "®", "frac34" -> "¾",
    "sup1" -> "¹", "omega" -> "ω", "theta" -> "θ")

  /** CPython `html.unescape` restricted to the generator alphabet:
    * `&name;` from the table above, `&#NNN;` and `&#xHH;` numeric refs.
    * Replacements are emitted once and never re-scanned (matching CPython's
    * single regex substitution pass), so `&amp;lt;` → `&lt;` not `<`.
    */
  def unescapeHtml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 32) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val rep: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try new String(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            } else named.getOrElse(body, null)
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  // --- CPython re.split parity ---------------------------------------------

  /** `re.split(pat, s)` where `pat` has exactly one capture group: the result
    * alternates [text, group1, text, group1, ..., text] — CPython keeps the
    * captured delimiter, `java.lang.String.split` drops it.
    */
  def splitWithCaptures(p: Pattern, s: String): Vector[String] = {
    val m = p.matcher(s)
    val out = Vector.newBuilder[String]
    var last = 0
    while (m.find()) {
      out += s.substring(last, m.start)
      out += m.group(1)
      last = m.end
    }
    out += s.substring(last)
    out.result()
  }

  /** `re.split(pat, s, maxsplit=1)` (no capture groups kept). */
  def split1(p: Pattern, s: String): (String, String, Boolean) = {
    val m = p.matcher(s)
    if (m.find()) (s.substring(0, m.start), s.substring(m.end), true)
    else (s, "", false)
  }

  /** `urllib.parse.quote(s)` with default `safe='/'`:
    * percent-encodes UTF-8 bytes of everything except unreserved
    * [A-Za-z0-9_.~-] and '/'. (`/root/reference/core/main.py:353-365`)
    */
  def pyQuote(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = b.toChar
      val safe = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '~' ||
        c == '-' || c == '/'
      if (safe) sb.append(c)
      else sb.append(f"%%$b%02X")
      i += 1
    }
    sb.toString
  }

  /** CPython `str.title()`: uppercase every cased char that follows a
    * non-cased char, lowercase the rest — so "social-studies" →
    * "Social-Studies" (a word boundary at '-', unlike capitalize-per-token).
    */
  def pyTitle(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    s.foreach { c =>
      if (c.isLetter) {
        sb.append(if (prevCased) c.toLower else c.toUpper)
        prevCased = true
      } else { sb.append(c); prevCased = false }
    }
    sb.toString
  }

  /** Escape raw text for embedding in generated HTML (inverse of one decode
    * level; used only by the test-data generator).
    */
  def escapeHtml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\u00a0' => sb.append("&nbsp;")
        case '×' => sb.append("&times;")
        case '°' => sb.append("&deg;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
