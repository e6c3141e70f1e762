package graft.functions

import java.util.regex.Pattern

import graft.util.{HElem, HText, Html, PyText}

/** Parsed-question data model (SURVEY.md §1.3).
  *
  * Field nullability mirrors the reference's dict-key presence:
  * `answer`/`solution` keys are only set when found
  * (`/root/reference/core/main.py:178-201,255-291`), so they are `null`
  * (not "") when absent; `options` is null for theory questions and
  * `subparts` is empty for mcq.
  */
final case class SubSub(part: String, question: String)
final case class Subpart(part: String, question: String,
                         subparts: Seq[SubSub], solution: String)
final case class Options(A: String, B: String, C: String, D: String) {
  def anyNonEmpty: Boolean = A.nonEmpty || B.nonEmpty || C.nonEmpty || D.nonEmpty
}
/** `answer_after_solution` carries the reference's dict-key-order provenance
  * (core/main.py:177-183): when the HTML fallback (F9) supplies the answer
  * for a question whose solution text existed, the reference appends the
  * `answer` key AFTER the already-present `solution` key — insertion-ordered
  * sinks (raw feeds, restructured JSON) must emit `..., solution, answer`
  * for exactly those rows, `..., answer, solution` otherwise.
  */
final case class Question(section: String, qtype: String, number: Int,
                          question: String, options: Options,
                          subparts: Seq[Subpart], diagrams: Seq[String],
                          answer: String, solution: String,
                          answer_after_solution: Boolean = false)

final case class ParsedPage(questions: Seq[Question], next: String)

/** Faithful re-expression of the reference spider's per-page parse
  * (`/root/reference/core/main.py`, class `KuulchatSpider`). One pass over
  * the DOM; pure function of the html string — runs row-wise inside a Spark
  * projection (no shuffle).
  */
object QuestionParser {

  // --- compiled patterns (CPython `re` → java.util.regex, verified parity) --
  private val trailingDot = Pattern.compile("\\.$") // stripTrailingDot's terminator fallback
  private val anyLetter = Pattern.compile("([A-D])")
  private val mainPartSplit = Pattern.compile("\\s*\\(([a-d])\\)\\s*")
  private val subPartSplit = Pattern.compile("\\s*\\(([ivx]+|[a-z])\\)\\s*")
  // extract_options_from_text patterns, core/main.py:226-233 (MULTILINE and
  // DOTALL are set in the reference; text is single-line post-clean but the
  // flags are kept for fidelity).
  private val optFlags = Pattern.MULTILINE | Pattern.DOTALL
  private val optPatterns = Seq(
    Pattern.compile("([A-D])\\.\\s*([^A-D]*?)(?=\\s+[A-D]\\.|$)", optFlags),
    Pattern.compile("([A-D])\\s*\\.\\s*([^A-D]*?)(?=\\s*[A-D]\\s*\\.|$)", optFlags),
    Pattern.compile("([A-D])\\s*\\.?\\s*([^\\n]*?)(?=\\s*[A-D]\\s*\\.|\\n[A-D]\\s*\\.|$)", optFlags))
  private val adKeywords = Seq( // core/main.py:81-89
    "sponsored", "advertise", "kuulchat media", "kuulpay.com",
    "get a professional", "affordable website", "management system")
  private val adImagePatterns = Seq("banner", "ad", "sponsor", "promo")

  import Extract.{cleanText, fullText}

  // --- allocation-free twins of the per-question regex transforms ----------
  // Each replaces a precompiled-Pattern replaceAll/replaceFirst that ran per
  // extracted option/stem/solution (3 Matcher allocations + regex scans per
  // option): semantics are EXACTLY the pattern's, noted per function, and the
  // whole family is gated by the CPython byte-parity oracle + c2/r2 oracles.

  /** Java `c \in \s` — Pattern `\s` without UNICODE_CHARACTER_CLASS is the
    * ASCII set [ \t\n\x0B\f\r] only.
    */
  private[graft] def isJavaWs(c: Char): Boolean =
    c == ' ' || (c >= 0x09 && c <= 0x0d)

  /** Exact twin of `wsRun.matcher(s).replaceAll(" ")` (`\s+` → " ", Java
    * ASCII `\s`): each maximal run of Java-ws chars becomes one ' '. No-op
    * fast path returns `s` unshared — post-cleanText inputs hold only
    * solitary ' ' chars, so the replace was a pure realloc almost always.
    */
  private[graft] def collapseJavaWs(s: String): String = {
    val n = s.length
    var k = 0
    var dirty = false
    while (k < n && !dirty) {
      val c = s.charAt(k)
      if (c == ' ') { if (k + 1 < n && isJavaWs(s.charAt(k + 1))) dirty = true }
      else if (isJavaWs(c)) dirty = true
      k += 1
    }
    if (!dirty) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isJavaWs(c)) {
        sb.append(' ')
        while (i < n && isJavaWs(s.charAt(i))) i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Exact twin of `trailingDot.matcher(s).replaceAll("")` (`\.$`, no
    * MULTILINE). `$` also matches just before one final line terminator, so
    * inputs holding '\n'/'\r' fall back to the Pattern — unreachable after
    * collapseJavaWs (which rewrote every terminator to ' '), but exactness
    * is kept unconditional.
    */
  private[graft] def stripTrailingDot(s: String): String = {
    if (s.indexOf('\n') >= 0 || s.indexOf('\r') >= 0)
      return trailingDot.matcher(s).replaceAll("")
    if (s.nonEmpty && s.charAt(s.length - 1) == '.') s.substring(0, s.length - 1)
    else s
  }

  /** Exact twin of `bullet.matcher(s).replaceAll("")` (`^\s*[-•]\s*`, no
    * MULTILINE): `^` only matches at position 0, so at most one replacement —
    * greedy `\s*` either side of one '-'/'•'.
    */
  private[graft] def stripBullet(s: String): String = {
    val n = s.length
    var i = 0
    while (i < n && isJavaWs(s.charAt(i))) i += 1
    if (i >= n || (s.charAt(i) != '-' && s.charAt(i) != '•')) return s
    i += 1
    while (i < n && isJavaWs(s.charAt(i))) i += 1
    s.substring(i)
  }

  /** MULTILINE `$` can also match before a line terminator, so the option
    * pattern-1 twin only runs on terminator-free inputs (always true after
    * cleanText, which rewrote every py-space to ' '; the Pattern handles the
    * rest). The five Java line terminators.
    */
  private[graft] def hasLineTerminator(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val ci = c.toInt
      if (ci == 10 || ci == 13 || ci == 0x85 || ci == 0x2028 || ci == 0x2029)
        return true
      i += 1
    }
    false
  }

  private def isOptLetter(c: Char): Boolean = c >= 'A' && c <= 'D'

  /** Lookahead `(?=\s+[A-D]\.|$)` of option pattern 1 at position `e`, on a
    * terminator-free input ($ ≡ end). `\s+` can only stop at the end of the
    * ws run (mid-run chars are ws, not [A-D]).
    */
  private def p1Lookahead(s: String, e: Int): Boolean = {
    val n = s.length
    if (e == n) return true
    if (!isJavaWs(s.charAt(e))) return false
    var j = e + 1
    while (j < n && isJavaWs(s.charAt(j))) j += 1
    j + 1 < n && isOptLetter(s.charAt(j)) && s.charAt(j + 1) == '.'
  }

  /** Exact twin of one `find()` of option pattern 1,
    * `([A-D])\.\s*([^A-D]*?)(?=\s+[A-D]\.|$)`, from index `from` on a
    * terminator-free input. Backtracking order derived from the engine:
    * greedy `\s*` at width w first, lazy capture extends e ascending from
    * capStart+w up to the first A-D char (the capture class excludes A-D);
    * on failure `\s*` shrinks one ws at a time, which only ever adds the
    * position capStart+k itself with an EMPTY capture — so the twin checks
    * e ascending in [capStart+w, firstAD], then e descending in
    * [capStart+w-1, capStart] with group2 = "". Returns
    * (letterIdx, g2start, g2end, matchEnd) packed via the out array, or
    * false when no further match.
    */
  private def p1Find(s: String, from: Int, out: Array[Int]): Boolean = {
    val n = s.length
    var p = from
    while (p < n - 1) {
      if (isOptLetter(s.charAt(p)) && s.charAt(p + 1) == '.') {
        val capStart = p + 2
        var we = capStart
        while (we < n && isJavaWs(s.charAt(we))) we += 1 // capStart+w
        var fAD = we
        while (fAD < n && !isOptLetter(s.charAt(fAD))) fAD += 1
        var e = we
        var found = -1
        while (e <= fAD && found < 0) {
          if (p1Lookahead(s, e)) found = e else e += 1
        }
        if (found >= 0) {
          out(0) = s.charAt(p) - 'A'; out(1) = we; out(2) = found; out(3) = found
          return true
        }
        var e2 = we - 1
        while (e2 >= capStart && found < 0) {
          if (p1Lookahead(s, e2)) found = e2 else e2 -= 1
        }
        if (found >= 0) { // empty capture from the shrunk-\s* rounds
          out(0) = s.charAt(p) - 'A'; out(1) = found; out(2) = found; out(3) = found
          return true
        }
      }
      p += 1
    }
    false
  }

  /** Exact twin of `numSearch.find()` + `group(1)` (`(\d+)\.`): the first
    * maximal digit run immediately followed by '.' (a shorter suffix of a
    * run can never match — backtracked `\d+` would need '.' where a digit
    * sits, and restarts inside the run re-walk to the same terminator).
    * Returns null when absent.
    */
  private[graft] def numSearchGroup(s: String): String = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        val a = i
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        if (i < n && s.charAt(i) == '.') return s.substring(a, i)
      } else i += 1
    }
    null
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Exact twin of `candidate.matcher(ft).find()` (`\b\d+\.\s+`): a maximal
    * digit run at a word boundary, then '.', then Java ws. `\b` fails inside
    * a run and a backtracked `\d+` fails on the digit before '.', so only
    * boundary-started maximal runs can match.
    */
  private[graft] def candidateHit(s: String): Boolean = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        val a = i
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        if ((a == 0 || !isWordChar(s.charAt(a - 1))) &&
          i + 1 < n && s.charAt(i) == '.' && isJavaWs(s.charAt(i + 1)))
          return true
      } else i += 1
    }
    false
  }

  /** Exact twin of `PyText.split1(p, s)` for the three ws-delimited literal
    * patterns (`\s+LIT\s+`, alternation allowed): the earliest match starts
    * at the beginning of the ws run preceding a literal occurrence that is
    * followed by ws. Candidate literal positions ascending give ascending
    * run starts (the literal's first char is non-ws, so runs cannot span a
    * later candidate), hence first valid literal occurrence = regex find().
    * Greedy trailing `\s+` takes the maximal run, as the Pattern does.
    */
  private def split1Literals(s: String, lits: Seq[String]): (String, String, Boolean) = {
    val n = s.length
    var i = 1 // literal needs >= 1 ws before it
    while (i < n) {
      var li = 0
      while (li < lits.length) {
        val lit = lits(li)
        if (s.charAt(i) == lit.charAt(0) && isJavaWs(s.charAt(i - 1)) &&
          s.regionMatches(i, lit, 0, lit.length) &&
          i + lit.length < n && isJavaWs(s.charAt(i + lit.length))) {
          var a = i - 1
          while (a > 0 && isJavaWs(s.charAt(a - 1))) a -= 1
          var b = i + lit.length + 1
          while (b < n && isJavaWs(s.charAt(b))) b += 1
          return (s.substring(0, a), s.substring(b), true)
        }
        li += 1
      }
      i += 1
    }
    (s, "", false)
  }

  /** Exact twin of split1 on `optionSplit` (`\s+[A-D]\.\s+`): same run-start
    * argument as [[split1Literals]] with the literal generalized to
    * `[A-D]\.`.
    */
  private def split1OptionDelim(s: String): (String, String, Boolean) = {
    val n = s.length
    var i = 1
    while (i + 1 < n) {
      if (isOptLetter(s.charAt(i)) && s.charAt(i + 1) == '.' &&
        isJavaWs(s.charAt(i - 1)) && i + 2 < n && isJavaWs(s.charAt(i + 2))) {
        var a = i - 1
        while (a > 0 && isJavaWs(s.charAt(a - 1))) a -= 1
        var b = i + 3
        while (b < n && isJavaWs(s.charAt(b))) b += 1
        return (s.substring(0, a), s.substring(b), true)
      }
      i += 1
    }
    (s, "", false)
  }

  private[graft] def splitMarkOrSolution(s: String): (String, String, Boolean) =
    split1Literals(s, MarkSolutionLits)
  private[graft] def splitShowSolution(s: String): (String, String, Boolean) =
    split1Literals(s, ShowSolutionLits)
  private[graft] def splitOptionDelimiter(s: String): (String, String, Boolean) =
    split1OptionDelim(s)
  private val MarkSolutionLits = Seq("Mark", "Solution")
  private val ShowSolutionLits = Seq("Show Solution")

  /** Exact twin of `PyText.splitWithCaptures(pat, s)` for the two theory
    * part-split patterns `\s*\((G)\)\s*` (no anchors — exact on every
    * input). A match is the ws run before a '(', the captured group, ')',
    * and the ws run after; the earliest match starts at the earliest such
    * run (ascending '(' candidates give ascending run starts), and the
    * leading `\s*` is clamped at the previous match's end, exactly like the
    * matcher's region. `groupLen(s, i)` returns the capture length for a
    * candidate whose '(' sits at `i`, or -1 — it encodes G's alternation.
    */
  private def splitCaptures(s: String, groupLen: (String, Int) => Int): Vector[String] = {
    val n = s.length
    val out = Vector.newBuilder[String]
    var last = 0 // end of previous match == region start for leading \s*
    var i = 0
    var pieces = 0
    while (i < n) {
      if (s.charAt(i) == '(') {
        val gl = groupLen(s, i)
        if (gl > 0) {
          var a = i
          while (a > last && isJavaWs(s.charAt(a - 1))) a -= 1
          var b = i + gl + 2
          while (b < n && isJavaWs(s.charAt(b))) b += 1
          out += s.substring(last, a)
          out += s.substring(i + 1, i + 1 + gl)
          pieces += 2
          last = b
          i = b
        } else i += 1
      } else i += 1
    }
    out += s.substring(last)
    out.result()
  }

  /** `mainPartSplit` group `([a-d])`: one char. */
  private def mainGroupLen(s: String, i: Int): Int =
    if (i + 2 < s.length && { val c = s.charAt(i + 1); c >= 'a' && c <= 'd' } &&
      s.charAt(i + 2) == ')') 1 else -1

  /** `subPartSplit` group `([ivx]+|[a-z])`: greedy ivx run (shorter runs
    * cannot backtrack into a ')', which is not an ivx char), else one a-z.
    */
  private def subGroupLen(s: String, i: Int): Int = {
    val n = s.length
    var k = 0
    while (i + 1 + k < n && { val c = s.charAt(i + 1 + k)
      c == 'i' || c == 'v' || c == 'x' }) k += 1
    if (k > 0 && i + 1 + k < n && s.charAt(i + 1 + k) == ')') k
    else if (i + 2 < n && { val c = s.charAt(i + 1); c >= 'a' && c <= 'z' } &&
      s.charAt(i + 2) == ')') 1
    else -1
  }

  private[graft] def splitMainParts(s: String): Vector[String] =
    splitCaptures(s, mainGroupLen)
  private[graft] def splitSubParts(s: String): Vector[String] =
    splitCaptures(s, subGroupLen)

  /** Exact twin of the per-letter solution find,
    * `\(L\)(.*?)(?=\([a-d]\)|$)` with DOTALL: first literal `(L)`
    * occurrence, lazy capture to the first following `([a-d])` lookahead or
    * the end. Default-mode `$` can also match before a FINAL line
    * terminator, so terminator-holding inputs fall back to the Pattern.
    * Returns null when the letter has no match.
    */
  private[graft] def solutionForLetter(s: String, letter: Char): String = {
    val n = s.length
    var idx = -1
    var i = 0
    while (idx < 0 && i + 2 < n) { // literal "(L)"
      if (s.charAt(i) == '(' && s.charAt(i + 1) == letter && s.charAt(i + 2) == ')')
        idx = i
      else i += 1
    }
    if (idx < 0) return null
    var e = idx + 3
    while (e < n && !(s.charAt(e) == '(' && e + 2 < n &&
      { val c = s.charAt(e + 1); c >= 'a' && c <= 'd' } &&
      s.charAt(e + 2) == ')')) e += 1
    s.substring(idx + 3, e)
  }

  /** ASCII case fold of a region compare — what CASE_INSENSITIVE without
    * UNICODE_CASE does for literal pattern chars ("assumes that only
    * characters in the US-ASCII charset are being matched").
    */
  private def foldedMatch(s: String, i: Int, lower: String): Boolean = {
    if (i + lower.length > s.length) return false
    var k = 0
    while (k < lower.length) {
      val c = s.charAt(i + k)
      val f = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (f != lower.charAt(k)) return false
      k += 1
    }
    true
  }

  private def isOptLetterCI(c: Char): Boolean =
    (c >= 'A' && c <= 'D') || (c >= 'a' && c <= 'd')

  /** Exact twin of the four `extract_answer_info` patterns (IGNORECASE,
    * tried in order, first find() wins): "answer is ([A-D])",
    * "correct answer is ([A-D])", "option ([A-D])", "^([A-D])\." — the
    * CASE_INSENSITIVE flag makes [A-D] also match a–d and the literals
    * ASCII-case-blind; `^` without MULTILINE anchors to position 0 only.
    * Pattern 2 is provably dead: any "correct answer is X" match contains
    * an "answer is X" match at offset +8, so pattern 1 already returned.
    * Returns the captured letter or [[NoAnswer]] when none match.
    */
  private[graft] val NoAnswer: Char = '\u0000'

  private[graft] def answerLetter(s: String): Char = {
    val n = s.length
    var i = 0
    while (i + 10 < n) {
      if (foldedMatch(s, i, "answer is ") && isOptLetterCI(s.charAt(i + 10)))
        return s.charAt(i + 10)
      i += 1
    }
    i = 0
    while (i + 7 < n) {
      if (foldedMatch(s, i, "option ") && isOptLetterCI(s.charAt(i + 7)))
        return s.charAt(i + 7)
      i += 1
    }
    if (n >= 2 && isOptLetterCI(s.charAt(0)) && s.charAt(1) == '.') return s.charAt(0)
    NoAnswer
  }

  // --- element predicates ---------------------------------------------------

  /** `is_advertisement` — core/main.py:74-91. */
  def isAdvertisement(e: HElem): Boolean = {
    val t = fullText(e).toLowerCase
    adKeywords.exists(t.contains)
  }

  /** `is_ad_image` — core/main.py:367-378: `/qns/` whitelists; else the ad
    * patterns blacklist; null/empty src is an ad.
    */
  def isAdImage(src: String): Boolean = {
    if (src == null || src.isEmpty) true
    else if (src.contains("/qns/")) false
    else { val l = src.toLowerCase; adImagePatterns.exists(l.contains) }
  }

  /** `fix_image_url` — core/main.py:353-365. */
  def fixImageUrl(src: String): String = {
    val idx = src.lastIndexOf('/')
    if (idx >= 0) src.substring(0, idx) + "/" + PyText.pyQuote(src.substring(idx + 1))
    else PyText.pyQuote(src)
  }

  /** `extract_all_diagrams` — core/main.py:331-351: imgs in document order,
    * ad-filtered, URL-fixed, first-occurrence dedup.
    */
  def extractAllDiagrams(container: HElem): Seq[String] = {
    val fixed = (Iterator.single(container) ++ container.descendants)
      .filter(_.tag == "img")
      .flatMap(_.attr("src"))
      .filterNot(isAdImage)
      .map(fixImageUrl)
      .toVector
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    fixed.foreach(seen += _)
    seen.toVector
  }

  // --- mcq parsing ------------------------------------------------------------

  /** Manual twin of `replaceFirst` on `^<num>\.?\s*` — the reference strips
    * the question-number prefix with a per-question regex; compiling that
    * Pattern per question was a measurable parse-path cost. Semantics are
    * exactly the regex's: literal digits, at most one '.', then Java `\s*`.
    */
  private def stripNumPrefix(s: String, questionNum: Int): String = {
    val ns = Integer.toString(questionNum)
    if (!s.startsWith(ns)) return s
    var i = ns.length
    if (i < s.length && s.charAt(i) == '.') i += 1
    while (i < s.length && { val c = s.charAt(i)
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r' }) i += 1
    s.substring(i)
  }

  /** `extract_question_stem` — core/main.py:207-219. */
  def extractQuestionStem(questionPart: String, questionNum: Int): String = {
    val text = stripNumPrefix(questionPart, questionNum)
    val (head, _, _) = splitOptionDelimiter(text)
    collapseJavaWs(PyText.pyStrip(head))
  }

  /** `extract_options_from_text` — core/main.py:221-253. Pattern priority +
    * first-non-empty-wins per letter.
    */
  def extractOptions(text: String): Options = {
    // first-non-empty-wins per letter, exactly as the reference — which
    // means once all four letters are filled no later match can change
    // anything: short-circuit the remaining patterns/matches instead of
    // running the backtracking-heavy fallback patterns to discard their
    // results (pattern 3's lazy-quantifier + lookahead scan dominated the
    // parse profile). The per-match strip/collapse transforms also run only
    // when the letter is still open (they were computed-then-discarded).
    val acc = Array("", "", "", "")
    var filled = 0
    def take(idx: Int, raw: String): Unit =
      if (acc(idx).isEmpty) {
        var opt = PyText.pyStrip(raw)
        opt = collapseJavaWs(opt)
        opt = stripTrailingDot(opt)
        opt = stripBullet(opt)
        if (opt.nonEmpty) { acc(idx) = opt; filled += 1 }
      }
    // pattern 1 runs as the compiled twin (p1Find) on terminator-free input
    // — the overwhelmingly common, all-filled case never touches the regex
    // engine; patterns 2/3 (rarely reached) stay Patterns
    var pi = 0
    if (!hasLineTerminator(text)) {
      val out = new Array[Int](4)
      var from = 0
      while (filled < 4 && p1Find(text, from, out)) {
        take(out(0), text.substring(out(1), out(2)))
        from = out(3)
      }
      pi = 1
    }
    while (pi < optPatterns.length && filled < 4) {
      val m = optPatterns(pi).matcher(text)
      while (filled < 4 && m.find()) {
        take(m.group(1).charAt(0) - 'A', m.group(2))
      }
      pi += 1
    }
    Options(acc(0), acc(1), acc(2), acc(3))
  }

  /** `clean_solution_text` — core/main.py:293-304. Manual twin of the
    * `^solution\s*` CASE_INSENSITIVE replaceFirst: the flag without
    * UNICODE_CASE folds ASCII only, so the prefix compare ORs in 0x20 on
    * A–Z exactly as the Pattern did; then the same Java `\s*` skip.
    */
  def cleanSolutionText(s: String): String = {
    if (s == null || s.isEmpty) return ""
    var t = s
    if (t.length >= 8) {
      var i = 0
      var isPrefix = true
      while (i < 8 && isPrefix) {
        val c = t.charAt(i)
        val f = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (f != "solution".charAt(i)) isPrefix = false
        i += 1
      }
      if (isPrefix) {
        var j = 8
        while (j < t.length && isJavaWs(t.charAt(j))) j += 1
        t = t.substring(j)
      }
    }
    PyText.pyStrip(collapseJavaWs(t))
  }

  /** `extract_answer_info` — core/main.py:255-291. Returns (answerOrNull,
    * solutionOrNull, foundAnything). None-equivalent = (null, null, false).
    */
  def extractAnswerInfo(solutionText: String): (String, String, Boolean) = {
    if (solutionText == null || solutionText.isEmpty) return (null, null, false)
    val cleanSolution = PyText.pyStrip(solutionText)
    val letter = answerLetter(cleanSolution) // twin of the 4-pattern loop
    val answer =
      if (letter == NoAnswer) null
      else if (letter >= 'a') (letter - 32).toChar.toString // group(1).toUpperCase
      else letter.toString
    (answer, cleanSolutionText(cleanSolution), true)
  }

  /** `extract_answer_from_html` — core/main.py:306-329. Checkmark spans /
    * `.correct` / `[data-answer]` elements scanned for a letter; then the
    * hard-coded "light to electrical" → "B" special case on solution divs.
    */
  def extractAnswerFromHtml(container: HElem): String = {
    val all = (Iterator.single(container) ++ container.descendants).toVector
    // css 'span:contains("✓"), .correct, [data-answer]' — union, doc order.
    val answerElems = all.filter { e =>
      (e.tag == "span" && e.stringValue.contains("✓")) ||
        e.hasClass("correct") || e.attrs.contains("data-answer")
    }
    answerElems.foreach { e =>
      val m = anyLetter.matcher(fullText(e))
      if (m.find()) return m.group(1).toUpperCase
    }
    // css 'div:contains("Solution"), .solution'
    val solutionElems = all.filter { e =>
      (e.tag == "div" && e.stringValue.contains("Solution")) || e.hasClass("solution")
    }
    solutionElems.foreach { e =>
      if (fullText(e).toLowerCase.contains("light to electrical")) return "B"
    }
    null
  }

  /** `parse_objective_question_improved` — core/main.py:152-205. */
  def parseObjective(container: HElem): Option[Question] =
    parseObjective(container, fullText(container))

  /** Hot-path overload: `full` is the container's already-extracted clean
    * text (the page loop computes it once per sibling and reuses it for the
    * stop/ad/candidate checks and the parse — the reference recomputes it,
    * `core/main.py:139+154`, with identical result since the function is pure).
    */
  def parseObjective(container: HElem, full: String): Option[Question] = {
    val numG = numSearchGroup(full)
    if (numG == null) return None
    val questionNum = numG.toInt

    val (questionPart, solutionPart, _) = splitMarkOrSolution(full)
    val questionText = extractQuestionStem(questionPart, questionNum)
    val options = extractOptions(questionPart)
    var (answer, solution, found) = extractAnswerInfo(solutionPart)
    var answerAfterSolution = false
    if (!found || answer == null) {
      val htmlAnswer = extractAnswerFromHtml(container)
      if (htmlAnswer != null) {
        answer = htmlAnswer
        // reference: if answer_info was None it becomes {"answer": ...} with
        // no solution key — solution stays null in that branch. If it DID
        // exist (solution key already set), the fallback answer is appended
        // after it: dict order ..., solution, answer (core/main.py:177-183).
        answerAfterSolution = found
      }
    }
    val diagrams = extractAllDiagrams(container)

    if (questionText.nonEmpty && options.anyNonEmpty && questionNum > 0)
      Some(Question("objective", "mcq", questionNum, questionText, options,
        Seq.empty, diagrams, answer, solution, answerAfterSolution))
    else None
  }

  // --- theory parsing ---------------------------------------------------------

  /** `parse_sub_subparts_improved` — core/main.py:494-513. */
  def parseSubSubparts(content: String): Seq[SubSub] = {
    val parts = splitSubParts(content)
    if (parts.length < 3) return Seq.empty
    val out = Seq.newBuilder[SubSub]
    var i = 1
    while (i < parts.length) {
      if (i + 1 < parts.length) {
        val sub = PyText.pyStrip(parts(i + 1))
        if (sub.nonEmpty) out += SubSub(s"(${parts(i)})", sub)
      }
      i += 2
    }
    out.result()
  }

  /** `parse_theory_structure_improved` — core/main.py:460-492. */
  def parseTheoryStructure(questionPart: String, questionNum: Int): (String, Seq[Subpart]) = {
    val content = stripNumPrefix(questionPart, questionNum)
    val mainParts = splitMainParts(content)
    if (mainParts.length < 3) return (PyText.pyStrip(content), Seq.empty)
    val mainQuestion = PyText.pyStrip(mainParts(0))
    val subparts = Seq.newBuilder[Subpart]
    var i = 1
    while (i < mainParts.length) {
      if (i + 1 < mainParts.length) {
        val letter = mainParts(i)
        val partContent = PyText.pyStrip(mainParts(i + 1))
        val subs = parseSubSubparts(partContent)
        subparts += Subpart(s"($letter)",
          if (subs.isEmpty) partContent else "", subs, null)
      }
      i += 2
    }
    (mainQuestion, subparts.result())
  }

  /** `integrate_theory_solutions` — core/main.py:515-529: per-letter lazy
    * regex lookup into the solution text.
    */
  // the per-letter solution patterns are a 4-element space ('a'..'d') —
  // precompiled once instead of a Pattern.compile per subpart per question
  private val solutionByLetter: Map[String, Pattern] =
    Seq("a", "b", "c", "d").map(l => l -> Pattern.compile(
      "\\(" + l + "\\)(.*?)(?=\\([a-d]\\)|$)", Pattern.DOTALL)).toMap

  def integrateTheorySolutions(subparts: Seq[Subpart], solutionPart: String): Seq[Subpart] = {
    // terminator-free inputs (always, post-cleanText) use the compiled twin;
    // the Pattern handles the `$`-before-final-terminator corner
    val twinOk = !hasLineTerminator(solutionPart)
    subparts.map { sp =>
      val letter = sp.part.stripPrefix("(").stripSuffix(")")
      if (twinOk && letter.length == 1) {
        val sol = solutionForLetter(solutionPart, letter.charAt(0))
        if (sol != null) sp.copy(solution = PyText.pyStrip(sol)) else sp
      } else {
        val p = solutionByLetter.getOrElse(letter, Pattern.compile(
          "\\(" + letter + "\\)(.*?)(?=\\([a-d]\\)|$)", Pattern.DOTALL))
        val m = p.matcher(solutionPart)
        if (m.find()) sp.copy(solution = PyText.pyStrip(m.group(1))) else sp
      }
    }
  }

  /** `parse_theory_question_improved` — core/main.py:420-458. */
  def parseTheory(container: HElem): Option[Question] =
    parseTheory(container, fullText(container))

  def parseTheory(container: HElem, full: String): Option[Question] = {
    val numG = numSearchGroup(full)
    if (numG == null) return None
    val questionNum = numG.toInt

    val (questionPart, solutionPart, _) = splitShowSolution(full)
    var (mainQuestion, subparts) = parseTheoryStructure(questionPart, questionNum)
    if (solutionPart.nonEmpty)
      subparts = integrateTheorySolutions(subparts, solutionPart)
    val diagrams = extractAllDiagrams(container)

    if (mainQuestion.nonEmpty || subparts.nonEmpty)
      Some(Question("theory", "theory", questionNum, mainQuestion, null,
        subparts, diagrams, null, null))
    else None
  }

  // --- page-level orchestration ------------------------------------------------

  private def findSectionHeader(root: HElem, title: String): Option[(HElem, Int)] = {
    // css 'h4.center:contains("<title>")' → first match in document order,
    // returned with its parent so following-sibling::* can be walked.
    def walk(parent: HElem): Option[(HElem, Int)] = {
      parent.children.zipWithIndex.foreach {
        case (e: HElem, idx) =>
          if (e.tag == "h4" && e.hasClass("center") && e.stringValue.contains(title))
            return Some((parent, idx))
          val r = walk(e)
          if (r.isDefined) return r
        case _ =>
      }
      None
    }
    walk(root)
  }

  private def followingSiblings(parent: HElem, idx: Int): Vector[HElem] =
    parent.children.drop(idx + 1).collect { case e: HElem => e }

  /** `extract_objective_questions` — core/main.py:116-150. */
  def extractObjectiveQuestions(root: HElem): Seq[Question] = {
    findSectionHeader(root, "OBJECTIVE TEST") match {
      case None => Seq.empty
      case Some((parent, idx)) =>
        val acc = Vector.newBuilder[Question]
        val sibs = followingSiblings(parent, idx)
        var stop = false
        sibs.foreach { sib =>
          if (!stop) {
            val ft = fullText(sib)
            if (ft.contains("THEORY QUESTIONS")) stop = true
            else if (!adKeywords.exists(ft.toLowerCase.contains)) {
              if (candidateHit(ft))
                parseObjective(sib, ft).foreach(acc += _)
            }
          }
        }
        // Python list.sort is stable; Scala sortBy is stable (TimSort).
        acc.result().sortBy(_.number)
    }
  }

  /** `extract_theory_questions` — core/main.py:380-418: sort by number, then
    * first-wins dedup on number.
    */
  def extractTheoryQuestions(root: HElem): Seq[Question] = {
    findSectionHeader(root, "THEORY QUESTIONS") match {
      case None => Seq.empty
      case Some((parent, idx)) =>
        val acc = Vector.newBuilder[Question]
        followingSiblings(parent, idx).foreach { sib =>
          val ft = fullText(sib)
          if (!adKeywords.exists(ft.toLowerCase.contains)) {
            if (candidateHit(ft))
              parseTheory(sib, ft).foreach(acc += _)
          }
        }
        val sorted = acc.result().sortBy(_.number)
        val seen = scala.collection.mutable.HashSet.empty[Int]
        sorted.filter(q => seen.add(q.number))
    }
  }

  /** Pagination link — css 'a.next::attr(href), .pagination
    * a:contains("Next")::attr(href)', first match in document order
    * (core/main.py:110-114).
    */
  def extractNext(root: HElem): String = {
    def pagAnchor(e: HElem): Option[String] =
      if (e.hasClass("pagination"))
        e.descendants.find(a => a.tag == "a" && a.stringValue.contains("Next"))
          .flatMap(_.attr("href"))
      else None
    val anchors = root.descendants.flatMap { e =>
      if (e.tag == "a" && e.hasClass("next")) e.attr("href")
      else pagAnchor(e)
    }
    if (anchors.hasNext) anchors.next() else null
  }

  /** `parse(response)` — core/main.py:93-114: objectives then theory, plus
    * the next-page href.
    */
  def parsePage(html: String): ParsedPage = {
    val root = Html.parse(html)
    val qs = extractObjectiveQuestions(root) ++ extractTheoryQuestions(root)
    ParsedPage(qs, extractNext(root))
  }

  def parsePage(htmlBytes: Array[Byte]): ParsedPage =
    parsePage(new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8))
}
