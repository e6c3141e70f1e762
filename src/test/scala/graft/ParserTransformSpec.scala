package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuestionParser

/** The round-6 parse-path optimization replaced three per-option
  * precompiled-Pattern transforms (and the `^solution\s*` prefix strip) with
  * allocation-free manual twins. This spec pins twin ≡ Pattern on an
  * adversarial input space that covers every branch the regexes have:
  * ws runs (all five Java `\s` chars), bullets, dots, terminators, case.
  */
class ParserTransformSpec extends AnyFunSuite {

  private val wsRun = Pattern.compile("\\s+")
  private val trailingDot = Pattern.compile("\\.$")
  private val bullet = Pattern.compile("^\\s*[-•]\\s*")
  private val solutionPrefix =
    Pattern.compile("^solution\\s*", Pattern.CASE_INSENSITIVE)

  private val pieces = Seq("", " ", "  ", "\t", "\n", "\r", "", "\f",
    "a", "ab", ".", "..", "a.", "-", "•", " - ", "• x", "A. opt", "Ω", " .",
    "Solution", "SOLUTION ", "solution:", "soLuTion  x", "ſolution x",
    "answer is B.", "x\n.", "-  -", " ", "é")
  private val rng = new scala.util.Random(42)
  private val inputs: Seq[String] =
    (pieces ++
      (1 to 2000).map(_ => (0 until rng.nextInt(6))
        .map(_ => pieces(rng.nextInt(pieces.length))).mkString) ++
      // every pair concatenation, to hit boundary interactions
      (for (a <- pieces; b <- pieces) yield a + b)).distinct

  test("collapseJavaWs == \\s+ replaceAll(\" \")") {
    inputs.foreach { s =>
      assert(QuestionParser.collapseJavaWs(s) == wsRun.matcher(s).replaceAll(" "),
        s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("stripTrailingDot == \\.$ replaceAll(\"\")") {
    inputs.foreach { s =>
      assert(QuestionParser.stripTrailingDot(s) == trailingDot.matcher(s).replaceAll(""),
        s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("stripBullet == ^\\s*[-•]\\s* replaceAll(\"\")") {
    inputs.foreach { s =>
      assert(QuestionParser.stripBullet(s) == bullet.matcher(s).replaceAll(""),
        s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("cleanSolutionText == regex formulation") {
    inputs.foreach { s =>
      val expected = graft.util.PyText.pyStrip(
        wsRun.matcher(solutionPrefix.matcher(s).replaceFirst("")).replaceAll(" "))
      assert(QuestionParser.cleanSolutionText(s) == expected,
        s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  // ---- round-6 batch 2: find/split twins --------------------------------

  private val numSearch = Pattern.compile("(\\d+)\\.")
  private val candidate = Pattern.compile("\\b\\d+\\.\\s+")
  private val markOrSolution = Pattern.compile("\\s+(?:Mark|Solution)\\s+")
  private val showSolution = Pattern.compile("\\s+Show Solution\\s+")
  private val optionSplit = Pattern.compile("\\s+[A-D]\\.\\s+")
  private val optFlags = Pattern.MULTILINE | Pattern.DOTALL
  private val optPatterns = Seq(
    Pattern.compile("([A-D])\\.\\s*([^A-D]*?)(?=\\s+[A-D]\\.|$)", optFlags),
    Pattern.compile("([A-D])\\s*\\.\\s*([^A-D]*?)(?=\\s*[A-D]\\s*\\.|$)", optFlags),
    Pattern.compile("([A-D])\\s*\\.?\\s*([^\\n]*?)(?=\\s*[A-D]\\s*\\.|\\n[A-D]\\s*\\.|$)", optFlags))

  // option-flavored adversarial corpus: letters, dots, ws runs, words
  private val optPieces = Seq("", " ", "  ", "\t", "A.", "B.", "C.", "D.",
    "A", ".", "..", "x", "xy z", "A. ", " A.", "Mark", "Solution",
    "Show Solution", " Mark ", "1.", "12. ", "3.x", " 1. x", "a1.", "_2. ",
    "A. opt1 B. opt2 C. opt3 D. opt4", "A.. ", "A .", "-", "• ", "\n", "\r")
  private val optInputs: Seq[String] =
    (optPieces ++
      (1 to 4000).map(_ => (0 until (1 + rng.nextInt(7)))
        .map(_ => optPieces(rng.nextInt(optPieces.length))).mkString) ++
      (for (a <- optPieces; b <- optPieces) yield a + " " + b)).distinct

  private def refExtractOptions(text: String): functions.Options = {
    val acc = Array("", "", "", "")
    var filled = 0
    var pi = 0
    val wsRunP = Pattern.compile("\\s+")
    val trailingDotP = Pattern.compile("\\.$")
    val bulletP = Pattern.compile("^\\s*[-•]\\s*")
    while (pi < optPatterns.length && filled < 4) {
      val m = optPatterns(pi).matcher(text)
      while (filled < 4 && m.find()) {
        val idx = m.group(1).charAt(0) - 'A'
        if (acc(idx).isEmpty) {
          var opt = graft.util.PyText.pyStrip(m.group(2))
          opt = wsRunP.matcher(opt).replaceAll(" ")
          opt = trailingDotP.matcher(opt).replaceAll("")
          opt = bulletP.matcher(opt).replaceAll("")
          if (opt.nonEmpty) { acc(idx) = opt; filled += 1 }
        }
      }
      pi += 1
    }
    functions.Options(acc(0), acc(1), acc(2), acc(3))
  }

  test("extractOptions (p1Find twin) == pattern-loop reference") {
    optInputs.foreach { s =>
      assert(QuestionParser.extractOptions(s) == refExtractOptions(s),
        s"input=[$s]")
    }
  }

  test("numSearchGroup == (\\d+)\\. find/group") {
    optInputs.foreach { s =>
      val m = numSearch.matcher(s)
      val expected = if (m.find()) m.group(1) else null
      assert(QuestionParser.numSearchGroup(s) == expected, s"input=[$s]")
    }
  }

  test("candidateHit == \\b\\d+\\.\\s+ find") {
    optInputs.foreach { s =>
      assert(QuestionParser.candidateHit(s) == candidate.matcher(s).find(),
        s"input=[$s]")
    }
  }

  test("split twins == PyText.split1 on the three delimiter patterns") {
    optInputs.foreach { s =>
      assert(QuestionParser.splitMarkOrSolution(s) ==
        graft.util.PyText.split1(markOrSolution, s), s"mark input=[$s]")
      assert(QuestionParser.splitShowSolution(s) ==
        graft.util.PyText.split1(showSolution, s), s"show input=[$s]")
      assert(QuestionParser.splitOptionDelimiter(s) ==
        graft.util.PyText.split1(optionSplit, s), s"opt input=[$s]")
    }
  }

  // ---- round-6 batch 4: answer-letter twin ------------------------------

  private val answerPatterns = Seq(
    "answer is ([A-D])", "correct answer is ([A-D])", "option ([A-D])",
    "^([A-D])\\.").map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  private val ansPieces = Seq("", " ", "answer is B", "ANSWER IS b",
    "Answer Is ", "correct answer is D", "option c", "Option A", "A.",
    "a. text", "answer isX", "the answer is", "answer is  C", "xoption d",
    "OPTIONA", "answer", "B.", " B.", "İ answer is A", "answer is Ω",
    "optİon a", "answer is e", "option E")
  private val ansInputs: Seq[String] =
    (ansPieces ++
      (1 to 3000).map(_ => (0 until (1 + rng.nextInt(5)))
        .map(_ => ansPieces(rng.nextInt(ansPieces.length))).mkString(" ")) ++
      (for (a <- ansPieces; b <- ansPieces) yield a + b)).distinct

  test("answerLetter == 4-pattern IGNORECASE loop") {
    ansInputs.foreach { s =>
      var expected: String = null
      val it = answerPatterns.iterator
      while (expected == null && it.hasNext) {
        val m = it.next().matcher(s)
        if (m.find()) expected = m.group(1).toUpperCase
      }
      val l = QuestionParser.answerLetter(s)
      val got = if (l == QuestionParser.NoAnswer) null
        else if (l >= 'a') (l - 32).toChar.toString else l.toString
      assert(got == expected, s"input=[$s]")
    }
  }

  // ---- round-6 batch 3: theory split twins ------------------------------

  private val mainPartSplit = Pattern.compile("\\s*\\(([a-d])\\)\\s*")
  private val subPartSplit = Pattern.compile("\\s*\\(([ivx]+|[a-z])\\)\\s*")

  private val theoPieces = Seq("", " ", "  ", "(a)", "(b)", "(c)", "(d)",
    "(e)", "(i)", "(ii)", "(iv)", "(ivx)", "(ix)", "(x)", "(v)", "(A)",
    "(", ")", "()", "((a)", "(a))", "(ab)", "(ia)", "txt", "x y",
    "\t(a)\t", "(a) body (b) more", "Solution", "\n", "(aa)")
  private val theoInputs: Seq[String] =
    (theoPieces ++
      (1 to 4000).map(_ => (0 until (1 + rng.nextInt(6)))
        .map(_ => theoPieces(rng.nextInt(theoPieces.length))).mkString) ++
      (for (a <- theoPieces; b <- theoPieces) yield a + b)).distinct

  test("splitMainParts/splitSubParts == splitWithCaptures on their patterns") {
    theoInputs.foreach { s =>
      assert(QuestionParser.splitMainParts(s) ==
        graft.util.PyText.splitWithCaptures(mainPartSplit, s), s"main input=[$s]")
      assert(QuestionParser.splitSubParts(s) ==
        graft.util.PyText.splitWithCaptures(subPartSplit, s), s"sub input=[$s]")
    }
  }

  test("solutionForLetter == per-letter lazy pattern (terminator-free)") {
    for (s <- theoInputs if !QuestionParser.hasLineTerminator(s);
         l <- Seq('a', 'b', 'c', 'd')) {
      val p = Pattern.compile("\\(" + l + "\\)(.*?)(?=\\([a-d]\\)|$)", Pattern.DOTALL)
      val m = p.matcher(s)
      val expected = if (m.find()) m.group(1) else null
      assert(QuestionParser.solutionForLetter(s, l) == expected,
        s"letter=$l input=[$s]")
    }
  }

  test("PyText.collapseWs fast path stays Python-exact on non-ASCII ws") {
    val cases = Seq("a b", "a   b", "a b", "x y", "a b",
      "a  b", "  ", "plain text")
    cases.foreach { s =>
      // oracle: the pre-optimization formulation (regex over the Python class
      // is awkward in Java — rebuild via per-char class test)
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (graft.util.PyText.isPySpace(s.charAt(i))) {
          sb.append(' ')
          while (i < s.length && graft.util.PyText.isPySpace(s.charAt(i))) i += 1
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      assert(graft.util.PyText.collapseWs(s) == sb.toString)
    }
  }
}
