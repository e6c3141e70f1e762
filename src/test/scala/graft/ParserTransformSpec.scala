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
