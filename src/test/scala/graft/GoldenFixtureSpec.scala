package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Extract, QuestionParser}
import graft.util.Json

/** Byte-identical extraction goldens (SURVEY §5.2 item 1).
  *
  * Each `<name>.html` has a committed `<name>.json` produced by
  * `tools/ref_oracle.py` — an independent CPython implementation of the
  * reference spider's semantics (true `html.unescape`, true `re` module).
  * The engine's text, pagination link, and full question structures must
  * match byte-for-byte. `golden/gen` pages come from PagesGen (every parse
  * branch at scale); `golden/manual` are hand-written edge cases
  * (light-to-electrical fallback, data-answer, bullets, dup numbers, …).
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private def canonical(html: String): String = {
    val parsed = QuestionParser.parsePage(html)
    Json.obj(Seq(
      "next" -> (if (parsed.next == null) "null" else Json.str(parsed.next)),
      "questions" -> Json.arr(parsed.questions.map(Json.canonicalQuestion)),
      "text" -> Json.str(Extract.pageText(html))))
  }

  private def fixtureDirs: Seq[Path] = {
    val base = Paths.get("src/test/resources/golden")
    Seq(base.resolve("gen"), base.resolve("manual")).filter(Files.isDirectory(_))
  }

  private val htmlFiles: Seq[Path] = fixtureDirs.flatMap { d =>
    Files.list(d).iterator().asScala.filter(_.toString.endsWith(".html")).toSeq
  }.sortBy(_.toString)

  test("golden fixture corpus is present") {
    assert(htmlFiles.size >= 30, s"expected >=30 fixtures, got ${htmlFiles.size}")
  }

  htmlFiles.foreach { f =>
    val name = f.getFileName.toString
    test(s"byte-identical extraction: $name") {
      val html = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val expectedPath = Paths.get(f.toString.stripSuffix(".html") + ".json")
      val expected = new String(Files.readAllBytes(expectedPath), StandardCharsets.UTF_8)
      assert(canonical(html) == expected)
    }
  }

  // --- dict-INSERTION-order goldens (F9 key-order provenance, ADVICE r01) ---
  // `*.ordered.json` preserves the CPython oracle's dict insertion order —
  // including the html-fallback case where `answer` lands AFTER `solution`
  // (core/main.py:177-183). Json.question must reproduce it byte-for-byte.

  private def ordered(html: String): String = {
    val parsed = QuestionParser.parsePage(html)
    Json.obj(Seq(
      "text" -> Json.str(Extract.pageText(html)),
      "next" -> (if (parsed.next == null) "null" else Json.str(parsed.next)),
      "questions" -> Json.arr(parsed.questions.map(Json.question))))
  }

  htmlFiles.foreach { f =>
    val name = f.getFileName.toString
    test(s"byte-identical key ORDER: $name") {
      val html = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val expectedPath = Paths.get(f.toString.stripSuffix(".html") + ".ordered.json")
      val expected = new String(Files.readAllBytes(expectedPath), StandardCharsets.UTF_8)
      assert(ordered(html) == expected)
    }
  }

  test("F9 fallback with an existing solution orders answer AFTER solution (m01)") {
    val html = new String(Files.readAllBytes(
      Paths.get("src/test/resources/golden/manual/m01_light_to_electrical.html")),
      StandardCharsets.UTF_8)
    val q = QuestionParser.parsePage(html).questions.head
    assert(q.answer == "B" && q.solution != null && q.answer_after_solution)
    val j = Json.question(q)
    assert(j.indexOf("\"solution\"") < j.indexOf("\"answer\""))
  }
}
