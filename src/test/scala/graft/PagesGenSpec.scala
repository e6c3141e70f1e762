package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Extract
import graft.sources.PagesGen

/** Generator determinism + the byte-identical invariant at smoke scale:
  * `Extract.pageText(html) == text` for EVERY page synthesized from
  * sf0.001 documents (BASELINE.json:15).
  */
class PagesGenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("same doc_id renders identical bytes (determinism)") {
    val (h1, t1) = PagesGen.renderPage(42L, "alpha beta gamma delta epsilon")
    val (h2, t2) = PagesGen.renderPage(42L, "alpha beta gamma delta epsilon")
    assert(h1 == h2 && t1 == t2)
  }

  test("extracted text is byte-identical to golden text for every sf0.001 page") {
    import spark.implicits._
    val bad = PagesGen.pages(spark, sf)
      .map(p => if (Extract.pageText(p.html) == p.text) 0L else 1L)
      .reduce(_ + _)
    assert(bad == 0L)
  }

  test("pages cover both sections, pagination, ads and diagrams") {
    import spark.implicits._
    val sample = PagesGen.pages(spark, sf).take(200)
    assert(sample.forall(_.text.contains("OBJECTIVE TEST")))
    assert(sample.forall(_.text.contains("THEORY QUESTIONS")))
    val htmls = sample.map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    assert(htmls.exists(_.contains("class=\"next\"")))
    assert(htmls.exists(_.contains("/qns/")))
    assert(htmls.exists(_.contains("banner-promo")))
  }

  test("flagship entry returns parsed questions (rows > 0, ordered)") {
    val df = SparkEntry.entry(spark)
    val rows = df.limit(50).collect()
    assert(rows.nonEmpty)
    assert(df.columns.contains("question"))
  }

  test("seeds are page-0 urls only") {
    val seeds = PagesGen.seeds(spark, sf).collect()
    assert(seeds.nonEmpty)
    assert(seeds.forall(_.url.endsWith("/p0")))
  }
}
