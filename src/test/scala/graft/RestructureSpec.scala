package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuestionParser
import graft.operators.Restructure
import graft.sources.PagesGen

/** Output-job semantics (SURVEY §2 A1-A7, F12, S8-S12, J2). */
class RestructureSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Questions table parsed straight from sf0.001 pages (no crawl loop). */
  private lazy val questions = {
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    val df = PagesGen.pages(spark, "/root/testdata/sf0.001").toDF()
      .withColumn("p", parse(col("html")))
      .select(col("url"),
        expr("cast(regexp_extract(url, 'questions/([a-z-]+)-', 1) AS string)").as("seed_subject"),
        expr("cast(regexp_extract(url, '-(\\\\d+)/c', 1) AS int)").as("seed_year"),
        posexplode(col("p.questions")).as(Seq("pos", "q")))
      .select(col("url"), col("seed_subject"), col("seed_year"), col("pos"),
        col("q.section"), col("q.qtype"), col("q.number"), col("q.question"),
        col("q.options"), col("q.subparts"), col("q.diagrams"),
        col("q.answer"), col("q.solution"), col("q.answer_after_solution"))
    df.cache()
  }

  test("restructure groups into objectives/theory with section/type stripped") {
    val docs = Restructure.restructuredDocs(questions).cache()
    assert(docs.count() > 0)
    val r = docs.head()
    val objSchema = docs.schema("objectives").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!objSchema.fieldNames.contains("section") && !objSchema.fieldNames.contains("qtype"))
    assert(r.getAs[String]("page_screenshot").startsWith("https://ik.imagekit.io/"))
    // totals preserved
    val total = docs.select((size(col("objectives")) + size(col("theory"))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total == questions.count())
  }

  test("spider stats rollup reconciles with flat counts") {
    val stats = Restructure.spiderStats(questions)
    val grand = stats.filter(col("subject").isNull).head()
    assert(grand.getAs[Long]("n_questions") == questions.count())
  }

  test("image manifest paths are quoted and deduped per batch") {
    val m = Restructure.imageManifest(questions).cache()
    assert(m.count() > 0)
    assert(m.filter(col("local_path").contains(" ")).count() == 0) // quoted
    assert(m.filter(!col("local_path").startsWith("images/")).count() == 0)
    val dups = m.groupBy("subject", "year", "image_url").count().filter(col("count") > 1)
    assert(dups.count() == 0)
  }

  test("metadata has format_version 2.0, pinned clock and reconciled counts") {
    val md = Restructure.metadata(questions).cache()
    assert(md.filter(col("format_version") =!= "2.0").count() == 0)
    assert(md.filter(col("extraction_date") =!= Restructure.PinnedIso).count() == 0)
    val r = md.head()
    val ss = r.getAs[org.apache.spark.sql.Row]("spider_stats")
    assert(ss.getAs[Long]("total_questions") ==
      ss.getAs[Long]("objective_questions") + ss.getAs[Long]("theory_questions"))
  }

  test("flatten produces reference header order and pipe-joined diagrams") {
    val flat = Restructure.flattenCsv(questions).cache()
    val dataCols = flat.columns.drop(4) // subject, year, url, pos are keys
    assert(dataCols.take(6).sorted.sameElements(
      Array("answer", "diagrams", "number", "question", "solution", "type")))
    // rank order: common, option_, subpart_, and python-string sort inside ranks
    def rank(n: String): Int =
      if (Set("type", "number", "question", "solution", "answer", "diagrams")(n)) 0
      else if (n.startsWith("option_")) 1 else if (n.startsWith("subpart_")) 2 else 3
    val expected = dataCols.sortBy(n => (rank(n), n))
    assert(dataCols.sameElements(expected))
    assert(flat.filter(col("type") === "objectives").count() > 0)
    assert(flat.filter(col("type") === "theory" && col("subpart_1_question").isNotNull)
      .count() > 0)
    val withDiag = flat.filter(col("diagrams").contains("|"))
    assert(withDiag.count() >= 0) // pipe join shape
  }

  test("reports render with pinned date and success rate") {
    val rep = Restructure.reports(spark, questions).cache()
    assert(rep.count() > 0)
    val r = rep.head().getAs[String]("report")
    assert(r.contains("Image Download Report for "))
    assert(r.contains("Generated on: Wednesday, January 01, 2025 00:00:00"))
    assert(r.contains("Success Rate: 100.00%"))
  }

  test("report text matches generate_reports.py byte conventions (ADVICE r01)") {
    val rep = Restructure.reports(spark, questions)
    val rows = rep.collect()
    rows.foreach { r =>
      val t = r.getAs[String]("report")
      assert(!t.endsWith("\n"), "reference joins with \\n and no trailing newline")
      assert(t.contains("\n\nSummary:\n") && t.contains("\n\nDownloaded Images:"))
    }
    // str.title() semantics: '-' is a word boundary
    val ss = rows.find(_.getAs[String]("subject") == "social-studies")
    assert(ss.isDefined)
    assert(ss.get.getAs[String]("report")
      .startsWith("Image Download Report for Social-Studies "))
  }

  test("flatten CSV rows: all objectives before theory within a batch (ADVICE r01)") {
    val flat = Restructure.flattenCsv(questions)
    // after an ordered collect, within each batch the type sequence must be
    // non-decreasing in (objectives=0, theory=1)
    val seqs = flat.select(col("subject"), col("year"), col("type")).collect()
      .groupBy(r => (r.getString(0), r.getInt(1)))
    seqs.values.foreach { rs =>
      val ranks = rs.map(r => if (r.getString(2) == "objectives") 0 else 1).toSeq
      assert(ranks == ranks.sorted, "theory row interleaved before an objectives row")
    }
  }

  test("metadata enrichment classifies all three outcomes (J2)") {
    val shots = Restructure.restructuredDocs(questions)
      .select(col("subject"), col("year"), col("page_screenshot")).cache()
    // existing state per batch: year%3==0 already has the matching url
    // (current), %3==1 has a stale url (update-replace), %3==2 has none
    // (update-add)
    val existing = shots.select(col("subject"), col("year"),
      when(col("year") % 3 === 0, col("page_screenshot"))
        .when(col("year") % 3 === 1, lit("https://stale.example/old.png"))
        .otherwise(lit(null).cast("string")).as("existing_url"))
    val out = Restructure.enrichMetadata(existing, shots).cache()
    assert(out.filter(col("outcome") === "current")
      .count() == existing.filter(col("year") % 3 === 0).count())
    assert(out.filter(col("outcome") === "update")
      .count() == existing.filter(col("year") % 3 =!= 0).count())
    // a batch with no screenshot in the JSON is skipped
    val skip = Restructure.enrichMetadata(
      existing.limit(1),
      shots.limit(1).withColumn("page_screenshot", lit(null).cast("string")))
    assert(skip.head().getAs[String]("outcome") == "skip")
  }
}
