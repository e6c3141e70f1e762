package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Json

/** Reference-format file sinks (SURVEY §2.1 S5-S11): per-(subject, year)
  * batch directory with `{s}_{y}.json` (indent 2, unicode kept),
  * `{s}_{y}.csv` (dynamic rank-ordered header), `{s}_{y}_metadata.json`,
  * and `reports/{s}_{y}_image_download_report.txt` — the exact artifact
  * tree of `/root/reference/core/restructure_questions.py:93-173` and
  * `core/generate_reports.py:94-101`.
  *
  * Batch files are small by construction (one exam batch each), so the
  * writers collect per-batch rows to the driver exactly like the reference's
  * single-process writers; the heavy lifting (grouping, flattening, stats)
  * stays distributed in Restructure.
  *
  * Key-order provenance (ADVICE r01, closed in r03): when the reference's
  * HTML-answer fallback fires for a question that also has a solution, its
  * dict order is ..., solution, answer (core/main.py:178-183). The parse
  * carries that as `Question.answer_after_solution`, and every
  * insertion-ordered sink here honors it (itemOf / jsonRow); the
  * `*.ordered.json` goldens byte-check it against the CPython oracle.
  */
object BatchSink {

  private def jsonValue(v: Any, indent: Int): String = v match {
    case null => "null"
    case s: String => Json.str(s)
    case r: Row => jsonRow(r, indent)
    case seq: scala.collection.Seq[_] =>
      if (seq.isEmpty) "[]"
      else {
        val pad = "  " * (indent + 1)
        seq.map(x => pad + jsonValue(x, indent + 1))
          .mkString("[\n", ",\n", "\n" + ("  " * indent) + "]")
      }
    case m: scala.collection.Map[_, _] =>
      if (m.isEmpty) "{}"
      else {
        val pad = "  " * (indent + 1)
        m.map { case (k, x) => pad + Json.str(k.toString) + ": " + jsonValue(x, indent + 1) }
          .mkString("{\n", ",\n", "\n" + ("  " * indent) + "}")
      }
    case b: Boolean => b.toString
    case n => n.toString
  }

  /** Render an ordered (image_url, local_path) entry list as a JSON object —
    * the reference's downloaded_image_map is a dict in download order, which
    * the engine carries as an array (Scala Maps lose insertion order past 4
    * entries).
    */
  private def jsonEntriesObject(v: Any, indent: Int): String = v match {
    case seq: scala.collection.Seq[_] if seq.nonEmpty =>
      val pad = "  " * (indent + 1)
      seq.map { case e: Row =>
        pad + Json.str(e.getAs[String]("image_url")) + ": " +
          Json.str(e.getAs[String]("local_path"))
      }.mkString("{\n", ",\n", "\n" + ("  " * indent) + "}")
    case _ => "{}"
  }

  /** `overrides`: field name → pre-rendered JSON (e.g. the metadata `year`,
    * which the reference holds as a str parsed from the CLI/directory and so
    * writes as a JSON string, restructure_questions.py:136-137).
    */
  private def jsonRow(r: Row, indent: Int,
                      overrides: Map[String, String] = Map.empty): String = {
    val pad = "  " * (indent + 1)
    // F9 key-order provenance: a boolean `answer_after_solution` field is an
    // ordering DIRECTIVE, not data — drop it from the output and, when set,
    // emit the answer key after the solution key (Question scaladoc).
    val names = r.schema.fieldNames.zipWithIndex
    val ansAfterSol = names.collectFirst {
      case ("answer_after_solution", i) if !r.isNullAt(i) => r.getBoolean(i)
    }.getOrElse(false)
    val base = names.filterNot(_._1 == "answer_after_solution")
    val ordered =
      if (!ansAfterSol) base
      else base.find(_._1 == "answer") match {
        case Some(a) =>
          val without = base.filterNot(_._1 == "answer")
          val si = without.indexWhere(_._1 == "solution")
          if (si < 0) base else (without.take(si + 1) :+ a) ++ without.drop(si + 1)
        case None => base
      }
    val fields = ordered
      .filter { case (_, i) => !r.isNullAt(i) } // reference omits absent keys
      .map { case (n, i) =>
        val rendered = overrides.getOrElse(n,
          if (n == "downloaded_image_map") jsonEntriesObject(r.get(i), indent + 1)
          else jsonValue(r.get(i), indent + 1))
        pad + Json.str(n) + ": " + rendered
      }
    if (fields.isEmpty) "{}" else fields.mkString("{\n", ",\n", "\n" + ("  " * indent) + "}")
  }

  private def csvQuote(s: String): String =
    if (s == null) ""
    else if (s.contains(",") || s.contains("\"") || s.contains("\n"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Write the full reference artifact tree for every batch under `outDir`.
    * Returns the batch directories written.
    */
  def writeBatchOutputs(spark: SparkSession, questions: DataFrame,
                        outDir: String): Seq[String] = {
    // the three per-batch collects are independent jobs over one (usually
    // checkpointed) input writing to disjoint driver maps — run them
    // concurrently from driver threads so their fixed per-job cost overlaps
    // (guide §2.6; the engine's wave commits use the same pattern). The
    // report text is rendered driver-side from the collected metadata rows
    // (Restructure.reportText) instead of running a second metadata job.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val docsF = Future(Restructure.restructuredDocs(questions)
      .collect().map(r => (r.getAs[String]("subject"), r.getAs[Int]("year")) -> r).toMap)
    val metasF = Future(Restructure.metadata(questions)
      .collect().map(r => (r.getAs[String]("subject"), r.getAs[Int]("year")) -> r).toMap)
    val flatF = Future {
      val flat = Restructure.flattenCsv(questions)
      val cols = flat.columns.drop(4) // subject, year, url, pos are keys
      (cols, flat.collect().groupBy(r => (r.getAs[String]("subject"), r.getAs[Int]("year"))))
    }
    val docs = Await.result(docsF, Duration.Inf)
    val metas = Await.result(metasF, Duration.Inf)
    val (flatCols, flatRows) = Await.result(flatF, Duration.Inf)
    val reports = metas.map { case (k, m) =>
      k -> Restructure.reportText(k._1, k._2, m.getAs[org.apache.spark.sql.Row]("spider_stats"))
    }

    // per-batch rendering + writes are independent (disjoint dirs): fan them
    // out on driver threads like the collects above; result order preserved
    val written = docs.keys.toSeq.sortBy(identity).map { case (subject, year) =>
      Future(writeOneBatch(outDir, subject, year,
        docs((subject, year)), metas((subject, year)),
        reports((subject, year)), flatCols,
        flatRows.getOrElse((subject, year), Array.empty)))
    }
    written.map(Await.result(_, Duration.Inf))
  }

  private def writeOneBatch(outDir: String, subject: String, year: Int,
                            doc: Row, meta: Row, report: String,
                            flatCols: Array[String], rows: Array[Row]): String = {
    {
      val dir = Paths.get(outDir, s"${subject}_$year")
      Files.createDirectories(dir.resolve("reports"))

      // S8: restructured JSON — {objectives: [...], theory: [...], page_screenshot}
      val structured = new StringBuilder("{\n")
      structured ++= "  " + Json.str("objectives") + ": " +
        jsonValue(doc.getAs[Any]("objectives"), 1) + ",\n"
      structured ++= "  " + Json.str("theory") + ": " +
        jsonValue(doc.getAs[Any]("theory"), 1) + ",\n"
      structured ++= "  " + Json.str("page_screenshot") + ": " +
        Json.str(doc.getAs[String]("page_screenshot")) + "\n}"
      Files.write(dir.resolve(s"${subject}_$year.json"),
        structured.result().getBytes(StandardCharsets.UTF_8))

      // S9: flattened CSV with the reference's header order
      val csv = new StringBuilder(flatCols.map(csvQuote).mkString(",") + "\r\n")
      rows.foreach { r =>
        csv ++= flatCols.map { c =>
          val v = r.getAs[Any](c)
          if (v == null) "" else csvQuote(v.toString)
        }.mkString(",") + "\r\n"
      }
      Files.write(dir.resolve(s"${subject}_$year.csv"),
        csv.result().getBytes(StandardCharsets.UTF_8))

      // S10: metadata JSON (year as a JSON string — see jsonRow overrides)
      Files.write(dir.resolve(s"${subject}_${year}_metadata.json"),
        jsonRow(meta, 0,
          overrides = Map("year" -> Json.str(year.toString)))
          .getBytes(StandardCharsets.UTF_8))

      // S11: report text
      Files.write(dir.resolve("reports").resolve(s"${subject}_${year}_image_download_report.txt"),
        report.getBytes(StandardCharsets.UTF_8))

      dir.toString
    }
  }

  /** S5/S6 in their literal form: the raw Scrapy feed files that land BEFORE
    * restructuring (`run_spider.py:182-192`) — `temp_{subject}_{year}.json`
    * (indent-2 JSON array of yielded items, crawl order) and
    * `temp_{subject}_{year}.csv`. Item key order = the spider's dict
    * insertion order (`core/main.py:178-203,449-456`); `answer`/`solution`
    * keys present only when set. CSV columns = the first item's keys
    * (Scrapy's CsvItemExporter default with FEED_EXPORT_FIELDS unset);
    * nested values are serialized as JSON (stable stand-in for Scrapy's
    * python-repr cells — the reference pipeline never reads the CSV back).
    * Returns (jsonPath, csvPath) per batch.
    */
  def writeRawFeeds(spark: SparkSession, questions: DataFrame,
                    outDir: String): Seq[(String, String)] = {
    import scala.collection.mutable.LinkedHashMap
    def itemOf(r: Row): LinkedHashMap[String, Any] = {
      val m = LinkedHashMap.empty[String, Any]
      m("section") = r.getAs[String]("section")
      m("type") = r.getAs[String]("qtype")
      m("number") = r.getAs[Int]("number").toLong
      m("question") = r.getAs[String]("question")
      val opts = r.getAs[Row]("options")
      if (r.getAs[String]("qtype") == "mcq" && opts != null)
        m("options") = LinkedHashMap(
          "A" -> opts.getAs[String]("A"), "B" -> opts.getAs[String]("B"),
          "C" -> opts.getAs[String]("C"), "D" -> opts.getAs[String]("D"))
      if (r.getAs[String]("qtype") == "theory")
        m("subparts") = Option(r.getAs[scala.collection.Seq[Row]]("subparts"))
          .getOrElse(scala.collection.Seq.empty).map { sp =>
            val s = LinkedHashMap.empty[String, Any]
            s("part") = sp.getAs[String]("part")
            s("question") = sp.getAs[String]("question")
            s("subparts") = Option(sp.getAs[scala.collection.Seq[Row]]("subparts"))
              .getOrElse(scala.collection.Seq.empty).map(ss => LinkedHashMap(
                "part" -> ss.getAs[String]("part"),
                "question" -> ss.getAs[String]("question")))
            if (sp.getAs[String]("solution") != null)
              s("solution") = sp.getAs[String]("solution")
            s
          }
      m("diagrams") =
        Option(r.getAs[scala.collection.Seq[String]]("diagrams"))
          .getOrElse(scala.collection.Seq.empty)
      // F9 provenance (Question.answer_after_solution): fallback answer on an
      // existing answer_info lands after the solution key
      val ansAfterSol = scala.util.Try(r.fieldIndex("answer_after_solution"))
        .toOption.exists(i => !r.isNullAt(i) && r.getBoolean(i))
      def putAnswer(): Unit =
        if (r.getAs[String]("answer") != null) m("answer") = r.getAs[String]("answer")
      def putSolution(): Unit =
        if (r.getAs[String]("solution") != null) m("solution") = r.getAs[String]("solution")
      if (ansAfterSol) { putSolution(); putAnswer() } else { putAnswer(); putSolution() }
      m
    }
    Files.createDirectories(Paths.get(outDir))
    val rows = questions
      .orderBy(col("seed_subject"), col("seed_year"), col("url"), col("pos"))
      .collect() // reference batch sizes: small by construction (header note)
    // per-batch item rendering + writes are independent (disjoint files):
    // fan out on driver threads, order preserved (see writeBatchOutputs)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    rows.groupBy(r => (r.getAs[String]("seed_subject"), r.getAs[Int]("seed_year")))
      .toSeq.sortBy(_._1).map { case ((subject, year), rs) => Future {
        val items = rs.map(itemOf).toSeq
        val jsonP = Paths.get(outDir, s"temp_${subject}_$year.json")
        Files.write(jsonP,
          graft.util.Json.pretty(items).getBytes(StandardCharsets.UTF_8))
        val cols = items.headOption.map(_.keys.toSeq).getOrElse(Seq.empty)
        val csv = new StringBuilder(cols.map(csvQuote).mkString(",") + "\r\n")
        items.foreach { it =>
          csv ++= cols.map { c =>
            it.get(c) match {
              case None | Some(null) => ""
              case Some(s: String) => csvQuote(s)
              case Some(n: Long) => n.toString
              case Some(v) => csvQuote(graft.util.Json.pretty(v)
                .replace("\n", " ").replaceAll(" +", " "))
            }
          }.mkString(",") + "\r\n"
        }
        val csvP = Paths.get(outDir, s"temp_${subject}_$year.csv")
        Files.write(csvP, csv.result().getBytes(StandardCharsets.UTF_8))
        (jsonP.toString, csvP.toString)
      }}.map(Await.result(_, Duration.Inf))
  }

  /** S7: scan a raw temp feed back (restructure_questions.py:50-51 —
    * `json.load` of the Scrapy feed array) as a DataFrame of items.
    */
  def readRawFeed(spark: SparkSession, jsonPath: String): DataFrame =
    spark.read.option("multiLine", "true").json(jsonPath)

  /** S7: scan the batch output tree back (directory-name parse, X10) —
    * `update_all_metadata.py:20-42` / `generate_reports.py:6-16`.
    */
  def scanBatches(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSeq
    dirs.toDF("dirname")
      .filter(col("dirname").rlike("^.*_\\d+$"))
      .select(
        regexp_extract(col("dirname"), "^(.*)_(\\d+)$", 1).as("subject"),
        regexp_extract(col("dirname"), "^(.*)_(\\d+)$", 2).cast("int").as("year"))
      .orderBy("subject", "year")
  }
}
