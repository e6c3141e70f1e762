package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.PyText

/** Batch output jobs (SURVEY §2 A1-A7, S8-S12, F12, J2-J3): restructure,
  * CSV flattening, metadata, image manifest, reports, metadata enrichment —
  * the reference's per-(subject, year) artifacts re-expressed as grouped
  * Dataset transforms (`/root/reference/core/restructure_questions.py`,
  * `core/generate_reports.py`, `update_all_metadata.py`).
  *
  * Determinism: `extraction_date`/screenshot cache-busters take a pinned
  * clock (X11); within-batch question order is (url, pos) — the reference's
  * single-chain fetch order generalized to multi-chain batches.
  */
object Restructure {

  /** Pinned clock for tests/fixtures (2025-01-01T00:00:00). */
  val PinnedIso = "2025-01-01T00:00:00"
  val PinnedMillis: Long = graft.sources.PagesGen.Epoch * 1000L

  private def qtypeCol = when(col("qtype") === "mcq", "objectives").otherwise(col("qtype"))

  /** A1: per (subject, year) restructured doc — objectives/theory arrays with
    * section/type stripped (restructure_questions.py:53-75), plus the
    * screenshot url (J2 enrichment target, update_all_metadata.py:50).
    */
  def restructuredDocs(questions: DataFrame): DataFrame = {
    val q = (if (questions.columns.contains("answer_after_solution")) questions
      else questions.withColumn("answer_after_solution", lit(false)))
      .withColumn("qt", qtypeCol)
      .withColumn("ord", struct(col("url"), col("pos")))
    // reference dicts: mcq rows have no subparts key, theory rows no options
    // key (core/main.py:190-203,449-456) — null here so JSON sinks omit them.
    // answer_after_solution is the F9 key-order directive the JSON sink
    // consumes (BatchSink.jsonRow) — never rendered itself.
    val cleaned = struct(col("number"), col("question"),
      when(col("qt") === "objectives", col("options")).otherwise(lit(null)).as("options"),
      when(col("qt") === "theory", col("subparts")).otherwise(lit(null)).as("subparts"),
      col("diagrams"), col("answer"), col("solution"),
      col("answer_after_solution"))
    q.groupBy(col("seed_subject").as("subject"), col("seed_year").as("year"))
      .agg(
        sort_array(collect_list(when(col("qt") === "objectives",
          struct(col("ord"), cleaned.as("q"))))).as("obj_sorted"),
        sort_array(collect_list(when(col("qt") === "theory",
          struct(col("ord"), cleaned.as("q"))))).as("th_sorted"))
      .select(col("subject"), col("year"),
        expr("transform(obj_sorted, x -> x.q)").as("objectives"),
        expr("transform(th_sorted, x -> x.q)").as("theory"),
        screenshotUrl(col("subject"), col("year")).as("page_screenshot"))
  }

  /** S14: deterministic cloud-screenshot URL mint (folder scheme + epoch
    * cache-buster, screenshot_storage_service.py:106-198).
    */
  def screenshotUrl(subject: org.apache.spark.sql.Column,
                    year: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("https://ik.imagekit.io/graft/screenshots/"), subject, lit("/"),
      year.cast("string"), lit("/"), subject, lit("_"), year.cast("string"),
      lit(s".png?updatedAt=$PinnedMillis"))

  /** A2: spider stats — totals, per-type, with-diagrams, with-solutions
    * (restructure_questions.py:55-80,140-150). One pass, rollup for totals.
    */
  def spiderStats(questions: DataFrame): DataFrame =
    questions.withColumn("qt", qtypeCol)
      .rollup(col("seed_subject").as("subject"), col("seed_year").as("year"), col("qt"))
      .agg(count(lit(1)).as("n_questions"),
        sum(when(size(col("diagrams")) > 0, 1L).otherwise(0L)).as("with_diagrams"),
        sum(when(col("solution").isNotNull && col("solution") =!= "", 1L).otherwise(0L))
          .as("with_solutions"))

  /** S12/J3: image manifest — every kept diagram url mapped to its
    * deterministic local path `images/{qtype}/{quoted-filename}` (the
    * ImageDownloader contract, docs/PROJECT_STRUCTURE.md:83-91), with
    * first-occurrence dedup across the batch.
    */
  def imageManifest(questions: DataFrame): DataFrame = {
    val pathFor = udf((qt: String, url: String) => {
      val fn = url.substring(url.lastIndexOf('/') + 1)
      s"images/$qt/${PyText.pyQuote(fn)}"
    })
    // first-occurrence order = the downloader's iteration order over the
    // restructured dict: all objectives (in (url, pos) order) before theory
    // (restructure_questions.py:88-91 → ImageDownloader insertion order)
    val ordRank = when(col("qt") === "objectives", 0).otherwise(1)
    val w = Window.partitionBy(col("subject"), col("year"), col("image_url"))
      .orderBy(ordRank, col("url"), col("pos"))
    questions.withColumn("qt", qtypeCol)
      .select(col("seed_subject").as("subject"), col("seed_year").as("year"),
        col("url"), col("pos"), col("qt"),
        explode(col("diagrams")).as("image_url"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("subject"), col("year"), col("image_url"),
        pathFor(col("qt"), col("image_url")).as("local_path"),
        ordRank.as("ord_rank"), col("url").as("ord_url"), col("pos").as("ord_pos"))
  }

  /** A3+A4: per-batch image download stats with success rate (all downloads
    * succeed in the sandbox stand-in; the rate guard mirrors
    * generate_reports.py:51-55).
    */
  def imageDownloadStats(questions: DataFrame): DataFrame =
    imageManifest(questions)
      .groupBy(col("subject"), col("year"))
      .agg(count(lit(1)).as("total_images_expected"),
        count(lit(1)).as("downloaded_images_count"),
        lit(0L).as("failed_downloads"),
        // an ORDERED entry list, not a map: the reference's
        // downloaded_image_map is a dict in download (first-occurrence)
        // order, and Scala Maps beyond 4 entries lose insertion order — the
        // sink renders these entries as a JSON object
        expr("transform(sort_array(collect_list(struct(" +
          "ord_rank, ord_url, ord_pos, image_url, local_path))), " +
          "x -> struct(x.image_url AS image_url, x.local_path AS local_path))")
          .as("downloaded_image_map"))
      .withColumn("success_rate",
        when(col("total_images_expected") > 0,
          round(col("downloaded_images_count") * 100.0 / col("total_images_expected"), 2))
          .otherwise(0.0))

  /** S10: per-batch metadata doc (restructure_questions.py:136-158) —
    * format_version "2.0", pinned extraction_date.
    */
  def metadata(questions: DataFrame): DataFrame = {
    val byType = questions.withColumn("qt", qtypeCol)
      .groupBy(col("seed_subject").as("subject"), col("seed_year").as("year"))
      .agg(
        count(lit(1)).as("total_questions"),
        sum(when(col("qt") === "objectives", 1L).otherwise(0L)).as("objective_questions"),
        sum(when(col("qt") === "theory", 1L).otherwise(0L)).as("theory_questions"),
        sum(when(col("qt") === "objectives" && size(col("diagrams")) > 0, 1L).otherwise(0L))
          .as("diagrams_objectives"),
        sum(when(col("qt") === "theory" && size(col("diagrams")) > 0, 1L).otherwise(0L))
          .as("diagrams_theory"),
        sum(when(col("qt") === "objectives" && col("solution").isNotNull &&
          col("solution") =!= "", 1L).otherwise(0L)).as("solutions_objectives"),
        sum(when(col("qt") === "theory" && col("solution").isNotNull &&
          col("solution") =!= "", 1L).otherwise(0L)).as("solutions_theory"))
    byType.join(imageDownloadStats(questions), Seq("subject", "year"), "left")
      .select(col("subject"), col("year"),
        lit(PinnedIso).as("extraction_date"),
        // zero-count type keys are OMITTED: the reference converts
        // defaultdicts with dict(), so a type that never incremented has no
        // key (restructure_questions.py:144-145) — null here so the JSON
        // sink drops it
        struct(col("total_questions"), col("objective_questions"),
          col("theory_questions"),
          struct(when(col("diagrams_objectives") > 0, col("diagrams_objectives"))
            .as("objectives"),
            when(col("diagrams_theory") > 0, col("diagrams_theory")).as("theory"))
            .as("questions_with_diagrams"),
          struct(when(col("solutions_objectives") > 0, col("solutions_objectives"))
            .as("objectives"),
            when(col("solutions_theory") > 0, col("solutions_theory")).as("theory"))
            .as("questions_with_solutions"),
          col("subject"),
          concat(lit("https://kuulchat.com/bece/questions/"), col("subject"),
            lit("-"), col("year").cast("string"), lit("/")).as("source_url"),
          lit("restructured").as("spider_reason"),
          struct(coalesce(col("total_images_expected"), lit(0L)).as("total_images_expected"),
            coalesce(col("downloaded_images_count"), lit(0L)).as("downloaded_images_count"),
            coalesce(col("failed_downloads"), lit(0L)).as("failed_downloads"),
            coalesce(col("downloaded_image_map"),
              expr("array()").cast("array<struct<image_url:string,local_path:string>>"))
              .as("downloaded_image_map"))
            .as("image_download_stats")).as("spider_stats"),
        struct(
          concat(col("subject"), lit("_"), col("year").cast("string"), lit(".json"))
            .as("questions_json"),
          concat(col("subject"), lit("_"), col("year").cast("string"), lit(".csv"))
            .as("questions_csv"),
          lit("images/").as("images"), lit("reports/").as("reports"))
          .as("file_structure"),
        lit("2.0").as("format_version"))
  }

  /** F12 + flatten_question (restructure_questions.py:12-46): wide CSV rows.
    * Column set is the dynamic union over the batch (max subpart fan-out
    * computed in one tiny agg); header order = rank(common < option_ <
    * subpart_ < other) then name — exactly the reference's sort key.
    */
  def flattenCsv(questions: DataFrame): DataFrame = {
    val q = questions.withColumn("qt", qtypeCol)
    // driver-side schema decision (one scalar agg — scale-safe)
    val m = q.agg(
      coalesce(max(size(col("subparts"))), lit(0)).as("max_sp"),
      coalesce(max(expr(
        "aggregate(transform(coalesce(subparts, array()), s -> size(s.subparts)), 0, (a, x) -> greatest(a, x))")),
        lit(0)).as("max_nested")).head()
    val maxSp = m.getInt(0)
    val maxNested = m.getInt(1)

    val common = Seq(
      col("qt").as("type"), col("number"), col("question"),
      coalesce(col("solution"), lit("")).as("solution"),
      coalesce(col("answer"), lit("")).as("answer"),
      array_join(col("diagrams"), "|").as("diagrams"))
    val optionCols = Seq("A", "B", "C", "D").map(k =>
      when(col("qt") === "objectives", coalesce(col(s"options.$k"), lit("")))
        .otherwise(lit(null)).as(s"option_$k"))
    val spCols = (1 to maxSp).flatMap { i =>
      // try_element_at: 1-based, null-safe under ANSI mode
      val sp = expr(s"try_element_at(subparts, $i)")
      def guard(c: org.apache.spark.sql.Column) =
        when(col("qt") === "theory" && size(col("subparts")) >= i, coalesce(c, lit("")))
          .otherwise(when(col("qt") === "theory", lit("")).otherwise(lit(null)))
      Seq(guard(sp.getField("question")).as(s"subpart_${i}_question"),
        guard(sp.getField("solution")).as(s"subpart_${i}_solution"),
        guard(lit("")).as(s"subpart_${i}_answer")) ++
        (1 to maxNested).flatMap { j =>
          val ch = ('a' + j - 1).toChar
          val ns = expr(s"try_element_at(try_element_at(subparts, $i).subparts, $j)")
          def nguard(c: org.apache.spark.sql.Column) =
            when(col("qt") === "theory" && size(col("subparts")) >= i &&
              size(sp.getField("subparts")) >= j, coalesce(c, lit("")))
              .otherwise(when(col("qt") === "theory", lit("")).otherwise(lit(null)))
          Seq(nguard(ns.getField("question")).as(s"subpart_${i}_${ch}_question"),
            nguard(lit("")).as(s"subpart_${i}_${ch}_solution"),
            nguard(lit("")).as(s"subpart_${i}_${ch}_answer"))
        }
    }
    val keyCols = Seq(col("seed_subject").as("subject"), col("seed_year").as("year"),
      col("url"), col("pos"))
    val all = keyCols ++ common ++ optionCols ++ spCols
    val wide = q.select(all: _*)
    // reference header order: rank then python string sort
    val commonNames = Set("type", "number", "question", "solution", "answer", "diagrams")
    def rank(n: String): Int =
      if (commonNames(n)) 0 else if (n.startsWith("option_")) 1
      else if (n.startsWith("subpart_")) 2 else 3
    val dataCols = wide.columns.filterNot(Seq("subject", "year", "url", "pos").contains)
      .sortBy(n => (rank(n), n))
    // row order: the reference iterates the restructured dict — ALL
    // objectives rows first, then theory (restructure_questions.py:100-103)
    wide.select((Seq("subject", "year", "url", "pos") ++ dataCols).map(col): _*)
      .orderBy(col("subject"), col("year"),
        when(col("type") === "objectives", 0).otherwise(1), col("url"), col("pos"))
  }

  /** S11/A4: per-batch image-download report text — byte-faithful to
    * `generate_reports.py:57-101`: lines joined with "\n" and NO trailing
    * newline, `.title()` semantics (capitalize after any non-letter, so
    * "social-studies" → "Social-Studies"), zero-count diagram keys read as 0
    * (`.get(..., 0)`), image lines in the map's insertion (download) order.
    * Pinned clock.
    */
  def reports(spark: SparkSession, questions: DataFrame): DataFrame = {
    import spark.implicits._
    metadata(questions)
      .select(col("subject"), col("year"), col("spider_stats"))
      .map(r => (r.getAs[String]("subject"), r.getAs[Int]("year"),
        reportText(r.getAs[String]("subject"), r.getAs[Int]("year"),
          r.getAs[org.apache.spark.sql.Row]("spider_stats"))))
      .toDF("subject", "year", "report")
  }

  /** The report body for one batch, from its metadata `spider_stats` row —
    * shared by [[reports]] (the Dataset form) and BatchSink's writer (which
    * renders it driver-side from the ALREADY-collected metadata rows instead
    * of running a second metadata job per batch tree).
    */
  private[operators] def reportText(subject: String, year: Int,
                                    stats: org.apache.spark.sql.Row): String = {
    def longOr0(row: org.apache.spark.sql.Row, name: String): Long = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }
    val total = stats.getAs[Long]("total_questions")
    val diag = stats.getAs[org.apache.spark.sql.Row]("questions_with_diagrams")
    val ids = stats.getAs[org.apache.spark.sql.Row]("image_download_stats")
    val expected = ids.getAs[Long]("total_images_expected")
    val downloaded = ids.getAs[Long]("downloaded_images_count")
    val failed = ids.getAs[Long]("failed_downloads")
    val rate = if (expected > 0) downloaded.toDouble / expected * 100 else 0.0
    val images: scala.collection.Seq[org.apache.spark.sql.Row] =
      Option(ids.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
        "downloaded_image_map")).getOrElse(scala.collection.Seq.empty)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += s"Image Download Report for ${PyText.pyTitle(subject.replace('_', ' '))} $year"
    lines += "Generated on: Wednesday, January 01, 2025 00:00:00"
    lines += "\nSummary:"
    lines += s"  Total Questions: $total"
    lines += "  Questions with Images:"
    lines += s"    Objective Questions: ${longOr0(diag, "objectives")}"
    lines += s"    Theory Questions: ${longOr0(diag, "theory")}"
    lines += s"  Total Images Expected: $expected"
    lines += s"  Successfully Downloaded: $downloaded"
    lines += s"  Failed Downloads: $failed"
    lines += f"  Success Rate: $rate%.2f%%"
    lines += "  Images are organized in:"
    lines += "    images/objective/"
    lines += "    images/theory/"
    lines += "\nDownloaded Images:"
    images.foreach { im =>
      lines += s"  Downloaded: ${im.getAs[String]("image_url")} -> ${im.getAs[String]("local_path")}"
    }
    if (failed > 0) {
      lines += "\nFailed Downloads (Expected but not found locally):"
      lines += s"  $failed images failed to download or were not found."
      lines += "  (Detailed list of failed downloads not available in metadata for this version.)"
    }
    lines.mkString("\n")
  }

  /** J2 (update_all_metadata.py:96-133): classify each batch given its
    * EXISTING metadata screenshot url — `existing` must carry
    * (subject, year, existing_url). Missing/empty incoming url → skip;
    * existing equals incoming → current (already up to date); else → update
    * (add new or replace stale). The artifact-tree round-trip that produces
    * `existing_url` for real (scan → classify → enrich_metadata_file) lives
    * in [[Enrichment]]; this is the pure classification join.
    */
  def enrichMetadata(existing: DataFrame, screenshots: DataFrame): DataFrame =
    existing.join(screenshots, Seq("subject", "year"), "left")
      .withColumn("outcome",
        when(col("page_screenshot").isNull || col("page_screenshot") === "",
          lit("skip"))
          .when(col("existing_url").isNotNull && col("existing_url") =!= "" &&
            col("existing_url") === col("page_screenshot"), lit("current"))
          .otherwise(lit("update")))
      .select(col("subject"), col("year"), col("page_screenshot"), col("outcome"))
}
