package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Json

/** Metadata/data enrichment (SURVEY §2 J2, A6; the reference's
  * DataEnrichmentService + bulk update job):
  *
  *  - the J2 round-trip for real: scan the artifact tree back, read each
  *    batch's JSON screenshot url and its metadata's existing
  *    `spider_stats.page_screenshot`, classify update | current | skip
  *    exactly as `/root/reference/update_all_metadata.py:96-145`, and apply
  *    updates via `enrich_metadata_file`;
  *  - the documented file write-backs of the (source-absent, docs-specified)
  *    DataEnrichmentService — `enrich_json_file`, `enrich_csv_file`,
  *    `enrich_metadata_file`, `enrich_files(create_backup=True)`
  *    (`/root/reference/docs/API_REFERENCE.md:225-286`; SURVEY §0 makes
  *    documented behaviors of absent modules part of the spec).
  *
  * File ops are driver-side on per-batch artifacts, like the reference's
  * single-process writers and BatchSink (batches are small by construction);
  * the scan→classify step is a DataFrame job so the outcome accounting (A6)
  * stays distributed.
  */
object Enrichment {

  private def readFile(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)

  private def writeFile(p: String, s: String): Unit =
    Files.write(Paths.get(p), s.getBytes(StandardCharsets.UTF_8))

  /** enrich_json_file (API_REFERENCE.md:233-247): set `fieldName` at the JSON
    * root. Returns false (reference: log + False) when the file is unreadable.
    */
  def enrichJsonFile(jsonPath: String, url: String,
                     fieldName: String = "page_screenshot"): Boolean =
    try {
      val root = Json.parse(readFile(jsonPath))
        .asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
      root.put(fieldName, url)
      writeFile(jsonPath, Json.pretty(root))
      true
    } catch { case _: Exception => false }

  /** enrich_csv_file (API_REFERENCE.md:249-261): append a `fieldName` column
    * holding the url to the header and every record. CSV records are split
    * quote-aware (fields contain newlines), line terminator \r\n as written
    * by the sink.
    */
  def enrichCsvFile(csvPath: String, url: String,
                    fieldName: String = "page_screenshot"): Boolean =
    try {
      val text = readFile(csvPath)
      val records = splitCsvRecords(text)
      if (records.isEmpty) return false
      val quotedUrl =
        if (url.contains(",") || url.contains("\"") || url.contains("\n"))
          "\"" + url.replace("\"", "\"\"") + "\"" else url
      val out = new StringBuilder
      out ++= records.head + "," + fieldName + "\r\n"
      records.tail.foreach(r => out ++= r + "," + quotedUrl + "\r\n")
      writeFile(csvPath, out.result())
      true
    } catch { case _: Exception => false }

  /** Quote-aware record split on \r\n (drops the trailing empty record). */
  private[graft] def splitCsvRecords(text: String): Seq[String] = {
    val recs = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"') { inQuotes = !inQuotes; cur += c }
      else if (!inQuotes && c == '\r' && i + 1 < text.length && text.charAt(i + 1) == '\n') {
        recs += cur.result(); cur.clear(); i += 1
      } else cur += c
      i += 1
    }
    if (cur.nonEmpty) recs += cur.result()
    recs.result()
  }

  /** enrich_metadata_file (update_all_metadata.py:135-139; the existing-url
    * probe at :67 reads `spider_stats.page_screenshot`): set the field inside
    * the metadata's spider_stats object.
    */
  def enrichMetadataFile(metadataPath: String, url: String,
                         fieldName: String = "page_screenshot"): Boolean =
    try {
      val root = Json.parse(readFile(metadataPath))
        .asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
      val stats = root.getOrElseUpdate("spider_stats",
          scala.collection.mutable.LinkedHashMap.empty[String, Any])
        .asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
      stats.put(fieldName, url)
      writeFile(metadataPath, Json.pretty(root))
      true
    } catch { case _: Exception => false }

  /** enrich_files (API_REFERENCE.md:263-286 + screenshot_workflow.py:168-176):
    * optional backup copies (`<path>.backup`) then enrich json/csv/metadata;
    * true only if every present target succeeded.
    */
  def enrichFiles(jsonPath: Option[String], csvPath: Option[String],
                  metadataPath: Option[String], url: String,
                  createBackup: Boolean = true): Boolean = {
    def backup(p: String): Unit =
      Files.copy(Paths.get(p), Paths.get(p + ".backup"),
        StandardCopyOption.REPLACE_EXISTING)
    if (createBackup)
      (jsonPath ++ csvPath ++ metadataPath).filter(p => Files.exists(Paths.get(p)))
        .foreach(backup)
    jsonPath.forall(enrichJsonFile(_, url)) &&
      csvPath.forall(enrichCsvFile(_, url)) &&
      metadataPath.forall(enrichMetadataFile(_, url))
  }

  // --- the bulk J2 job -------------------------------------------------------

  private val stateSchema = StructType(Seq(
    StructField("subject", StringType), StructField("year", IntegerType),
    StructField("json_exists", BooleanType),
    StructField("metadata_exists", BooleanType),
    StructField("screenshot_url", StringType),
    StructField("existing_url", StringType)))

  /** Scan the batch artifact tree: one row per `<subject>_<year>` directory
    * with the JSON's root screenshot url and the metadata's existing url
    * (update_all_metadata.py:20-42,45-71 — subject parse handles underscores:
    * everything before the last `_` is the subject).
    */
  def scanBatchState(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.matches(".*_\\d+$"))
      .sortBy(_.getName)
    val rows = dirs.toSeq.map { d =>
      val name = d.getName
      val cut = name.lastIndexOf('_')
      val subject = name.substring(0, cut)
      val year = name.substring(cut + 1).toInt
      val jsonP = Paths.get(d.getPath, s"$name.json")
      val metaP = Paths.get(d.getPath, s"${name}_metadata.json")
      val screenshotUrl =
        if (!Files.exists(jsonP)) null
        else Json.parse(readFile(jsonP.toString)) match {
          case m: scala.collection.Map[_, _] =>
            m.asInstanceOf[scala.collection.Map[String, Any]]
              .get("page_screenshot").collect { case s: String => s }.orNull
          case _ => null
        }
      val existingUrl =
        if (!Files.exists(metaP)) null
        else Json.parse(readFile(metaP.toString)) match {
          case m: scala.collection.Map[_, _] =>
            m.asInstanceOf[scala.collection.Map[String, Any]]
              .get("spider_stats").collect {
                case s: scala.collection.Map[_, _] =>
                  s.asInstanceOf[scala.collection.Map[String, Any]]
                    .get("page_screenshot").collect { case u: String => u }.orNull
              }.flatMap(Option(_)).orNull
          case _ => null
        }
      Row(subject, year, Files.exists(jsonP), Files.exists(metaP),
        screenshotUrl, existingUrl)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(rows.size, 1)), stateSchema)
  }

  /** Outcome per batch, exactly update_all_metadata.py:104-133:
    * missing json/metadata or empty screenshot url → skip; existing equals
    * incoming → current (already up to date); else → update (add or replace).
    */
  def classify(state: DataFrame): DataFrame =
    state.withColumn("outcome",
      when(!col("json_exists") || !col("metadata_exists"), lit("skip"))
        .when(col("screenshot_url").isNull || col("screenshot_url") === "", lit("skip"))
        .when(col("existing_url").isNotNull && col("existing_url") =!= "" &&
          col("existing_url") === col("screenshot_url"), lit("current"))
        .otherwise(lit("update")))

  /** The full bulk update (update_all_metadata.py:74-169): scan → classify →
    * apply `enrich_metadata_file` to every `update` row. Returns the per-batch
    * outcome rows (A6 counters are a groupBy away); idempotent — a second run
    * classifies every previously-updated batch `current`.
    */
  def updateAllMetadata(spark: SparkSession, outDir: String): DataFrame = {
    val classified = classify(scanBatchState(spark, outDir))
    classified.filter(col("outcome") === "update")
      .select(col("subject"), col("year"), col("screenshot_url"))
      .collect() // per-batch artifacts: small by construction (BatchSink note)
      .foreach { r =>
        val name = s"${r.getString(0)}_${r.getInt(1)}"
        val ok = enrichMetadataFile(
          Paths.get(outDir, name, s"${name}_metadata.json").toString,
          r.getString(2))
        require(ok, s"metadata enrichment failed for $name")
      }
    classified.select(col("subject"), col("year"), col("outcome"))
  }
}
