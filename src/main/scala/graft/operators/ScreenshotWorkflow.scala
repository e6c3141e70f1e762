package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Retry

/** Screenshot workflow composition (SURVEY §2 S13-S14, A7): capture → upload
  * → enrich as ONE pipeline with per-stage retry accounting — the
  * reference's `services/screenshot_workflow.py:87-190` (process_url) and
  * `:283-296` (process_batch), including its retry budgets: capture 3× with
  * fixed 2 s delay (`screenshot_service.py:206-246`), upload 3× with
  * exponential backoff from 1 s (`screenshot_storage_service.py:200-253`),
  * then `enrich_files(create_backup=True)` (`screenshot_workflow.py:168-176`).
  *
  * The browser and the storage API are out of scope offline (SURVEY §0), so
  * `capture`/`upload` are injectable; the deterministic defaults succeed and
  * mint the same storage URL scheme as [[Restructure.screenshotUrl]] — a
  * workflow run therefore round-trips with [[Enrichment.classify]] as
  * `current`. Batches run sequentially like the reference's single browser
  * session; per-item artifacts are small by construction (BatchSink note).
  */
object ScreenshotWorkflow {

  final case class Item(subject: String, year: Int, url: String)

  final case class ItemResult(subject: String, year: Int, url: String,
                              capture_attempts: Int, capture_ok: Boolean,
                              upload_attempts: Int, upload_ok: Boolean,
                              enriched: Boolean, screenshot_url: String,
                              ok: Boolean)

  /** The minted storage URL — string twin of [[Restructure.screenshotUrl]]
    * (folder scheme + pinned-epoch cache buster,
    * screenshot_storage_service.py:106-198).
    */
  def mintUrl(subject: String, year: Int): String =
    s"https://ik.imagekit.io/graft/screenshots/$subject/$year/" +
      s"${subject}_$year.png?updatedAt=${Restructure.PinnedMillis}"

  /** Deterministic capture stand-in: "writes" the temp screenshot path the
    * reference would (`{subject}_{year}_{ts}.png`, pinned clock).
    */
  def captureStub(item: Item): String =
    s"temp_screenshots/${item.subject}_${item.year}_20250101_000000.png"

  /** process_url: the three stages with the reference's retry budgets.
    * Returns per-stage attempt counts — a failed stage short-circuits the
    * rest exactly like the reference (capture fail → no upload; upload fail
    * → no enrichment, `screenshot_workflow.py:137-147,160-166`).
    */
  def processUrl(item: Item, outDir: String,
                 capture: Item => String = captureStub,
                 upload: (Item, String) => String = (i, _) => mintUrl(i.subject, i.year),
                 sleeper: Long => Unit = _ => ()): ItemResult = {
    val cap = Retry.withFixedDelay(maxAttempts = 3, delayMs = 2000L,
      sleeper = sleeper)(capture(item))
    if (cap.value.isEmpty)
      return ItemResult(item.subject, item.year, item.url,
        cap.attempts, capture_ok = false, 0, upload_ok = false,
        enriched = false, null, ok = false)
    val up = Retry.withBackoff(maxAttempts = 3, delayMs = 1000L,
      sleeper = sleeper)(upload(item, cap.value.get))
    if (up.value.isEmpty)
      return ItemResult(item.subject, item.year, item.url,
        cap.attempts, capture_ok = true, up.attempts, upload_ok = false,
        enriched = false, null, ok = false)
    val name = s"${item.subject}_${item.year}"
    val dir = s"$outDir/$name"
    def ifExists(p: String) =
      Option(p).filter(x => java.nio.file.Files.exists(java.nio.file.Paths.get(x)))
    val enriched = Enrichment.enrichFiles(
      ifExists(s"$dir/$name.json"), ifExists(s"$dir/$name.csv"),
      ifExists(s"$dir/${name}_metadata.json"), up.value.get, createBackup = true)
    // reference: enrichment failure is logged but the workflow still returns
    // the screenshot url (screenshot_workflow.py:170-176)
    ItemResult(item.subject, item.year, item.url,
      cap.attempts, capture_ok = true, up.attempts, upload_ok = true,
      enriched = enriched, up.value.get, ok = true)
  }

  /** process_batch: sequential per-item workflow, per-item result rows. */
  def processBatch(spark: SparkSession, items: Seq[Item], outDir: String,
                   capture: Item => String = captureStub,
                   upload: (Item, String) => String = (i, _) => mintUrl(i.subject, i.year),
                   sleeper: Long => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    items.map(processUrl(_, outDir, capture, upload, sleeper)).toDF()
  }

  /** A7: the batch tally — "Batch processing complete: X/Y successful"
    * (screenshot_workflow.py:294-296) plus per-stage attempt totals.
    */
  def batchTally(results: DataFrame): DataFrame =
    results.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("successful"),
      sum(when(!col("ok"), 1L).otherwise(0L)).as("failed"),
      sum(col("capture_attempts")).as("capture_attempts"),
      sum(col("upload_attempts")).as("upload_attempts"),
      sum(when(col("enriched"), 1L).otherwise(0L)).as("enriched_batches"))
}
