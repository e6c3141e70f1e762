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
                              ok: Boolean, skipped: Boolean = false,
                              skip_reason: String = null)

  /** Screenshot/upload configuration with the reference's validation rules
    * (`/root/reference/config/screenshot_config.py:16-197`): browser
    * whitelist, positive viewport/timeout, quality bounds, and the
    * credentials-present check. `load_config` semantics: an enabled-but-
    * invalid config is demoted to disabled (with the errors as the reason)
    * rather than failing the run — [[processBatch]] then short-circuits every
    * item to a `skipped` row.
    */
  final case class ScreenshotConfig(
      enabled: Boolean = true,
      browserType: String = "chromium",
      viewportWidth: Int = 1920,
      viewportHeight: Int = 1080,
      timeoutMs: Int = 60000,
      screenshotFormat: String = "png",
      quality: Int = 90,
      publicKey: Option[String] = Some("pk_offline"),
      privateKey: Option[String] = Some("sk_offline"),
      urlEndpoint: Option[String] = Some("https://ik.imagekit.io/graft"),
      pdfQuality: Int = 95) {

    /** Validation errors, empty when valid (screenshot_config.py:116-152).
      * Only an *enabled* config validates — a disabled one is vacuously ok.
      */
    def validationErrors: Seq[String] = if (!enabled) Seq.empty else {
      val errs = Seq.newBuilder[String]
      val missing = Seq("IMAGEKIT_PUBLIC_KEY" -> publicKey,
        "IMAGEKIT_PRIVATE_KEY" -> privateKey,
        "IMAGEKIT_URL_ENDPOINT" -> urlEndpoint)
        .collect { case (n, None) => n }
      if (missing.nonEmpty)
        errs += s"Missing required environment variables: ${missing.mkString(", ")}"
      if (!Seq("chromium", "firefox", "webkit").contains(browserType))
        errs += s"Invalid browser type: $browserType"
      if (viewportWidth <= 0 || viewportHeight <= 0)
        errs += "Viewport dimensions must be positive integers"
      if (timeoutMs <= 0) errs += "Timeout must be a positive integer"
      if (pdfQuality < 1 || pdfQuality > 100)
        errs += "PDF quality must be between 1 and 100"
      errs.result()
    }

    /** `load_config`: validation failure on an enabled config disables it. */
    def effective: ScreenshotConfig =
      if (enabled && validationErrors.nonEmpty) copy(enabled = false) else this
  }

  object ScreenshotConfig {
    /** `from_env` twin over an injectable env map (the sandbox has no real
      * credentials; the parse/default rules are the reference's).
      */
    def fromEnv(env: Map[String, String]): ScreenshotConfig = ScreenshotConfig(
      enabled = env.getOrElse("SCREENSHOT_ENABLED", "true").toLowerCase == "true",
      browserType = env.getOrElse("PLAYWRIGHT_BROWSER", "chromium"),
      viewportWidth = env.getOrElse("PLAYWRIGHT_VIEWPORT_WIDTH", "1920").toInt,
      viewportHeight = env.getOrElse("PLAYWRIGHT_VIEWPORT_HEIGHT", "1080").toInt,
      timeoutMs = env.getOrElse("PLAYWRIGHT_TIMEOUT", "60000").toInt,
      screenshotFormat = env.getOrElse("PLAYWRIGHT_SCREENSHOT_FORMAT", "png"),
      quality = env.getOrElse("PLAYWRIGHT_QUALITY", "90").toInt,
      publicKey = env.get("IMAGEKIT_PUBLIC_KEY"),
      privateKey = env.get("IMAGEKIT_PRIVATE_KEY"),
      urlEndpoint = env.get("IMAGEKIT_URL_ENDPOINT"),
      pdfQuality = env.getOrElse("PDF_QUALITY", "95").toInt)
  }

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
    val artifacts = Seq(ifExists(s"$dir/$name.json"), ifExists(s"$dir/$name.csv"),
      ifExists(s"$dir/${name}_metadata.json"))
    // enriched=true requires at least one artifact actually enriched —
    // enrich_files over three absent files is vacuously true and would
    // overstate the A7 tally (ADVICE r02)
    val enriched = artifacts.exists(_.isDefined) &&
      Enrichment.enrichFiles(artifacts(0), artifacts(1), artifacts(2),
        up.value.get, createBackup = true)
    // reference: enrichment failure is logged but the workflow still returns
    // the screenshot url (screenshot_workflow.py:170-176)
    ItemResult(item.subject, item.year, item.url,
      cap.attempts, capture_ok = true, up.attempts, upload_ok = true,
      enriched = enriched, up.value.get, ok = true)
  }

  /** `skipped` row: the workflow was disabled (explicitly or by validation
    * demotion) before any stage ran — config gate, screenshot_config.py's
    * load_config + the service's enabled check.
    */
  private def skippedResult(item: Item, reason: String): ItemResult =
    ItemResult(item.subject, item.year, item.url,
      0, capture_ok = false, 0, upload_ok = false,
      enriched = false, null, ok = false, skipped = true, skip_reason = reason)

  /** process_batch: sequential per-item workflow, per-item result rows.
    * A disabled/invalid config short-circuits every item to a skipped row
    * with the validation errors as the reason.
    */
  def processBatch(spark: SparkSession, items: Seq[Item], outDir: String,
                   capture: Item => String = captureStub,
                   upload: (Item, String) => String = (i, _) => mintUrl(i.subject, i.year),
                   sleeper: Long => Unit = _ => (),
                   config: ScreenshotConfig = ScreenshotConfig()): DataFrame = {
    import spark.implicits._
    val cfg = config.effective
    if (!cfg.enabled) {
      val reason =
        if (config.enabled) config.validationErrors.mkString("; ")
        else "screenshot functionality disabled"
      items.map(skippedResult(_, reason)).toDF()
    } else items.map(processUrl(_, outDir, capture, upload, sleeper)).toDF()
  }

  /** A7: the batch tally — "Batch processing complete: X/Y successful"
    * (screenshot_workflow.py:294-296) plus per-stage attempt totals.
    */
  def batchTally(results: DataFrame): DataFrame =
    results.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("successful"),
      sum(when(!col("ok"), 1L).otherwise(0L)).as("failed"),
      sum(when(col("skipped"), 1L).otherwise(0L)).as("skipped_items"),
      sum(col("capture_attempts")).as("capture_attempts"),
      sum(col("upload_attempts")).as("upload_attempts"),
      sum(when(col("enriched"), 1L).otherwise(0L)).as("enriched_batches"))
}
