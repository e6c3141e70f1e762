package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser
import graft.operators.{Politeness, SeenSet}
import graft.plans.SnapshotTable
import graft.sources.PagesGen

/** The wave-loop crawl engine (SURVEY §2.8 P5, §3.1, §4 hot path).
  *
  * Each wave is one Spark job over snapshot tables:
  *
  *   frontier ──dedup(bloom → confirm)──▶ fresh ──robots+budget──▶ fetchNow
  *     fetchNow ⋈ pages (broadcast the wave: pages NEVER shuffle) ──▶ fetched
  *     fetched ──parse (one UDF pass)──▶ questions ⊕ discovered links
  *     commit: frontier' = deferred ∪ links, seen += fetchNow, fetchlog,
  *             lineage, questions  (atomic manifest renames → resumable)
  *
  * Determinism: no wall clock (discovery_ts := parent warc_ts), no
  * monotonically_increasing_id, ordering fully keyed by
  * (priority, depth, discovery_ts, url) — the same crawl at local[8] and
  * local[32] yields identical fetchlog traces and seen-set digests
  * (CrawlEngineSpec asserts this).
  *
  * Scale notes (100 TB / 10^10 urls): the per-wave frontier slice is always
  * ≪ pages, so the fetch join broadcasts the wave and streams pages —
  * zero shuffle of the big table. Dedup shuffles only bloom-suspects.
  * Politeness ranks via salted two-phase top-k (hot-host skew, P8).
  * All state tables are partitioned by wave for pruning.
  */
object CrawlEngine {

  final case class Config(
      waveDurationMs: Long = 60000L,
      saltBuckets: Int = 16,
      cuckooShards: Int = 32,
      cuckooPerShardCapacity: Long = 1L << 20,
      bloomExpected: Long = 1L << 22,
      bloomFpp: Double = 0.01,
      strategy: SeenSet.Strategy = SeenSet.BloomExact,
      maxWaves: Int = 64,
      parseQuestions: Boolean = true)

  final case class Result(waves: Int, fetched: Long, deduped: Long,
                          errors: Long, seenCount: Long, seenDigest: Long)

  private def frontierCols = Seq("url", "url_hash", "host", "priority",
    "depth", "discovery_ts", "seed_subject", "seed_year")

  /** Seeds → initial frontier (priority 0, depth 0, discovery_ts = epoch). */
  def seedFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    val seeds = PagesGen.seeds(spark, sfDir).toDF()
    seeds
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)/", 1))
      .withColumn("priority", lit(0))
      .withColumn("depth", lit(0))
      .withColumn("discovery_ts", lit(new java.sql.Timestamp(PagesGen.Epoch * 1000L)))
      .withColumnRenamed("subject", "seed_subject")
      .withColumnRenamed("year", "seed_year")
      .select(frontierCols.map(col): _*)
  }

  /** Resolve an href against the page url (absolute, root-relative, or
    * sibling-relative) — Scrapy's `response.follow` (core/main.py:114).
    */
  private val resolveHref = udf((base: String, href: String) => {
    if (href == null) null
    else if (href.startsWith("http://") || href.startsWith("https://")) href
    else if (href.startsWith("/")) {
      val i = base.indexOf('/', base.indexOf("//") + 2)
      (if (i < 0) base else base.substring(0, i)) + href
    } else base.substring(0, base.lastIndexOf('/') + 1) + href
  })

  private val parsePageUdf = udf((html: Array[Byte]) => QuestionParser.parsePage(html))

  def run(spark: SparkSession, sfDir: String, storeRoot: String,
          cfg: Config = Config()): Result = {
    import spark.implicits._

    val frontierT = new SnapshotTable(spark, storeRoot, "frontier")
    val seenT = new SnapshotTable(spark, storeRoot, "seen")
    val fetchlogT = new SnapshotTable(spark, storeRoot, "fetchlog")
    val lineageT = new SnapshotTable(spark, storeRoot, "lineage")
    val questionsT = new SnapshotTable(spark, storeRoot, "questions")
    val cuckooT = new SnapshotTable(spark, storeRoot, "seen_cuckoo")

    // pages staged once per store (stand-in for the live web / WARC store)
    val pagesPath = s"$storeRoot/pages"
    val pagesFs = new org.apache.hadoop.fs.Path(pagesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!pagesFs.exists(new org.apache.hadoop.fs.Path(pagesPath, "_SUCCESS")))
      PagesGen.pages(spark, sfDir).toDF()
        .write.mode(SaveMode.Overwrite).parquet(pagesPath)
    val pages = spark.read.parquet(pagesPath)

    val robots = Politeness.robotsFixture(spark).toDF()

    // resume: the latest committed frontier IS the next wave to process
    // (wave replay after a mid-wave crash is idempotent: data dirs are
    // overwritten, manifests dedup directory entries, bloom re-adds are
    // no-ops) — or bootstrap from seeds.
    val startWave = frontierT.meta.get("wave").map(_.toInt).getOrElse {
      frontierT.commit(seedFrontier(spark, sfDir), 0, append = false)
      0
    }
    val bloom = SeenSet.Bloom.load(spark, s"$storeRoot/bloom")
      .map(_._2).getOrElse(new SeenSet.Bloom(cfg.bloomExpected, cfg.bloomFpp))

    var wave = startWave
    var done = false
    while (!done && wave < cfg.maxWaves) {
      if (frontierT.isEmpty) { done = true }
      else {
        val frontier = frontierT.read().select(frontierCols.map(col): _*).cache()
        val nCandidates = frontier.count()
        if (nCandidates == 0) { done = true }
        else {
          // ---- dedup tier (J4/U3) ----
          val fresh: DataFrame = cfg.strategy match {
            case SeenSet.ExactAnti =>
              val seenLog = if (seenT.isEmpty) spark.emptyDataset[Long].toDF("url_hash")
                            else seenT.read()
              SeenSet.exactFresh(frontier, seenLog)
            case SeenSet.BloomExact =>
              val (defNew, suspects) = SeenSet.bloomSplit(spark, frontier, bloom)
              val seenLog = if (seenT.isEmpty) spark.emptyDataset[Long].toDF("url_hash")
                            else seenT.read()
              defNew.unionByName(SeenSet.exactFresh(suspects, seenLog))
            case SeenSet.BloomCuckoo =>
              val (defNew, suspects) = SeenSet.bloomSplit(spark, frontier, bloom)
              defNew.unionByName(
                SeenSet.cuckooFresh(spark, suspects, cuckooT, cfg.cuckooShards))
          }
          val freshC = fresh.cache()
          val nFresh = freshC.count()
          val nDeduped = nCandidates - nFresh

          // ---- politeness (J6, O6, P1-P3) ----
          val b = Politeness.budgetTopK(freshC, robots, cfg.waveDurationMs, cfg.saltBuckets)
          val fetchNow = b.fetchNow.cache()
          val nAttempt = fetchNow.count()
          val nBlocked = b.blocked.count()

          // ---- fetch (J5): broadcast the wave, stream the pages table ----
          val fetched = broadcast(fetchNow)
            .join(pages, Seq("url"), "left")
            .withColumn("status",
              when(col("html").isNotNull, lit("ok")).otherwise(lit("error")))
            .cache()
          val ok = fetched.filter(col("status") === "ok")
          val nErrors = fetched.filter(col("status") === "error").count()
          val nFetched = nAttempt - nErrors

          // ---- parse once (extract text, questions, links) ----
          val parsed = ok
            .withColumn("parsed", parsePageUdf(col("html")))
            .select(col("url"), col("host"), col("depth"), col("seed_subject"),
              col("seed_year"), col("warc_ts"), col("host_rank"),
              col("parsed.questions").as("questions"),
              col("parsed.next").as("next"))
            .cache()

          if (cfg.parseQuestions) {
            val questions = parsed
              .select(col("url"), col("seed_subject"), col("seed_year"),
                posexplode_outer(col("questions")).as(Seq("pos", "q")))
              .filter(col("q").isNotNull)
              .select(col("url"), col("seed_subject"), col("seed_year"), col("pos"),
                col("q.section"), col("q.qtype"), col("q.number"), col("q.question"),
                col("q.options"), col("q.subparts"), col("q.diagrams"),
                col("q.answer"), col("q.solution"))
            questionsT.commit(questions, wave)
          }

          // ---- fetch log (ordering trace: FIXTURES §4) ----
          fetchlogT.commit(
            fetched.select(col("url"), col("url_hash"), col("host"),
              col("host_rank"), col("status"), col("depth"),
              col("seed_subject"), col("seed_year"), lit(wave).as("wave")),
            wave)

          // ---- discovered links → next frontier candidates (S4) ----
          val discovered = parsed
            .filter(col("next").isNotNull)
            .withColumn("durl", resolveHref(col("url"), col("next")))
            .select(
              col("durl").as("url"),
              xxhash64(col("durl")).as("url_hash"),
              regexp_extract(col("durl"), "https?://([^/]+)/", 1).as("host"),
              (col("depth") + 1).as("priority"),
              (col("depth") + 1).as("depth"),
              col("warc_ts").as("discovery_ts"),
              col("seed_subject"), col("seed_year"))
          // in-wave dedup: deterministic min-tuple per url
          val newCands = discovered
            .groupBy("url", "url_hash")
            .agg(min(struct(col("priority"), col("depth"), col("discovery_ts"),
              col("seed_subject"), col("seed_year"))).as("m"))
            .select(col("url"), col("url_hash"), col("m.priority"), col("m.depth"),
              col("m.discovery_ts"), col("m.seed_subject"), col("m.seed_year"))
            .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)/", 1))
            .select(frontierCols.map(col): _*)

          // ---- seen insert (attempted urls — Scrapy marks on request) ----
          val newHashes = fetchNow.select(col("url_hash"), col("url"))
          seenT.commit(newHashes, wave)
          bloom.addWave(newHashes.select("url_hash").as[Long].collect())
          bloom.save(spark, s"$storeRoot/bloom", wave)
          if (cfg.strategy == SeenSet.BloomCuckoo)
            SeenSet.cuckooInsert(spark, newHashes.select("url_hash").as[Long],
              cuckooT, cfg.cuckooShards, cfg.cuckooPerShardCapacity, wave)

          // ---- lineage (A8): per wave × host-bucket × task partition ----
          val hostBucket = pmod(xxhash64(col("host")), lit(8)).cast("int")
          val perBucket = fetched
            .withColumn("host_bucket", hostBucket)
            .withColumn("partition_id", spark_partition_id())
            .groupBy("host_bucket", "partition_id")
            .agg(count(lit(1)).as("attempted"),
              sum(when(col("status") === "ok", 1L).otherwise(0L)).as("fetched"),
              sum(when(col("status") === "error", 1L).otherwise(0L)).as("errors"))
          // wave-summary row (bucket -1): waves whose candidates were all
          // dedup-dropped still record their counts
          val summary = spark.range(1).select(
            lit(-1).cast("int").as("host_bucket"),
            lit(-1).cast("int").as("partition_id"),
            lit(0L).as("attempted"), lit(0L).as("fetched"), lit(0L).as("errors"))
          val lineage = perBucket.unionByName(summary)
            .withColumn("wave", lit(wave))
            .withColumn("deduped_in_wave", lit(nDeduped))
            .withColumn("blocked_in_wave", lit(nBlocked))
            .withColumn("candidates_in_wave", lit(nCandidates))
          lineageT.commit(lineage, wave)

          // ---- next frontier: deferred ∪ discovered (dedup within) ----
          val nextFrontier = b.deferred.select(frontierCols.map(col): _*)
            .unionByName(newCands)
            .groupBy("url", "url_hash")
            .agg(min(struct(col("priority"), col("depth"), col("discovery_ts"),
              col("seed_subject"), col("seed_year"))).as("m"),
              first(col("host")).as("host"))
            .select(col("url"), col("url_hash"), col("host"), col("m.priority"),
              col("m.depth"), col("m.discovery_ts"), col("m.seed_subject"),
              col("m.seed_year"))
          val nextF = nextFrontier.select(frontierCols.map(col): _*).cache()
          if (nextF.count() == 0)
            frontierT.commitEmpty(wave + 1)
          else
            frontierT.commit(nextF, wave + 1, append = false)
          nextF.unpersist()

          frontier.unpersist(); freshC.unpersist(); fetchNow.unpersist()
          fetched.unpersist(); parsed.unpersist()
          wave += 1
        }
      }
    }

    val seen = if (seenT.isEmpty) spark.emptyDataset[Long].toDF("url") else seenT.read()
    val (cnt, dig) = SeenSet.digest(seen)
    val logs = if (fetchlogT.isEmpty) null else fetchlogT.read()
    val fetchedTotal = if (logs == null) 0L
      else logs.filter(col("status") === "ok").count()
    val errTotal = if (logs == null) 0L
      else logs.filter(col("status") === "error").count()
    val dedupTotal = if (lineageT.isEmpty) 0L
      else {
        val r = lineageT.read().groupBy("wave")
          .agg(first("deduped_in_wave").as("d"))
          .agg(sum("d")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    Result(wave, fetchedTotal, dedupTotal, errTotal, cnt, dig)
  }

  /** Deterministic global ordering trace (FIXTURES §4): one row per fetched
    * url with its emit sequence — (wave, host, host_rank) is a total order
    * given per-host sequential fetch. Digest is order-sensitive.
    */
  def orderingTrace(spark: SparkSession, storeRoot: String): DataFrame = {
    val logs = new SnapshotTable(spark, storeRoot, "fetchlog").read()
    logs.select(col("wave"), col("host"), col("host_rank"), col("url"), col("status"))
      .orderBy(col("wave"), col("host"), col("host_rank"))
  }

  /** Order-sensitive (rank-keyed) trace digest — bit_xor of position-salted
    * hashes (ANSI-safe, partition-order independent).
    */
  def traceDigest(spark: SparkSession, storeRoot: String): Long = {
    val t = orderingTrace(spark, storeRoot)
    val r = t.select(xxhash64(concat_ws("|",
        col("wave"), col("host"), col("host_rank"), col("url"))).as("h"))
      .agg(expr("bit_xor(h)")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
