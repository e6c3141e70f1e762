package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness gate + per-host fetch budget (SURVEY §2.8 P1-P3, O6, J6).
  *
  * The reference throttles with `DOWNLOAD_DELAY=2`, `CONCURRENT_REQUESTS=1`,
  * `ROBOTSTXT_OBEY=True` (`/root/reference/run_spider.py:199-202`). At wave
  * granularity that becomes: per host, at most
  * `budget = max(1, waveDurationMs / crawlDelayMs)` urls per wave, taken in
  * deterministic priority order `(priority, depth, discovery_ts, url)`
  * (BASELINE.json:6); robots-disallowed hosts are blocked outright via a
  * broadcast map join (robots tables are per-host → tiny vs the frontier).
  *
  * Skew (P8): a hot host would funnel its whole frontier slice through one
  * window partition. The rank is computed in two phases — phase 1 ranks
  * within `(host, salt)` (salt = pmod(xxhash64(url), S)) and keeps only the
  * per-salt top-budget, an exact superset of the global per-host top-budget;
  * phase 2 ranks the ≤ S·budget survivors per host exactly. Result is
  * identical to a single-phase rank but the heavy sort fans out S-wide.
  */
object Politeness {

  final case class RobotsRow(host: String, fetched_ts: java.sql.Timestamp,
                             allowed: Boolean, crawl_delay_ms: Long)

  /** Deterministic robots fixture for generated hosts (FIXTURES.md §3):
    * hot host h0 keeps the reference's 2000 ms delay; h13 is disallowed;
    * everything else 1000 ms.
    */
  def robotsFixture(spark: SparkSession): Dataset[RobotsRow] = {
    import spark.implicits._
    val ts = new java.sql.Timestamp(graft.sources.PagesGen.Epoch * 1000L)
    (0 to 31).map { id =>
      RobotsRow(s"h$id.example.test", ts, allowed = id != 13,
        if (id == 0) 2000L else 1000L)
    }.toDS()
  }

  final case class Budgeted(fetchNow: DataFrame, deferred: DataFrame,
                            blocked: DataFrame)

  /** One-pass disposition tagging for the wave loop: every candidate row is
    * returned exactly once with `disp` ∈ {seen, blocked, deferred, fetch}
    * and `host_rank` (fetch rows: 1-based deterministic fetch position;
    * 0 otherwise). Input must carry `is_seen`; only !is_seen ∧ allowed rows
    * enter the salted two-phase rank (same exactness argument as budgetTopK).
    */
  def disposition(flagged: DataFrame, robots: DataFrame, waveDurationMs: Long,
                  saltBuckets: Int = 16): DataFrame = {
    // localCheckpoint: four disposition branches (closed/under/over ×2 phases)
    // would otherwise each re-evaluate the whole upstream dedup-flag subtree
    // (scan + bloom UDF + confirm join) — measured ~4 recomputations of a
    // 1M-row wave inside the rank+count phase. One materialization, lineage
    // truncated, branches read blocks.
    val joined = flagged.join(
      broadcast(robots.select(col("host"), col("allowed"), col("crawl_delay_ms"))),
      Seq("host"), "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(2000L)))
      .withColumn("budget",
        greatest(lit(1L), lit(waveDurationMs) / col("crawl_delay_ms")).cast("long"))
      .localCheckpoint()

    val closed = joined.filter(col("is_seen") || !col("allowed"))
      .withColumn("disp", when(col("is_seen"), lit("seen")).otherwise(lit("blocked")))
      .withColumn("host_rank", lit(0))
    val open = joined.filter(!col("is_seen") && col("allowed"))

    // Skew shield #1: hosts whose whole slice fits the budget skip ranking
    // entirely (host_rank 0 — the trace orders those rows by their sort key,
    // which is equivalent and partition-count independent). A per-host window
    // here would funnel a hot host's slice through one task for no reason.
    val hostCounts = open.groupBy(col("host")).agg(count(lit(1)).as("host_n"))
    val withN = open.join(hostCounts, Seq("host"), "left")
    val under = withN.filter(col("host_n") <= col("budget"))
      .withColumn("disp", lit("fetch")).withColumn("host_rank", lit(0))
      .drop("host_n")
    val over = withN.filter(col("host_n") > col("budget")).drop("host_n")

    // Skew shield #2 (over-budget hosts only): salted two-phase exact top-k —
    // phase 1 keeps per-(host, salt) top-budget (superset of the global
    // per-host top-budget), phase 2 ranks the ≤ salt·budget survivors.
    val ord = Seq(col("priority"), col("depth"), col("discovery_ts"), col("url"))
    val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(ord: _*)
    val phase1 = over
      .withColumn("salt", pmod(xxhash64(col("url")), lit(saltBuckets)))
      .withColumn("r1", row_number().over(w1))
    val cut1 = phase1.filter(col("r1") > col("budget"))
      .withColumn("disp", lit("deferred")).withColumn("host_rank", lit(0))
    val w2 = Window.partitionBy(col("host")).orderBy(ord: _*)
    val phase2 = phase1.filter(col("r1") <= col("budget"))
      .withColumn("host_rank", row_number().over(w2))
      .withColumn("disp",
        when(col("host_rank") <= col("budget"), lit("fetch")).otherwise(lit("deferred")))
      .withColumn("host_rank",
        when(col("disp") === "fetch", col("host_rank")).otherwise(lit(0)))

    phase2.drop("salt", "r1")
      .unionByName(cut1.drop("salt", "r1"))
      .unionByName(under)
      .unionByName(closed)
      .drop("allowed", "crawl_delay_ms", "budget", "is_seen")
  }

  /** Split the deduped frontier into (fetchNow ranked per host, deferred to
    * next wave, robots-blocked). `frontier` needs `url` and `host` columns;
    * ordering columns `priority, depth, discovery_ts` must be present.
    * `fetchNow` gains `host_rank` (1-based fetch position within host+wave —
    * the deterministic ordering-trace key).
    */
  def budgetTopK(frontier: DataFrame, robots: DataFrame, waveDurationMs: Long,
                 saltBuckets: Int = 16): Budgeted = {
    val joined = frontier.join(
      broadcast(robots.select(col("host"), col("allowed"), col("crawl_delay_ms"))),
      Seq("host"), "left")
    // unknown host → reference default: allowed, DOWNLOAD_DELAY=2s
    val gated = joined
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(2000L)))
      .withColumn("budget",
        greatest(lit(1L), lit(waveDurationMs) / col("crawl_delay_ms")).cast("long"))
    val blocked = gated.filter(!col("allowed"))
      .drop("allowed", "crawl_delay_ms", "budget")
    val open = gated.filter(col("allowed"))

    val ord = Seq(col("priority"), col("depth"), col("discovery_ts"), col("url"))
    val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(ord: _*)
    val phase1 = open
      .withColumn("salt", pmod(xxhash64(col("url")), lit(saltBuckets)))
      .withColumn("r1", row_number().over(w1))
    val survivors = phase1.filter(col("r1") <= col("budget"))
    val cut1 = phase1.filter(col("r1") > col("budget"))

    val w2 = Window.partitionBy(col("host")).orderBy(ord: _*)
    val phase2 = survivors.withColumn("host_rank", row_number().over(w2))
    val fetchNow = phase2.filter(col("host_rank") <= col("budget"))
      .drop("salt", "r1", "allowed", "crawl_delay_ms", "budget")
    val cut2 = phase2.filter(col("host_rank") > col("budget")).drop("host_rank")

    val deferred = cut1.unionByName(cut2)
      .drop("salt", "r1", "allowed", "crawl_delay_ms", "budget")
    Budgeted(fetchNow, deferred, blocked)
  }
}
