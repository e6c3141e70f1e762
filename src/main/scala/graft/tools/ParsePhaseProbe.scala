package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser

/** Attribute the crawl's parse-phase cost over the staged bench corpus.
  *
  * The instrumented wave table (BASELINE.md round-5) shows the crawl's parse
  * phase running 1M pages in 22-30 s at 32 threads while the bare scan+parse
  * ceiling does the same pages in ~10 s — this probe decomposes that gap into
  * additive variants, each the previous plus one engine mechanism:
  *
  *   plain      scan pages parquet -> parse -> agg        (the ceiling shape)
  *   bucketed   scan the 64-bucket sorted table -> parse -> agg
  *   join       frontier-shaped wave (parquet) join bucketed -> parse -> agg
  *   joincache  join -> parse -> .cache().count()         (the engine shape)
  *
  * Usage: ParsePhaseProbe <stageBase> [cpus=32] [reps=2]
  * where <stageBase> holds pages/ and pages_bucketed/ from CrawlOnce staging.
  */
object ParsePhaseProbe {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-parse-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = session(cpus)
    graft.plans.BucketedTable.register(spark, s"$base/pages_bucketed",
      "graft_pages", graft.plans.BucketedTable.PagesDdl, "url", 64)
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))

    // frontier-shaped wave side, staged once as parquet (the engine reads its
    // wave from frontier parquet dirs, so the probe's wave side scans too)
    val waveDir = s"$base/probe_wave"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(waveDir)))
      spark.table("graft_pages").select(col("url"))
        .withColumn("url_hash", xxhash64(col("url")))
        .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)/", 1))
        .withColumn("priority", lit(0)).withColumn("depth", lit(0))
        .withColumn("discovery_ts", current_timestamp())
        .withColumn("seed_subject", lit("s")).withColumn("seed_year", lit(2020))
        .withColumn("host_rank", lit(0))
        .write.mode("overwrite").parquet(waveDir)

    def parsed(src: DataFrame): DataFrame =
      src.withColumn("p", parse(col("html"))).drop("html")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[probe $name] ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val wave = spark.read.parquet(waveDir)
    def joined = wave.join(
      spark.table("graft_pages").select(col("url"), col("warc_ts"), col("html"))
        .filter(col("html").isNotNull), Seq("url"), "inner")

    (1 to reps).foreach { r =>
      System.err.println(s"-- rep $r")
      timed("plain") {
        parsed(spark.read.parquet(s"$base/pages")).agg(
          sum(size(col("p.questions")))).head().getLong(0) }
      timed("bucketed") {
        parsed(spark.table("graft_pages")).agg(
          sum(size(col("p.questions")))).head().getLong(0) }
      timed("join") {
        parsed(joined).agg(sum(size(col("p.questions")))).head().getLong(0) }
      timed("joincache") {
        val df = parsed(joined).cache()
        val n = df.count()
        df.unpersist(blocking = true)
        n }
    }
    spark.stop()
  }
}
