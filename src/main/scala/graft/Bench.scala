package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser
import graft.operators.SeenSet

/** Benchmark main (driver contract: ONE JSON line on stdout).
  *
  * Three parts:
  *  1. operator queries timed at `local[$SPARK_GRAFT_CPUS]` on
  *     `$SPARK_GRAFT_SF_DIR`;
  *  2. the north-rule scaling protocol (BASELINE.md): the SAME amplified
  *     crawl at local[8] and local[32] — identical input, digest-checked
  *     identical output — urls/sec at both, efficiency = (thr32/thr8)/4,
  *     best-of-REPS to tame sandbox variance. Politeness budgets are set
  *     high so per-wave work dominates (the politeness ceiling is a semantic
  *     constant — ~0.5 url/s/host in the reference, run_spider.py:199-201 —
  *     not an engine property).
  *  3. a CPU-scaling ceiling probe: the map-only extraction job (scan →
  *     parse → agg, no meaningful shuffle) at both levels. On this
  *     single-JVM sandbox even embarrassingly parallel CPU work does not get
  *     4× from 4× threads (memory bandwidth + hypervisor sharing), so the
  *     ceiling contextualizes the crawl number:
  *     `scaling_efficiency_vs_ceiling = crawl_speedup / ceiling_speedup`.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Stage the amplified pages corpus once (untimed, shared by all runs). */
  private def stagePages(sfDir: String, amplify: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-pages").toString + "/pages"
    val spark = session(32)
    graft.sources.PagesGen.pages(spark, sfDir, amplify).toDF()
      .write.mode("overwrite").parquet(dir)
    spark.stop()
    dir
  }

  private def crawlAt(cpus: Int, sfDir: String, amplify: Int,
                      pagesDir: String): (Double, Long, Long) = {
    val spark = session(cpus)
    val store = java.nio.file.Files.createTempDirectory(s"graft-bench-$cpus").toString
    val cfg = CrawlEngine.Config(
      waveDurationMs = 4000000000L, // budget >= any per-host slice: no deferral tail in the timed region
      strategy = SeenSet.BloomExact,
      parseQuestions = true,
      amplify = amplify,
      pagesPath = Some(pagesDir))
    val t0 = System.nanoTime()
    val r = CrawlEngine.run(spark, sfDir, store, cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (sec, r.fetched + r.deduped, r.seenDigest)
  }

  private def extractAt(cpus: Int, pagesDir: String): (Double, Long) = {
    val spark = session(cpus)
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    val t0 = System.nanoTime()
    val n = spark.read.parquet(pagesDir)
      .select(parse(col("html")).as("p"))
      .agg(count(lit(1)), sum(size(col("p.questions")))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (sec, n)
  }

  private def round2(x: Double): Double = (x * 100).round / 100.0
  private def round3(x: Double): Double = (x * 1000).round / 1000.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "800").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")

    // part 1: operator queries
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    var extra = ""
    if (!skipScaling) {
      val pagesDir = stagePages(sfDir, amplify)
      // warm the page cache + JIT with one extract pass, then measure
      extractAt(32, pagesDir)
      val (ce8, _) = (1 to reps).map(_ => extractAt(8, pagesDir)).minBy(_._1)
      val (ce32, np) = (1 to reps).map(_ => extractAt(32, pagesDir)).minBy(_._1)
      val (c8, work8, dig8) =
        (1 to reps).map(_ => crawlAt(8, sfDir, amplify, pagesDir)).minBy(_._1)
      val (c32, work32, dig32) =
        (1 to reps).map(_ => crawlAt(32, sfDir, amplify, pagesDir)).minBy(_._1)
      val thr8 = work8 / c8
      val thr32 = work32 / c32
      val crawlSpeedup = thr32 / thr8
      val ceilingSpeedup = ce8 / ce32
      extra = f""","crawl_urls_per_sec_8":${round2(thr8)},"crawl_urls_per_sec_32":${round2(thr32)},"scaling_efficiency":${round3(crawlSpeedup / 4.0)},"cpu_ceiling_speedup_8_to_32":${round3(ceilingSpeedup)},"scaling_efficiency_vs_ceiling":${round3(crawlSpeedup / ceilingSpeedup)},"extract_pages_per_sec_32":${round2(np / ce32)},"scaling_digests_equal":${dig8 == dig32},"amplify":$amplify"""
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$extra}""")
  }
}
