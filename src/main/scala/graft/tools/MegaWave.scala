package graft.tools

import org.apache.spark.sql.SparkSession
import graft.CrawlEngine
import graft.operators.SeenSet

/** Steady-state scaling probe: ONE wave over an amplified frontier —
  * the shape of a production wave at 10^10 scale (millions of urls/wave,
  * commit barriers amortized). Shares a pre-staged pages dir across runs.
  */
object MegaWave {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val amplify = args(2).toInt
    val pagesDir = s"/tmp/graft-megapages-$amplify/pages"

    def session(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .appName(s"megawave-$c")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    // stage once (untimed; reused across invocations)
    if (!new java.io.File(s"$pagesDir/_SUCCESS").exists()) {
      val s = session(32)
      graft.sources.PagesGen.pages(s, sfDir, amplify).toDF()
        .write.mode("overwrite").parquet(pagesDir)
      s.stop()
    }
    val spark = session(cpus)
    val store = java.nio.file.Files.createTempDirectory(s"graft-mega-$cpus").toString
    val cfg = CrawlEngine.Config(waveDurationMs = 1000000000L,
      strategy = SeenSet.BloomExact, maxWaves = 1, amplify = amplify,
      pagesPath = Some(pagesDir))
    val t0 = System.nanoTime()
    val r = CrawlEngine.run(spark, sfDir, store, cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""megawave cpus=$cpus urls=${r.fetched + r.deduped} sec=$sec%.2f thr=${(r.fetched + r.deduped) / sec}%.1f digest=${r.seenDigest}""")
    spark.stop()
  }
}
