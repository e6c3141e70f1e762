package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CrawlEngine
import graft.operators.{Politeness, SeenSet}

/** Decompose the wave-0 rank+count phase: which sub-DAG carries the
  * near-constant ~5 s (dedup flag? politeness? cache write? count?).
  * Usage: ProbeWave <sfDir> <cpus> <amplify> — reuses MegaWave's staged pages.
  */
object ProbeWave {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, cpusS, amplifyS) = args
    val cpus = cpusS.toInt
    val amplify = amplifyS.toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    // stage frontier parquet like wave 0 (seed frontier)
    val store = java.nio.file.Files.createTempDirectory(s"graft-probe").toString
    val seeds = CrawlEngine.seedFrontier(spark, sfDir, amplify)
    t("seed-write")(seeds.write.parquet(s"$store/frontier"))

    val cands = spark.read.parquet(s"$store/frontier")
    t("cands.count")(cands.count())
    t("cands.count2")(cands.count())

    val bloom = new SeenSet.Bloom(1L << 22, 0.01)
    val (defNew, suspects) = SeenSet.bloomSplit(spark, cands, bloom)
    val seenLog = spark.range(0).select(col("id").as("url_hash"))
    def seenFlagExact(df: DataFrame): DataFrame =
      df.join(seenLog.withColumn("is_seen", lit(true)), Seq("url_hash"), "left")
        .withColumn("is_seen", coalesce(col("is_seen"), lit(false)))
    val flagged = defNew.withColumn("is_seen", lit(false))
      .unionByName(seenFlagExact(suspects))
    t("flagged.count")(flagged.count())

    val robots = Politeness.robotsFixture(spark).toDF()
    val waveLog = Politeness.disposition(flagged, robots, 4000000000L, 16)
    t("waveLog.count-nocache")(waveLog.count())
    val cached = waveLog.cache()
    t("waveLog.cache+groupBy")(cached.groupBy("disp").count().collect())
    t("waveLog.groupBy-warm")(cached.groupBy("disp").count().collect())
    cached.unpersist()
    spark.stop()
  }
}
