package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser

/** Extraction-pipeline scaling probe: the map-dominant job (scan → parse →
  * aggregate) at a given thread count over a pre-staged pages dir.
  * This is the CPU-bound core of every wave; shuffle-light by construction.
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val pagesDir = args(0)
    val cpus = args(1).toInt
    // honors GRAFT_MASTER / a spark-submit master (ToolSession) so the
    // extract ceiling can be probed at N vs 4N executor JVMs too
    val master = ToolSession.resolveMaster(cpus.toString)
    val spark = ToolSession.configureCluster(
      SparkSession.builder().master(master)
        .appName(s"extract-bench-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.ui.enabled", "false"),
      master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    val t0 = System.nanoTime()
    val r = spark.read.parquet(pagesDir)
      .select(parse(col("html")).as("p"))
      .agg(sum(size(col("p.questions"))).as("nq"), count(lit(1)).as("np"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"extractbench cpus=$cpus pages=${r.getLong(1)} questions=${r.getLong(0)} sec=$sec%.2f pages_per_sec=${r.getLong(1) / sec}%.1f")
    spark.stop()
  }
}
