package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser

/** Isolate where the extract pipeline's per-page cost goes at the Spark
  * boundary (guide §1.1 / §4): three jobs over the same staged pages —
  *
  *   scan    udf returns html.length            (scan + schedule floor)
  *   count   udf returns parsePage(...).questions.length
  *                                              (+ parse CPU, no struct out)
  *   struct  udf returns the full ParsedPage    (+ Catalyst conversion of the
  *                                               nested questions array)
  *
  * struct − count = the UDF output-conversion cost the engine pays per page.
  *
  * Usage: UdfCostProbe <pagesDir> [cpus=8] [sampleMod=8]
  */
object UdfCostProbe {
  def main(args: Array[String]): Unit = {
    val pagesDir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 8
    val mod = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"udf-cost-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = spark.read.parquet(pagesDir)
      .where(pmod(xxhash64(col("url")), lit(mod)) === 0)
    val scanU = udf((html: Array[Byte]) => html.length)
    val countU = udf((html: Array[Byte]) => QuestionParser.parsePage(html).questions.length)
    val structU = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    def run(name: String, c: org.apache.spark.sql.Column): (Double, Long) = {
      val t0 = System.nanoTime()
      // sum(v) so the UDF column is live — count(lit(1)) alone lets the
      // optimizer prune the whole projection and time nothing
      val n = pages.select(c.as("v")).agg(sum(col("v"))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm the page cache + JIT once with the heaviest variant
    run("warm", size(structU(col("html")).getField("questions")).cast("long"))
    val variants = Seq(
      "scan" -> scanU(col("html")).cast("long"),
      "count" -> countU(col("html")).cast("long"),
      "struct" -> size(structU(col("html")).getField("questions")).cast("long"))
    val out = variants.map { case (n, c) => val (s, np) = run(n, c); (n, s, np) }
    println("{" + out.map { case (n, s, np) =>
      f""""${n}_sec":$s%.2f,"${n}_pages":$np""" }.mkString(",") + s""","cpus":$cpus}""")
  }
}
