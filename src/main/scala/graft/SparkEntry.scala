package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuestionParser
import graft.sources.PagesGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full extraction over the synthesized pages table at sf0.001 —
    * every parsed question in reference emit order (objectives then theory,
    * sorted by number; SURVEY §3.2). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = PagesGen.pages(spark, "/root/testdata/sf0.001")
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    pages
      .withColumn("parsed", parse($"html"))
      .select($"url", posexplode($"parsed.questions").as(Seq("pos", "q")))
      .select($"url", $"pos", $"q.section", $"q.qtype", $"q.number", $"q.question",
        $"q.options", $"q.subparts", $"q.diagrams", $"q.answer", $"q.solution")
      .withColumn("section_rank", when($"section" === "objective", 0).otherwise(1))
      .orderBy($"url", $"section_rank", $"number", $"pos") // pos: total order
      .drop("section_rank")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
