package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.functions.{Extract, QuestionParser}
import graft.sources.PagesGen
import graft.util.Json

/** Dev/test-fixture dump: renders pages for a sample of documents, writes
  * `<name>.html` + `<name>.actual.json` (engine extraction) so
  * `tools/ref_oracle.py` (independent CPython implementation) can
  * cross-check text/questions/next byte-for-byte.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/root/repo/target/oracle"
    val n = if (args.length > 2) args(2).toInt else 60

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Files.createDirectories(Paths.get(outDir))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .orderBy("doc_id").collect()
    val stride = math.max(1, docs.length / n)
    docs.zipWithIndex.filter(_._2 % stride == 0).take(n).foreach { case ((id, text), _) =>
      val (html, golden) = PagesGen.renderPage(id, text)
      val parsed = QuestionParser.parsePage(html)
      val engineText = Extract.pageText(html)
      val json = Json.obj(Seq(
        "text" -> Json.str(engineText),
        "gen_text" -> Json.str(golden),
        "next" -> (if (parsed.next == null) "null" else Json.str(parsed.next)),
        "questions" -> Json.arr(parsed.questions.map(Json.question))))
      Files.write(Paths.get(s"$outDir/doc$id.html"), html.getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(s"$outDir/doc$id.actual.json"), json.getBytes(StandardCharsets.UTF_8))
    }
    println(s"dumped ${math.min(n, docs.length)} pages to $outDir")
    spark.stop()
  }
}
