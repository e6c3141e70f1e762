package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.QuestionParser
import graft.util.Html

/** Single-thread stage attribution for the page parse (the crawl's dominant
  * CPU): collect N pages driver-side, then time the parse stages separately —
  * DOM build, objective extraction, theory extraction, next-link scan — over
  * `reps` passes (best-of to shed JIT/GC noise). Guides the §1.2 "per-task
  * work" loop for the parser; results quoted in OPTIMIZATION_r06.md.
  *
  * Usage: ParseStageProbe <pagesDirOrSfDir> [n=5000] [reps=3]
  */
object ParseStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5000
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[4]")
      .appName("parse-stage-probe").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/pages.parquet")))
        spark.read.parquet(s"$dir/pages.parquet")
      else if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
        graft.sources.PagesGen.pages(spark, dir).toDF()
      else spark.read.parquet(dir)
    val htmls: Array[String] = src.select("html").limit(n).collect()
      .map(r => new String(r.getAs[Array[Byte]](0), java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    System.err.println(s"[probe] ${htmls.length} pages")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    var best = Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    var nq = 0L
    (1 to reps).foreach { _ =>
      val (tAll, _) = time { htmls.foreach(QuestionParser.parsePage) }
      val (tDom, roots) = time { htmls.map(Html.parse) }
      val (tObj, qo) = time { roots.map(r => QuestionParser.extractObjectiveQuestions(r).length) }
      val (tTheo, qt) = time { roots.map(r => QuestionParser.extractTheoryQuestions(r).length) }
      val (tNext, _) = time { roots.foreach(QuestionParser.extractNext) }
      nq = qo.sum.toLong + qt.sum.toLong
      Seq("parsePage" -> tAll, "dom" -> tDom, "objective" -> tObj,
        "theory" -> tTheo, "next" -> tNext).foreach { case (k, v) =>
        if (v < best(k)) best += k -> v }
    }
    println(f"""{"pages":${htmls.length},"questions":$nq,"parse_sec":${best("parsePage")}%.3f,"dom_sec":${best("dom")}%.3f,"objective_sec":${best("objective")}%.3f,"theory_sec":${best("theory")}%.3f,"next_sec":${best("next")}%.3f}""")

    // ---- drill: attribute the objective walk's cost over its public pieces
    // (section-header find reimplemented here; the sibling loop mirrors
    // extractObjectiveQuestions but times each stage over the same inputs)
    import graft.util.HElem
    import graft.functions.Extract
    val adKeywords = Seq("sponsored", "advertise", "kuulchat media",
      "kuulpay.com", "get a professional", "affordable website",
      "management system")
    val candidate = java.util.regex.Pattern.compile("\\b\\d+\\.\\s+")
    val markOrSolution = java.util.regex.Pattern.compile("\\s+(?:Mark|Solution)\\s+")
    def findHeader(root: HElem, title: String): Option[(HElem, Int)] = {
      def walk(parent: HElem): Option[(HElem, Int)] = {
        parent.children.zipWithIndex.foreach {
          case (e: HElem, idx) =>
            if (e.tag == "h4" && e.hasClass("center") && e.stringValue.contains(title))
              return Some((parent, idx))
            val r = walk(e)
            if (r.isDefined) return r
          case _ =>
        }
        None
      }
      walk(root)
    }
    val roots = htmls.map(Html.parse)
    val sibs: Array[HElem] = roots.flatMap(r => findHeader(r, "OBJECTIVE TEST") match {
      case Some((p, i)) => p.children.drop(i + 1).collect { case e: HElem => e }
      case None => Vector.empty })
    var drill = Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    (1 to reps).foreach { _ =>
      val (tFind, _) = time { roots.foreach(r => findHeader(r, "OBJECTIVE TEST")) }
      val (tFt, fts) = time { sibs.map(Extract.fullText) }
      val (tAd, _) = time { fts.foreach(ft => adKeywords.exists(ft.toLowerCase.contains)) }
      val (tCand, _) = time { fts.foreach(ft => candidate.matcher(ft).find()) }
      val pairs = sibs.zip(fts).filter { case (_, ft) =>
        !ft.contains("THEORY QUESTIONS") &&
          !adKeywords.exists(ft.toLowerCase.contains) && candidate.matcher(ft).find() }
      val (tParse, _) = time { pairs.foreach { case (s, ft) => QuestionParser.parseObjective(s, ft) } }
      val qparts = pairs.map { case (_, ft) =>
        val m = markOrSolution.matcher(ft)
        if (m.find()) (ft.substring(0, m.start()), ft.substring(m.end())) else (ft, "") }
      val (tOpt, _) = time { qparts.foreach(q => QuestionParser.extractOptions(q._1)) }
      val (tStem, _) = time { qparts.foreach(q => QuestionParser.extractQuestionStem(q._1, 1)) }
      val (tAns, _) = time { qparts.foreach(q => QuestionParser.extractAnswerInfo(q._2)) }
      val (tDiag, _) = time { pairs.foreach(p => QuestionParser.extractAllDiagrams(p._1)) }
      Seq("find" -> tFind, "fulltext" -> tFt, "ad" -> tAd, "cand" -> tCand,
        "parseObj" -> tParse, "options" -> tOpt, "stem" -> tStem,
        "answer" -> tAns, "diagrams" -> tDiag).foreach { case (k, v) =>
        if (v < drill(k)) drill += k -> v }
    }
    println(f"""{"sibs":${sibs.length},"find_sec":${drill("find")}%.3f,"fulltext_sec":${drill("fulltext")}%.3f,"ad_sec":${drill("ad")}%.3f,"cand_sec":${drill("cand")}%.3f,"parseObj_sec":${drill("parseObj")}%.3f,"options_sec":${drill("options")}%.3f,"stem_sec":${drill("stem")}%.3f,"answer_sec":${drill("answer")}%.3f,"diagrams_sec":${drill("diagrams")}%.3f}""")
  }
}
