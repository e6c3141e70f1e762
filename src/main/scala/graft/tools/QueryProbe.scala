package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc optimization probe (guide §1): time sub-stages of the expensive
  * queries in the bench session configuration, noop-style (count actions on
  * intermediate frames), to attribute per-query seconds to stages before
  * changing anything. Not part of the bench contract.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <probe> [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-queryprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    }
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    probe match {
      case "m1" =>
        import graft.util.SqlHash
        // stage 1: signature+band+tok projection materialization
        val nh = 32; val ss = 2; val nb = 16; val rpb = 2
        val aj = Array.tabulate(nh)(j => SqlHash.mulModM61(2L * j + 1, SqlHash.C2))
        val bj = Array.tabulate(nh)(j => SqlHash.mulModM61(j + 1L, SqlHash.C3))
        val bandUdf = udf((text: String) => {
          val toks = text.toLowerCase.split(" ")
          val n = math.max(toks.length - ss + 1, 1)
          val sig = Array.fill(nh)(Long.MaxValue)
          var i = 0
          while (i < n) {
            val shingle = if (ss <= 1) toks(i)
              else toks.slice(i, math.min(i + ss, toks.length)).mkString(" ")
            val base = SqlHash.hashToken(shingle)
            var j = 0
            while (j < nh) {
              val h = SqlHash.modM61(SqlHash.mulModM61(aj(j), base) + bj(j))
              if (h < sig(j)) sig(j) = h
              j += 1
            }
            i += 1
          }
          Array.tabulate(nb) { b =>
            var acc = 0L; var r = 0
            while (r < rpb) {
              acc = SqlHash.modM61(SqlHash.mulModM61(acc, SqlHash.C2) + sig(b * rpb + r)); r += 1
            }
            acc
          }
        })
        time("m1.ckpt") {
          val base = docs.select(col("doc_id"), bandUdf(col("text")).as("bands"),
            array_distinct(split(lower(col("text")), " ")).as("tok")).localCheckpoint()
          base.count()
        }
        val base = docs.select(col("doc_id"), bandUdf(col("text")).as("bands"),
          array_distinct(split(lower(col("text")), " ")).as("tok")).localCheckpoint()
        val banded = base.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band", "band_hash")))
        val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
        val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
        val cands = l.join(r, Seq("band", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        time("m1.cands") { cands.count() }
        val tok = base.select(col("doc_id"), col("tok"))
        val verified = cands
          .join(tok.select(col("doc_id").as("id_a"), col("tok").as("tok_a")), Seq("id_a"))
          .join(tok.select(col("doc_id").as("id_b"), col("tok").as("tok_b")), Seq("id_b"))
          .withColumn("jaccard", round(
            size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
              size(array_union(col("tok_a"), col("tok_b"))), 4))
          .filter(col("jaccard") >= 0.3)
          .select(col("id_a"), col("id_b"), col("jaccard"))
        time("m1.full") { verified.count() }

      case "m1v" =>
        // variants of the m1 verify stage over the SAME candidate set:
        // attribute the ~1.6 s verify to joins vs set-intersection math
        import graft.util.SqlHash
        val nh = 32; val ss = 2; val nb = 16; val rpb = 2
        val aj = Array.tabulate(nh)(j => SqlHash.mulModM61(2L * j + 1, SqlHash.C2))
        val bj = Array.tabulate(nh)(j => SqlHash.mulModM61(j + 1L, SqlHash.C3))
        val bandUdf = udf((text: String) => {
          val toks = text.toLowerCase.split(" ")
          val n = math.max(toks.length - ss + 1, 1)
          val sig = Array.fill(nh)(Long.MaxValue)
          var i = 0
          while (i < n) {
            val shingle = if (ss <= 1) toks(i)
              else toks.slice(i, math.min(i + ss, toks.length)).mkString(" ")
            val base = SqlHash.hashToken(shingle)
            var j = 0
            while (j < nh) {
              val h = SqlHash.modM61(SqlHash.mulModM61(aj(j), base) + bj(j))
              if (h < sig(j)) sig(j) = h
              j += 1
            }
            i += 1
          }
          Array.tabulate(nb) { b =>
            var acc = 0L; var r = 0
            while (r < rpb) {
              acc = SqlHash.modM61(SqlHash.mulModM61(acc, SqlHash.C2) + sig(b * rpb + r)); r += 1
            }
            acc
          }
        })
        val base = docs.select(col("doc_id"), bandUdf(col("text")).as("bands"),
          array_distinct(split(lower(col("text")), " ")).as("tok")).localCheckpoint()
        val banded = base.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band", "band_hash")))
        val lb = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
        val rb = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
        val cands = lb.join(rb, Seq("band", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        val tok = base.select(col("doc_id"), col("tok"), size(col("tok")).as("ntok"))
        def joined = cands
          .join(tok.select(col("doc_id").as("id_a"), col("tok").as("tok_a"),
            col("ntok").as("n_a")), Seq("id_a"))
          .join(tok.select(col("doc_id").as("id_b"), col("tok").as("tok_b"),
            col("ntok").as("n_b")), Seq("id_b"))
        time("m1v.joinonly") {
          joined.select(col("n_a") + col("n_b")).agg(sum(col("(n_a + n_b)"))).head()
        }
        time("m1v.inter1x") {
          joined.select((size(array_intersect(col("tok_a"), col("tok_b")))).as("i"))
            .agg(sum(col("i"))).head()
        }
        time("m1v.interfilter") {
          joined
            .withColumn("inter", size(array_intersect(col("tok_a"), col("tok_b"))))
            .withColumn("jaccard", round(
              col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
            .filter(col("jaccard") >= 0.3)
            .select(col("id_a"), col("id_b"), col("jaccard")).count()
        }
        time("m1v.unionfilter") {
          joined
            .withColumn("jaccard", round(
              size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
                size(array_union(col("tok_a"), col("tok_b"))), 4))
            .filter(col("jaccard") >= 0.3)
            .select(col("id_a"), col("id_b"), col("jaccard")).count()
        }
      case "m1r" =>
        time("m1r.full") {
          graft.operators.Dedup.minhashLsh(docs, threshold = 0.3).count()
        }
      case "m2r" =>
        time("m2r.full") {
          graft.operators.Dedup.simhashPairs(docs, maxHamming = 6).count()
        }
      case "m3r" =>
        val e3 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        time("m3r.full") {
          graft.operators.Similarity.cosineNearDup(e3, 0.45).count()
        }
      case "m4" =>
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        time("m4.full") {
          graft.operators.Similarity.cosineNearDupLsh(e, 0.45, nPlanes = 4).count()
        }
      case "d2" =>
        time("d2.full") {
          graft.operators.Dedup.ngramJaccard(docs, threshold = 0.3,
            maxBlock = Some(1000)).count()
        }
      case "r5" | "w1" =>
        import graft.functions.QuestionParser
        import graft.operators.{BatchSink, Enrichment, Restructure, ScreenshotWorkflow}
        val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
        def pq = graft.sources.PagesGen.pages(spark, sfDir).toDF()
          .withColumn("p", parse(col("html")))
          .select(col("url"),
            regexp_extract(col("url"), "questions/([a-z-]+)-", 1).as("seed_subject"),
            regexp_extract(col("url"), "-(\\d+)/c", 1).cast("int").as("seed_year"),
            posexplode(col("p.questions")).as(Seq("pos", "q")))
          .select(col("url"), col("seed_subject"), col("seed_year"), col("pos"),
            col("q.section"), col("q.qtype"), col("q.number"), col("q.question"),
            col("q.options"), col("q.subparts"), col("q.diagrams"),
            col("q.answer"), col("q.solution"), col("q.answer_after_solution"))
        (1 to reps).foreach { rep =>
          val out = java.nio.file.Files.createTempDirectory("probe-sink").toString
          def t[T](name: String)(f: => T): T = {
            val t0 = System.nanoTime()
            val r = f
            println(f"[probe] $probe.$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
            r
          }
          val q = t("ckpt") { val c = pq.localCheckpoint(); c.count(); c }
          t("wb.docs") { Restructure.restructuredDocs(q).collect() }
          t("wb.meta") { Restructure.metadata(q).collect() }
          t("wb.reports") { Restructure.reports(spark, q).collect() }
          val fl = Restructure.flattenCsv(q)
          t("wb.flatCollect") { fl.collect() }
          t("writeBatch") { BatchSink.writeBatchOutputs(spark, q, out) }
          if (probe == "r5") {
            val st1 = t("scan1") {
              Enrichment.scanBatchState(spark, out)
                .select("subject", "year", "screenshot_url").collect()
            }
            t("enrichloop") {
              st1.foreach { r =>
                val name = s"${r.getString(0)}_${r.getInt(1)}"
                val meta = s"$out/$name/${name}_metadata.json"
                r.getInt(1) % 4 match {
                  case 0 => Enrichment.enrichMetadataFile(meta, r.getString(2))
                  case 1 => Enrichment.enrichMetadataFile(meta, "https://stale.example/old.png")
                  case 2 => java.nio.file.Files.delete(
                    java.nio.file.Paths.get(s"$out/$name/$name.json"))
                  case _ => ()
                }
              }
            }
            t("scan2classify") {
              Enrichment.classify(Enrichment.scanBatchState(spark, out))
                .groupBy(col("outcome")).agg(count(lit(1)).as("n")).count()
            }
          } else {
            val items = t("items") {
              Restructure.metadata(q).select(col("subject"), col("year"))
                .collect().sortBy(r => (r.getString(0), r.getInt(1)))
                .map(r => ScreenshotWorkflow.Item(r.getString(0), r.getInt(1),
                  s"https://kuulchat.com/bece/questions/${r.getString(0)}-${r.getInt(1)}/"))
            }
            val results = t("processBatch") {
              val df = ScreenshotWorkflow.processBatch(spark, items.toSeq, out)
              df.count(); df
            }
            t("tally") { ScreenshotWorkflow.batchTally(results).count() }
          }
          // cleanup
          val p = java.nio.file.Paths.get(out)
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(x => java.nio.file.Files.deleteIfExists(x))
        }
      case "parse" =>
        // pure parser timing, no Spark in the loop: render the sf corpus
        // driver-side once (untimed), then time parsePage over it
        val rows = docs.select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        val pages: Array[Array[Byte]] = rows.map { case (id, text) =>
          graft.sources.PagesGen.renderPage(id, text)._1
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        var nq = 0L
        (1 to 2).foreach { _ => // JIT warmup
          pages.foreach(p => nq += graft.functions.QuestionParser.parsePage(p).questions.size)
        }
        time(s"parse.${pages.length}pages-1thread") {
          var q = 0L
          pages.foreach(p => q += graft.functions.QuestionParser.parsePage(p).questions.size)
          q
        }
        val strs = pages.map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
        time("parse.htmlOnly") {
          var k = 0L
          strs.foreach(s => k += graft.util.Html.parse(s).children.size)
          k
        }
        time("parse.pageText") {
          var k = 0L
          strs.foreach(s => k += graft.functions.Extract.pageText(s).length)
          k
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
