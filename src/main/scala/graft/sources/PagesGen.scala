package graft.sources

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.PyText

/** Deterministic Common-Crawl-style pages table (SURVEY.md §7.1 input_hint;
  * exact shape from BASELINE.json:15: url, warc_ts, html binary, text, lang).
  *
  * Every row is a pure function of `doc_id` + `text` + `lang` from
  * `/root/testdata/<sf>/documents.parquet` — no wall clock, no RNG state.
  * The rendered HTML exercises every parse branch of the reference spider
  * (`/root/reference/core/main.py`): ads, chemical formulas, the three option
  * layouts, answer-pattern variants incl. the HTML-checkmark fallback,
  * nested theory subparts, duplicate numbers/diagrams, pagination.
  *
  * The `text` column is the golden extraction oracle: it is computed from the
  * raw text segments (never from the HTML), and the engine must reproduce it
  * byte-identically from `html` alone (Extract.pageText).
  *
  * URL / host / subject / year derivations are plain integer arithmetic so
  * DuckDB oracles can reproduce the frontier-side relational queries.
  */
object PagesGen {

  final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte],
                           text: String, lang: String)
  final case class Seed(subject: String, year: Int, url: String)

  val ChainLen = 4 // pages per pagination chain
  val Subjects: Vector[String] =
    Vector("science", "mathematics", "english", "social-studies")
  /** Base epoch: 2025-01-01T00:00:00Z (pinned clock — determinism, X11). */
  val Epoch: Long = 1735689600L

  // --- pure arithmetic derivations (DuckDB-replicable) ----------------------
  def chainOf(docId: Long): Long = docId / ChainLen
  def pageIdxOf(docId: Long): Int = (docId % ChainLen).toInt
  def subjectOf(docId: Long): String = Subjects((chainOf(docId) % 4).toInt)
  def yearOf(docId: Long): Int = 2015 + (chainOf(docId) % 10).toInt
  /** ~30% of chains land on the hot host h0 (skew fixture, SURVEY P8). */
  def hostIdOf(docId: Long): Int = {
    val c = chainOf(docId)
    if (c % 10 < 3) 0 else 1 + ((c * 7) % 31).toInt
  }
  def hostOf(docId: Long): String = s"h${hostIdOf(docId)}.example.test"
  def urlOf(docId: Long): String = {
    val c = chainOf(docId)
    s"https://${hostOf(docId)}/bece/questions/${subjectOf(docId)}-${yearOf(docId)}/c$c/p${pageIdxOf(docId)}"
  }
  def warcTsOf(docId: Long): Timestamp =
    new Timestamp((Epoch + (docId % 86400)) * 1000L)

  /** splitmix64 — deterministic per-row variant selector. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e9b5L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  // --- page rendering ---------------------------------------------------------

  /** Builder keeping html markup and raw text segments in lockstep; the
    * golden `text` column is cleanText over the raw segments joined with " "
    * (exactly what `::text`-getall + `clean_text` yields from the html).
    */
  private final class B {
    val html = new java.lang.StringBuilder(4096)
    val segs = ArrayBuffer.empty[String]
    def tag(markup: String): Unit = html.append(markup)
    def raw(s: String): Unit = {
      require(html.length() > 0 && html.charAt(html.length() - 1) == '>',
        "raw text must be separated by markup (one text node per segment)")
      html.append(PyText.escapeHtml(s))
      segs += s
    }
    def textOnlyTag(open: String, s: String, close: String): Unit = {
      tag(open); raw(s); tag(close)
    }
  }

  private val adTexts = Vector(
    "Sponsored content from our partners",
    "Advertise your business here today",
    "Kuulchat Media brings you quality education",
    "Visit kuulpay.com for payments",
    "Get a professional website now",
    "Affordable website design services",
    "School management system for institutions")

  private def words(docText: String): Array[String] = {
    val w = docText.split("\\s+").filter(_.nonEmpty)
    if (w.isEmpty) Array("lorem") else w
  }

  private def phrase(w: Array[String], h: Long, i: Int, n: Int): String = {
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb += ' '
      sb ++= w((((h >>> (k % 5)) + i * 7 + k * 13) % w.length).abs.toInt)
      k += 1
    }
    sb.result()
  }

  private val chemSnippets = Vector(
    "the ion Mg 2+ reacts", "a solution of SO 4 2- forms",
    "Na + combines with Cl -", "carbonate CO 3 2- appears",
    "hydroxide OH - is basic")

  /** Render one mcq question block. Variant space covers: the three option
    * layouts (core/main.py:226-232), answer patterns (core/main.py:267-272),
    * the checkmark/html-answer fallback (core/main.py:306-329), chemical
    * formulas, entities, diagrams incl. duplicates / ads / space-in-name.
    */
  private def mcq(b: B, w: Array[String], h: Long, num: Int, subject: String): Unit = {
    val v = mix(h + num)
    val stemExtra =
      if (subject == "science" && (v & 7) == 0) " " + chemSnippets(((v >>> 3) % 5).toInt)
      else if ((v & 15) == 1) " measured at 25 °C with 5 &lt; x"
      else if ((v & 15) == 2) " from AT&T records"
      else ""
    val stem = s"Which of the following ${phrase(w, v, 1, 4)}$stemExtra"
    val opts = (0 until 4).map(i => phrase(w, v >>> 8, i + 2, 2 + (i % 2)))
    val answerLetter = "ABCD".charAt(((v >>> 16) % 4).toInt)
    b.tag("""<div class="question">""")
    b.textOnlyTag("<div>", s"$num. $stem", "</div>")
    // option layout variants
    ((v >>> 20) % 3) match {
      case 0 => // inline "A. text B. text"
        b.textOnlyTag("<div>",
          s"A. ${opts(0)} B. ${opts(1)} C. ${opts(2)} D. ${opts(3)}", "</div>")
      case 1 => // one div per option
        "ABCD".zip(opts).foreach { case (l, o) =>
          b.textOnlyTag("<div>", s"$l. $o", "</div>")
        }
      case _ => // spaced dots
        b.textOnlyTag("<div>",
          s"A . ${opts(0)} B . ${opts(1)} C . ${opts(2)} D . ${opts(3)}", "</div>")
    }
    // diagrams
    if ((v >>> 24) % 4 == 0) {
      val fig = s"fig ${num} diagram.png"
      b.tag(s"""<img src="https://kuulchat.com/qns/$fig">""")
      if ((v >>> 26) % 2 == 0) // duplicate — dedup branch O4
        b.tag(s"""<img src="https://kuulchat.com/qns/$fig">""")
      b.tag("""<img src="/static/banner-promo.png">""") // ad image — dropped
      if ((v >>> 27) % 2 == 0) // non-/qns/, non-ad-pattern — KEPT (F4 quirk)
        b.tag(s"""<img src="/media/photo$num.png">""")
    }
    // solution / answer variants
    ((v >>> 28) % 6) match {
      case 0 =>
        b.textOnlyTag("<div>",
          s"Solution The answer is $answerLetter because ${phrase(w, v >>> 32, 9, 5)}", "</div>")
      case 1 =>
        b.textOnlyTag("<div>",
          s"Solution The correct answer is $answerLetter since ${phrase(w, v >>> 32, 9, 4)}", "</div>")
      case 2 =>
        b.textOnlyTag("<div>",
          s"Solution option $answerLetter is right as ${phrase(w, v >>> 32, 9, 4)}", "</div>")
      case 3 =>
        b.textOnlyTag("<div>",
          s"Solution $answerLetter. ${phrase(w, v >>> 32, 9, 5)}", "</div>")
      case 4 => // html-fallback: checkmark span, no Solution text
        b.tag("""<span class="correct">""")
        b.raw(s"✓ $answerLetter")
        b.tag("</span>")
      case _ => // Mark split, no extractable letter in solution
        b.textOnlyTag("<div>", s"Mark ${1 + (num % 3)} ${phrase(w, v >>> 32, 9, 3)}", "</div>")
    }
    b.tag("</div>")
  }

  /** Render one theory question block (nested subparts, Show Solution). */
  private def theory(b: B, w: Array[String], h: Long, num: Int): Unit = {
    val v = mix(h ^ (num * 0x517cc1b7L))
    val intro = s"Explain how ${phrase(w, v, 1, 5)}"
    val nParts = 2 + ((v >>> 8) % 2).toInt // (a)(b) or (a)(b)(c)
    val sb = new StringBuilder(s"$num. $intro")
    val letters = "abcd"
    (0 until nParts).foreach { i =>
      sb ++= s" (${letters(i)}) "
      if (i == 0 && (v >>> 12) % 2 == 0) {
        sb ++= s"Consider these cases (i) ${phrase(w, v >>> 16, i + 3, 3)} (ii) ${phrase(w, v >>> 20, i + 4, 3)}"
      } else {
        sb ++= s"Describe ${phrase(w, v >>> 16, i + 3, 4)}"
      }
    }
    sb ++= " Show Solution "
    (0 until nParts).foreach { i =>
      sb ++= s"(${letters(i)}) The answer involves ${phrase(w, v >>> 24, i + 7, 4)} "
    }
    b.tag("""<div class="question">""")
    b.textOnlyTag("<div>", sb.result(), "</div>")
    b.tag("</div>")
  }

  /** Render a full page; returns (html, goldenText). */
  def renderPage(docId: Long, docText: String): (String, String) = {
    val b = new B
    val w = words(docText)
    val h = mix(docId)
    val subject = subjectOf(docId)
    val year = yearOf(docId)
    val pageIdx = pageIdxOf(docId)
    val chain = chainOf(docId)

    b.tag("<html><head>")
    b.textOnlyTag("<title>", s"BECE $subject $year Questions", "</title>")
    b.tag("</head><body>")
    b.textOnlyTag("""<div class="header">""", s"BECE $subject $year page ${pageIdx + 1}", "</div>")

    b.textOnlyTag("""<h4 class="center">""", "OBJECTIVE TEST", "</h4>")
    val nObj = 3 + (h % 3).toInt
    var emitted = 0
    (1 to nObj).foreach { q =>
      if ((mix(h + q * 101) % 3) == 0) { // interleaved ad — F3
        b.textOnlyTag("<div>", adTexts(((h >>> (q % 7)) % adTexts.length).abs.toInt), "</div>")
      }
      mcq(b, w, h, pageIdx * 10 + q, subject)
      emitted += 1
    }

    b.textOnlyTag("""<h4 class="center">""", "THEORY QUESTIONS", "</h4>")
    val nTheory = 1 + (h % 2).toInt
    (1 to nTheory).foreach { q =>
      theory(b, w, h, q)
      if (q == 1 && (h % 5) == 0) theory(b, w, h + 1, q) // duplicate number — O2
    }

    // p0→p1→…→p(L-1)→p0: the last page cycles back to the seed, so every
    // chain re-candidates one already-seen url per full crawl — the URL-seen
    // anti-join (J4) is exercised on every chain, as on real sites.
    val nextIdx = if (pageIdx < ChainLen - 1) pageIdx + 1 else 0
    b.tag("""<div class="pagination">""")
    b.tag(s"""<a class="next" href="/bece/questions/$subject-$year/c$chain/p$nextIdx">""")
    b.raw("Next")
    b.tag("</a></div>")
    b.tag("</body></html>")

    val golden = graft.functions.Extract.cleanText(b.segs.mkString(" "))
    (b.html.toString, golden)
  }

  def renderRow(docId: Long, docText: String, lang: String): PageRow = {
    val (html, golden) = renderPage(docId, docText)
    PageRow(urlOf(docId), warcTsOf(docId),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), golden, lang)
  }

  /** Replica stride: virtual doc ids `replica * Stride + doc_id` keep chains
    * disjoint across replicas (documents is a fixed 500-row corpus at every
    * sf; bench-scale frontiers amplify it deterministically).
    */
  val Stride = 1000000L

  /** The pages Dataset for a scale dir — `factor` pages per document row. */
  def pages(spark: SparkSession, sfDir: String, factor: Int = 1): Dataset[PageRow] = {
    import spark.implicits._
    val f = factor
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (id, t, l) =>
        (0 until f).iterator.map(r => renderRow(r * Stride + id, t, l))
      }
  }

  /** Seed list: page 0 of every chain (S1, run_spider.py:137-143). */
  def seeds(spark: SparkSession, sfDir: String, factor: Int = 1): Dataset[Seed] = {
    import spark.implicits._
    val f = factor
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long]
      .filter(id => pageIdxOf(id) == 0)
      .flatMap { id =>
        (0 until f).iterator.map { r =>
          val vid = r * Stride + id
          Seed(subjectOf(vid), yearOf(vid), urlOf(vid))
        }
      }
  }
}
