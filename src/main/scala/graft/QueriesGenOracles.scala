package graft

/** DuckDB oracles for the parse-derived batch artifacts (r1, r3, r4, r6).
  *
  * The page generator is deterministic: every per-page and per-question
  * property flows from splitmix64 (`PagesGen.mix`) of the doc id — the
  * number of MCQ/theory questions, diagram/photo presence, and the
  * solution-variant selector are all modular functions of those hashes
  * (PagesGen.renderPage / mcq). That makes the restructure pipeline's
  * OUTPUT COUNTS AND MANIFESTS re-derivable in pure SQL, independently of
  * the HTML round-trip: the oracle re-computes splitmix64 in DuckDB
  * (HUGEINT mod-2^64 arithmetic; 64x64 multiplies split at 32 bits so the
  * 128-bit intermediate never overflows) and rebuilds the expected batch
  * tables from the generator arithmetic alone. A parser that drops, dups,
  * or misfiles a question — or an image dedup/path-rewrite bug — lands as
  * a count or manifest-row diff against an oracle that never saw the HTML.
  *
  * Layered-CTE shape: each xorshift/multiply step is one CTE column, so
  * the expression tree stays linear (inlining splitmix64 naively explodes
  * 4x per step — each step references its input four times).
  */
object QueriesGenOracles {

  private val M = "18446744073709551616::HUGEINT" // 2^64

  /** Chained CTEs computing `out` = splitmix64(`inCol`) over `src`.
    * `inCol` must be a HUGEINT in [0, 2^64); `p` prefixes the step CTEs.
    */
  private def mixCte(src: String, inCol: String, out: String, p: String): String = {
    // (col * c) mod 2^64 with col,c < 2^64: split col at 32 bits so each
    // partial product stays under 2^97 (signed HUGEINT max is 2^127-1)
    def mul(c: String, col: String): String =
      s"((($col % 4294967296) * $c::HUGEINT" +
        s" + ((($col // 4294967296) * $c::HUGEINT) % 4294967296) * 4294967296) % $M)"
    s""", ${p}1 AS (SELECT *, (($inCol + 11400714819323198485::HUGEINT) % $M) AS ${p}a FROM $src)
       |, ${p}2 AS (SELECT *, xor(${p}a, ${p}a // 1073741824) AS ${p}b FROM ${p}1)
       |, ${p}3 AS (SELECT *, ${mul("13787848793156544949", p + "b")} AS ${p}c FROM ${p}2)
       |, ${p}4 AS (SELECT *, xor(${p}c, ${p}c // 134217728) AS ${p}d FROM ${p}3)
       |, ${p}5 AS (SELECT *, ${mul("10723151780598845931", p + "d")} AS ${p}e FROM ${p}4)
       |, ${p}6 AS (SELECT *, xor(${p}e, ${p}e // 2147483648) AS $out FROM ${p}5)""".stripMargin
  }

  /** Page-level counts: hu = mix(doc_id); the generator derives question
    * counts from the SIGNED view (Scala Long rem, sign of the dividend —
    * DuckDB's % matches): nObj = 3 + h%3, nTheory = 1 + h%2
    * (PagesGen.renderPage; the h%5 duplicate theory is parser-deduped, O2).
    */
  private val pagesCte: String =
    ", fd AS (SELECT doc_id, subject, year, url, page_idx, CAST(doc_id AS HUGEINT) AS x0 FROM frontier)\n" +
      mixCte("fd", "x0", "hu", "ph") + "\n" +
      s""", pcnt AS (SELECT doc_id, subject, year, url, page_idx, hu,
         |    3 + ((CASE WHEN hu >= 9223372036854775808::HUGEINT THEN hu - $M ELSE hu END) % 3) AS nobj,
         |    1 + ((CASE WHEN hu >= 9223372036854775808::HUGEINT THEN hu - $M ELSE hu END) % 2) AS nth
         |  FROM ph6)""".stripMargin

  /** Question-level flags: one row per MCQ (q = 1..nObj, number =
    * page_idx*10 + q), v = mix(hu + number). Diagram when v>>>24 ≡ 0 mod 4,
    * the kept non-/qns/ photo when additionally v>>>27 is even (F4 quirk),
    * solution-variant selector v>>>28 mod 6 (variant 4 = checkmark
    * fallback: answer only, no solution text) — PagesGen.mcq.
    */
  private val mcqCte: String =
    pagesCte + "\n" +
      s""", mq0 AS (SELECT doc_id, subject, year, url, page_idx, nobj, q,
         |    ((hu + CAST(page_idx * 10 + q AS HUGEINT)) % $M) AS qx0,
         |    CAST(page_idx * 10 + q AS BIGINT) AS num
         |  FROM pcnt, LATERAL (SELECT unnest(generate_series(1, CAST(nobj AS INT))) AS q) s)
         |""".stripMargin +
      mixCte("mq0", "qx0", "vu", "qh") + "\n" +
      """, mq AS (SELECT doc_id, subject, year, url, page_idx, nobj, q, num, vu,
        |    (vu // 16777216) % 4 = 0 AS has_diag,
        |    (vu // 134217728) % 2 = 0 AS has_photo,
        |    CAST((vu // 268435456) % 6 AS INT) AS solv
        |  FROM qh6)""".stripMargin

  /** Kept-image universe per batch: fig urls are pyQuote'd once by the
    * parser's fix_image_url (space → %20) and AGAIN in the local path
    * (% → %25); the /media/photo quirk images have no quotable chars.
    * Distinctness is per (subject, year, image_url): the same question
    * number recurs across a batch's chains with identical url strings, so
    * the manifest's first-occurrence dedup collapses them (Restructure
    * .imageManifest) — first = min (url, pos) since ord_rank is 0 for all
    * MCQ-owned images and theory questions carry no diagrams.
    */
  private val imgsCte: String =
    """, imgs AS (
      |  SELECT subject, year, num,
      |    concat('https://kuulchat.com/qns/fig%20', cast(num AS varchar), '%20diagram.png') AS image_url,
      |    concat('images/objectives/fig%2520', cast(num AS varchar), '%2520diagram.png') AS local_path,
      |    url, q - 1 AS pos FROM mq WHERE has_diag
      |  UNION ALL
      |  SELECT subject, year, num,
      |    concat('/media/photo', cast(num AS varchar), '.png') AS image_url,
      |    concat('images/objectives/photo', cast(num AS varchar), '.png') AS local_path,
      |    url, q - 1 AS pos FROM mq WHERE has_diag AND has_photo)""".stripMargin

  // ---- per-question TEXT reconstruction (c2, r2) ---------------------------
  //
  // The remaining two queries emit the parsed question/answer/solution/option
  // STRINGS. Those are still generator arithmetic: every phrase is words of
  // the page's own document text indexed by shifted-hash arithmetic, and the
  // parser's string pipeline (clean_text -> chemical-formula fix -> the
  // Mark/Solution and option splits -> answer-pattern scan) is expressible
  // with RE2 regexps (no lookaheads needed for these columns — the
  // first-non-empty-wins option semantics collapse, on this page universe,
  // to "A..C = generated options; D picks up the checkmark tail").

  /** words(text)[idx] for phrase word k of phrase(w, h, i, n):
    * idx = |signedRem((h >>> (k%5)) + i*7 + k*13, wlen)| (PagesGen.phrase).
    * Expects columns `w` (the page's word list) and `wlen` in scope.
    */
  private def pw(h: String, k: Int, i: Int): String = {
    val shift = 1L << (k % 5)
    val add = i * 7 + k * 13
    val u = s"((($h) // $shift + $add) % $M)"
    s"list_extract(w, 1 + CAST(abs((CASE WHEN $u >= 9223372036854775808::HUGEINT " +
      s"THEN $u - $M ELSE $u END) % wlen) AS INT))"
  }

  private def phraseSql(h: String, i: Int, n: Int): String =
    (0 until n).map(k => pw(h, k, i)).mkString("concat_ws(' ', ", ", ", ")")

  /** clean_text in SQL: unescape (only &lt;/&amp; occur in generated text),
    * collapse whitespace, strip, then fix_chemical_formulas' three ordered
    * regex passes + the ordered literal table (Extract.fixChemicalFormulas).
    */
  private def cleanSql(e: String): String = {
    val unesc = s"replace(replace($e, '&lt;', '<'), '&amp;', '&')"
    val collapsed = s"trim(regexp_replace($unesc, '\\s+', ' ', 'g'))"
    val c1 = s"regexp_replace($collapsed, '\\b([A-Z][a-z]?)\\s+(\\d+)\\s*([+-])\\s*', '\\1\\2\\3', 'g')"
    val c2 = s"regexp_replace($c1, '\\b([A-Z][a-z]?)\\s+([+-])\\s*', '\\1\\2', 'g')"
    val c3 = s"regexp_replace($c2, '\\b([A-Z][a-z]?[A-Z]?[a-z]?)\\s+(\\d*)\\s*([+-])\\s*', '\\1\\2\\3', 'g')"
    val lits = Seq(
      "Mg 2+" -> "Mg2+", "Ca 2+" -> "Ca2+", "Na +" -> "Na+", "K +" -> "K+",
      "OH -" -> "OH-", "CO 3 2-" -> "CO32-", "SO 4 2-" -> "SO42-",
      "NO 3 -" -> "NO3-", "Cl -" -> "Cl-", "Na +1" -> "Na+1", "Na + " -> "Na+")
    lits.foldLeft(c3) { case (acc, (a, b)) => s"replace($acc, '$a', '$b')" }
  }

  /** Per-page word lists (PagesGen.words: split on \s+, drop empties,
    * ["lorem"] fallback).
    */
  private val wordsCte: String =
    """, wl AS (SELECT doc_id AS wdoc,
      |    CASE WHEN len(w0) = 0 THEN ['lorem'] ELSE w0 END AS w,
      |    CASE WHEN len(w0) = 0 THEN 1 ELSE len(w0) END AS wlen
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(text, '\s+'), x -> x != '') AS w0
      |        FROM documents))""".stripMargin

  /** MCQ rows with parsed question/answer/solution + option strings: build
    * the question block's joined text exactly as the generator renders it,
    * then run the parser's own string pipeline over it.
    */
  private val mcqRowsCte: String = {
    val opts = Seq((2, 2), (3, 3), (4, 2), (5, 3)).zipWithIndex.map {
      case ((i, n), idx) => s"    ${phraseSql("(vu // 256)", i, n)} AS o$idx,"
    }.mkString("\n")
    mcqCte + "\n" + wordsCte + "\n" +
      s""", mqt AS (SELECT mq.*, w, wlen FROM mq JOIN wl ON wl.wdoc = mq.doc_id)
         |, mqp AS (SELECT doc_id, subject, year, url, nobj, q, num, vu, has_diag, has_photo, solv,
         |    ${phraseSql("vu", 1, 4)} AS stem_p,
         |$opts
         |    ${phraseSql("(vu // 4294967296)", 9, 3)} AS p3,
         |    ${phraseSql("(vu // 4294967296)", 9, 4)} AS p4,
         |    ${phraseSql("(vu // 4294967296)", 9, 5)} AS p5,
         |    substr('ABCD', 1 + CAST((vu // 65536) % 4 AS INT), 1) AS ltr
         |  FROM mqt)
         |, mqf AS (SELECT *, concat(
         |    CAST(num AS VARCHAR), '. Which of the following ', stem_p,
         |    CASE WHEN subject = 'science' AND vu % 8 = 0 THEN concat(' ',
         |        CASE CAST((vu // 8) % 5 AS INT)
         |          WHEN 0 THEN 'the ion Mg 2+ reacts'
         |          WHEN 1 THEN 'a solution of SO 4 2- forms'
         |          WHEN 2 THEN 'Na + combines with Cl -'
         |          WHEN 3 THEN 'carbonate CO 3 2- appears'
         |          ELSE 'hydroxide OH - is basic' END)
         |      WHEN vu % 16 = 1 THEN ' measured at 25 °C with 5 &lt; x'
         |      WHEN vu % 16 = 2 THEN ' from AT&T records' ELSE '' END,
         |    CASE WHEN CAST((vu // 1048576) % 3 AS INT) = 2
         |      THEN concat(' A . ', o0, ' B . ', o1, ' C . ', o2, ' D . ', o3)
         |      ELSE concat(' A. ', o0, ' B. ', o1, ' C. ', o2, ' D. ', o3) END,
         |    CASE solv
         |      WHEN 0 THEN concat(' Solution The answer is ', ltr, ' because ', p5)
         |      WHEN 1 THEN concat(' Solution The correct answer is ', ltr, ' since ', p4)
         |      WHEN 2 THEN concat(' Solution option ', ltr, ' is right as ', p4)
         |      WHEN 3 THEN concat(' Solution ', ltr, '. ', p5)
         |      WHEN 4 THEN concat(' ✓ ', ltr)
         |      ELSE concat(' Mark ', CAST(1 + num % 3 AS VARCHAR), ' ', p3) END) AS fr
         |  FROM mqp)
         |, mqc AS (SELECT *, ${cleanSql("fr")} AS fx FROM mqf)
         |, mqs AS (SELECT *,
         |    CASE WHEN regexp_matches(fx, '\\s+(Mark|Solution)\\s+')
         |         THEN regexp_extract(fx, '^(.*?)\\s+(?:Mark|Solution)\\s+', 1) ELSE fx END AS qp,
         |    CASE WHEN regexp_matches(fx, '\\s+(Mark|Solution)\\s+')
         |         THEN regexp_extract(fx, '^.*?\\s+(?:Mark|Solution)\\s+(.*)$$', 1) ELSE '' END AS sp
         |  FROM mqc)
         |, mqx AS (SELECT *,
         |    trim(regexp_replace(CASE WHEN regexp_matches(qs0, '\\s+[A-D]\\.\\s+')
         |      THEN regexp_extract(qs0, '^(.*?)\\s+[A-D]\\.\\s+', 1) ELSE qs0 END,
         |      '\\s+', ' ', 'g')) AS question
         |  FROM (SELECT *, regexp_replace(qp, '^[0-9]+\\.?\\s*', '') AS qs0 FROM mqs))
         |, mqa AS (SELECT *,
         |    CASE WHEN sp = '' THEN NULL ELSE upper(coalesce(
         |      nullif(regexp_extract(trim(sp), '(?i)answer is ([A-D])', 1), ''),
         |      nullif(regexp_extract(trim(sp), '(?i)correct answer is ([A-D])', 1), ''),
         |      nullif(regexp_extract(trim(sp), '(?i)option ([A-D])', 1), ''),
         |      nullif(regexp_extract(trim(sp), '(?i)^([A-D])\\.', 1), ''))) END AS ans0,
         |    CASE WHEN sp = '' THEN NULL
         |         ELSE trim(regexp_replace(regexp_replace(trim(sp), '(?i)^solution\\s*', ''),
         |                   '\\s+', ' ', 'g')) END AS solution
         |  FROM mqx)
         |, mcqrows AS (SELECT doc_id, subject, year, url, nobj, q, num, has_diag, has_photo, solv,
         |    o0, o1, o2, o3, ltr, question,
         |    CASE WHEN ans0 IS NULL AND solv = 4 THEN ltr ELSE ans0 END AS answer, solution
         |  FROM mqa)""".stripMargin
  }

  /** Theory rows: tv = mix(h XOR num*0x517cc1b7); nParts = 2 + (tv>>>8)%2;
    * part 1 nests (i)/(ii) sub-subparts when (tv>>>12) is even; the
    * duplicate-number render at h%5==0 is parser-deduped (first wins, O2).
    */
  private val theoryRowsCte: String =
    s""", th0 AS (SELECT doc_id, subject, year, url, nobj, q,
       |    xor(hu, CAST(q * 1367130551 AS HUGEINT)) AS tx0
       |  FROM pcnt, LATERAL (SELECT unnest(generate_series(1, CAST(nth AS INT))) AS q) s)
       |${mixCte("th0", "tx0", "tu", "tg")}
       |, thw AS (SELECT th.*, w, wlen FROM (
       |    SELECT doc_id, subject, year, url, nobj, q, tu,
       |      2 + CAST((tu // 256) % 2 AS INT) AS nparts, (tu // 4096) % 2 = 0 AS nested
       |    FROM tg6) th JOIN wl ON wl.wdoc = th.doc_id)
       |, thr AS (SELECT doc_id, subject, year, url, nobj, q, nparts, nested,
       |    concat('Explain how ', ${phraseSql("tu", 1, 5)}) AS question,
       |    ${phraseSql("(tu // 65536)", 3, 4)} AS pq1,
       |    ${phraseSql("(tu // 65536)", 4, 4)} AS pq2,
       |    ${phraseSql("(tu // 65536)", 5, 4)} AS pq3,
       |    ${phraseSql("(tu // 16777216)", 7, 4)} AS ps1,
       |    ${phraseSql("(tu // 16777216)", 8, 4)} AS ps2,
       |    ${phraseSql("(tu // 16777216)", 9, 4)} AS ps3,
       |    ${phraseSql("(tu // 65536)", 3, 3)} AS na,
       |    ${phraseSql("(tu // 1048576)", 4, 3)} AS nb
       |  FROM thw)""".stripMargin

  private val subpartNames: Seq[String] =
    (1 to 3).flatMap { j =>
      Seq(s"subpart_${j}_question", s"subpart_${j}_solution", s"subpart_${j}_answer") ++
        Seq("a", "b").flatMap(ch => Seq(s"subpart_${j}_${ch}_question",
          s"subpart_${j}_${ch}_solution", s"subpart_${j}_${ch}_answer"))
    }

  private def theorySubpartExpr(name: String): String = {
    val parts = name.split("_") // subpart, j, [ch,] field
    val j = parts(1).toInt
    val (nested, field) = if (parts.length == 4) (Some(parts(2)), parts(3)) else (None, parts(2))
    nested match {
      case Some(ch) =>
        if (field == "question")
          s"CASE WHEN $j = 1 AND nested THEN ${if (ch == "a") "na" else "nb"} ELSE '' END"
        else "''"
      case None => field match {
        case "question" =>
          s"CASE WHEN $j <= nparts THEN (CASE WHEN $j = 1 AND nested THEN '' " +
            s"ELSE concat('Describe ', pq$j) END) ELSE '' END"
        case "solution" =>
          s"CASE WHEN $j <= nparts THEN concat('The answer involves ', ps$j) ELSE '' END"
        case _ => "''"
      }
    }
  }

  private val parseOracles: Map[String, String] = Map(
    // C2: every parsed question row — stem/answer/solution strings included
    "c2_parse_questions" ->
      s"""${Queries.FRONTIER_CTE}
         |$mcqRowsCte
         |$theoryRowsCte
         |SELECT url, 'objective' AS section, 'mcq' AS qtype, CAST(num AS INT) AS number,
         |  question, answer, solution,
         |  CAST(CASE WHEN has_diag THEN 1 + CASE WHEN has_photo THEN 1 ELSE 0 END
         |       ELSE 0 END AS INT) AS n_diagrams,
         |  0 AS n_subparts
         |FROM mcqrows
         |UNION ALL
         |SELECT url, 'theory' AS section, 'theory' AS qtype, CAST(q AS INT) AS number,
         |  question, CAST(NULL AS VARCHAR) AS answer, CAST(NULL AS VARCHAR) AS solution,
         |  0 AS n_diagrams, nparts AS n_subparts
         |FROM thr""".stripMargin,

    // F12/S9: the flattened CSV rows — dynamic option/subpart columns at the
    // batch universe's fan-out (max 3 parts, 2 nested: both occur at every
    // driver SF since each page draws them iid at 50%)
    "r2_flatten_csv" -> {
      val mcqSub = subpartNames.map(n => s"  CAST(NULL AS VARCHAR) AS $n").mkString(",\n")
      val thSub = subpartNames.map(n => s"  ${theorySubpartExpr(n)} AS $n").mkString(",\n")
      s"""${Queries.FRONTIER_CTE}
         |$mcqRowsCte
         |$theoryRowsCte
         |SELECT subject, year, url, CAST(q - 1 AS INT) AS pos,
         |  coalesce(answer, '') AS answer,
         |  CASE WHEN has_diag THEN concat('https://kuulchat.com/qns/fig%20',
         |      CAST(num AS VARCHAR), '%20diagram.png',
         |      CASE WHEN has_photo THEN concat('|/media/photo', CAST(num AS VARCHAR), '.png')
         |           ELSE '' END) ELSE '' END AS diagrams,
         |  CAST(num AS INT) AS number, question, coalesce(solution, '') AS solution,
         |  'objectives' AS type,
         |  o0 AS option_A, o1 AS option_B, o2 AS option_C,
         |  CASE WHEN solv = 4 THEN concat(o3, ' ✓ ', ltr) ELSE o3 END AS option_D,
         |$mcqSub
         |FROM mcqrows
         |UNION ALL
         |SELECT subject, year, url, CAST(nobj + q - 1 AS INT) AS pos,
         |  '' AS answer, '' AS diagrams, CAST(q AS INT) AS number, question, '' AS solution,
         |  'theory' AS type,
         |  CAST(NULL AS VARCHAR) AS option_A, CAST(NULL AS VARCHAR) AS option_B,
         |  CAST(NULL AS VARCHAR) AS option_C, CAST(NULL AS VARCHAR) AS option_D,
         |$thSub
         |FROM thr""".stripMargin
    })

  val oracles: Map[String, String] = parseOracles ++ Map(
    // A1/S8: per-batch objective/theory totals + the minted screenshot url
    // (pinned-clock cache buster, Restructure.PinnedMillis)
    "r1_restructured_docs" ->
      s"""${Queries.FRONTIER_CTE}
         |$pagesCte
         |SELECT subject, year, CAST(sum(nobj) AS BIGINT) AS n_objectives,
         |  CAST(sum(nth) AS BIGINT) AS n_theory,
         |  concat('https://ik.imagekit.io/graft/screenshots/', subject, '/',
         |         cast(year AS varchar), '/', subject, '_', cast(year AS varchar),
         |         '.png?updatedAt=1735689600000') AS page_screenshot
         |FROM pcnt GROUP BY subject, year""".stripMargin,

    // S5-S7: raw-feed scan-back item counts by type — the round-trip must
    // conserve exactly the parsed question multiset
    "r6_raw_feed_roundtrip" ->
      s"""${Queries.FRONTIER_CTE}
         |$pagesCte
         |SELECT subject, year, 'mcq' AS type, CAST(sum(nobj) AS BIGINT) AS n_items
         |FROM pcnt GROUP BY subject, year
         |UNION ALL
         |SELECT subject, year, 'theory' AS type, CAST(sum(nth) AS BIGINT) AS n_items
         |FROM pcnt GROUP BY subject, year""".stripMargin,

    // S12/J3/A3: the full image manifest — url, double-quoted local path,
    // and the downloader's first-occurrence order key
    "r4_image_manifest" ->
      s"""${Queries.FRONTIER_CTE}
         |$mcqCte
         |$imgsCte
         |SELECT subject, year, image_url, local_path,
         |  0 AS ord_rank, min(url) AS ord_url, CAST(min(pos) AS INT) AS ord_pos
         |FROM imgs GROUP BY subject, year, image_url, local_path""".stripMargin,

    // S10/A2: the metadata counter suite. Zero counters render as NULL
    // (the reference dict()-drops never-incremented type keys); theory
    // questions carry neither diagrams nor top-level solutions (subpart
    // answers live in the J1-joined subparts), so those two are NULL.
    "r3_metadata" ->
      s"""${Queries.FRONTIER_CTE}
         |$mcqCte
         |$imgsCte
         |, byq AS (
         |  SELECT subject, year,
         |    CAST(count(*) AS BIGINT) AS objective_questions,
         |    CAST(sum(CASE WHEN has_diag THEN 1 ELSE 0 END) AS BIGINT) AS d_obj,
         |    CAST(sum(CASE WHEN solv != 4 THEN 1 ELSE 0 END) AS BIGINT) AS s_obj
         |  FROM mq GROUP BY subject, year)
         |, byp AS (SELECT subject, year, CAST(sum(nth) AS BIGINT) AS theory_questions
         |          FROM pcnt GROUP BY subject, year)
         |, byi AS (SELECT subject, year, CAST(count(DISTINCT image_url) AS BIGINT) AS n_img
         |          FROM imgs GROUP BY subject, year)
         |SELECT b.subject, b.year, '2025-01-01T00:00:00' AS extraction_date,
         |  b.objective_questions + p.theory_questions AS total_questions,
         |  b.objective_questions, p.theory_questions,
         |  CASE WHEN b.d_obj > 0 THEN b.d_obj END AS diagrams_objectives,
         |  CAST(NULL AS BIGINT) AS diagrams_theory,
         |  CASE WHEN b.s_obj > 0 THEN b.s_obj END AS solutions_objectives,
         |  CAST(NULL AS BIGINT) AS solutions_theory,
         |  coalesce(i.n_img, 0) AS images_expected,
         |  coalesce(i.n_img, 0) AS images_downloaded,
         |  CAST(0 AS BIGINT) AS failed_downloads,
         |  concat('{"questions_json":"', b.subject, '_', cast(b.year AS varchar),
         |         '.json","questions_csv":"', b.subject, '_', cast(b.year AS varchar),
         |         '.csv","images":"images/","reports":"reports/"}') AS file_structure_json,
         |  '2.0' AS format_version
         |FROM byq b JOIN byp p USING (subject, year)
         |LEFT JOIN byi i USING (subject, year)""".stripMargin)
}
