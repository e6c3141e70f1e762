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
    ", fd AS (SELECT subject, year, url, page_idx, CAST(doc_id AS HUGEINT) AS x0 FROM frontier)\n" +
      mixCte("fd", "x0", "hu", "ph") + "\n" +
      s""", pcnt AS (SELECT subject, year, url, page_idx, hu,
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
      s""", mq0 AS (SELECT subject, year, url, page_idx, hu, q,
         |    ((hu + CAST(page_idx * 10 + q AS HUGEINT)) % $M) AS qx0,
         |    CAST(page_idx * 10 + q AS BIGINT) AS num
         |  FROM pcnt, LATERAL (SELECT unnest(generate_series(1, CAST(nobj AS INT))) AS q) s)
         |""".stripMargin +
      mixCte("mq0", "qx0", "vu", "qh") + "\n" +
      """, mq AS (SELECT subject, year, url, page_idx, q, num,
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

  val oracles: Map[String, String] = Map(
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
