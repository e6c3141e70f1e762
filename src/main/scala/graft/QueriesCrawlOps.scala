package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Extract, QuestionParser, TextAnalysis}
import graft.operators.{BatchSink, Dedup, Enrichment, Multimodal, Politeness, Restructure, Similarity}
import graft.sources.PagesGen

/** Crawl-op + sketch queries. The html-parsing family (c2, r1–r6, w1) is
  * rows-only — no SQL engine can re-run the CPython-parity page parse, so
  * their semantic verification lives in `sbt -batch test` (golden fixtures
  * vs the CPython oracle, engine invariants, strategy-equivalence). The
  * whole SKETCH family (m1/m2/m4/n2/n3/t4) carries full DuckDB oracles:
  * every sketch hash is the SqlHash 61-bit mul-mod family
  * (graft.util.SqlHash), chosen so the oracle can regenerate signatures,
  * band keys, LSH buckets and IVF cells EXACTLY in SQL (HUGEINT for the
  * 122-bit products) — candidate sets, not just verified outputs, are
  * cross-engine-checked. The decode STUB's byte arithmetic is deterministic
  * and SQL-expressible too, so mm1/mm2 pin the real contract around the
  * stub; c3's output is an invariant verdict with a SQL-expressible
  * expected value.
  */
object QueriesCrawlOps {
  import Queries.Q

  /** SQL fragment: the SqlHash.hashToken 61-bit hash of string column/expr
    * `tok` — dual char-polynomial folds combined, one mul-mod mix.
    */
  private def sqlTokHash(tok: String): String =
    s"""CAST(((
       |      (list_reduce(list_prepend(0::BIGINT, list_transform(string_split($tok, ''),
       |          ch -> unicode(ch)::BIGINT)), (a, c) -> (a * 31 + c) % 2147483647) * 2147483648
       |       + list_reduce(list_prepend(0::BIGINT, list_transform(string_split($tok, ''),
       |          ch -> unicode(ch)::BIGINT)), (a, c) -> (a * 37 + c) % 2147483629))::HUGEINT
       |      * 1181783497276652981) % 2305843009213693951) AS BIGINT)""".stripMargin

  /** SQL fragment: SqlHash.hpComponent for packed-key expression `key`
    * (two mul-mod rounds, then the [-1,1) map).
    */
  private def sqlHp(key: String): String =
    s"""(CAST((((($key)::HUGEINT * 1181783497276652981) % 2305843009213693951)
       |  * 1476695655912598219) % 2305843009213693951 % 100000 AS DOUBLE)
       |  / 50000.0 - 1.0)""".stripMargin

  /** SQL fragment: sequential-fold dot product of `embedding` with the
    * (tableExpr, planeExpr) hyperplane — the exact double arithmetic of
    * Similarity.bucketOf (prepend-0 fold = the loop's running sum).
    */
  private def sqlPlaneDot(tableExpr: String, planeExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)
       |      * ${sqlHp(s"($tableExpr) * 1099511627776 + ($planeExpr) * 1048576 + (i - 1)")})),
       |  (a, b) -> a + b)""".stripMargin

  /** SQL fragment (CTE list): per-(vec_id, table) LSH bucket over 4 tables ×
    * 4 planes — the n2/m4 published configuration.
    */
  private val sqlLshBuckets: String =
    s"""dots AS (
       |  SELECT vec_id, rt.t AS t, rp.p AS p, ${sqlPlaneDot("rt.t", "rp.p")} AS dot
       |  FROM embeddings CROSS JOIN range(4) rt(t) CROSS JOIN range(4) rp(p)),
       |bkt AS (
       |  SELECT vec_id, t,
       |    CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  /** DuckDB twins. Multimodal family: the asset model they encode is
    * Multimodal.assets/decodeStub/frameCount verbatim: payload = UTF-8 text
    * bytes (`strlen` = byte length in DuckDB), kind = doc_id mod 3, width =
    * 64 + (doc_id%16)·8, video frames = 1 + bytes%32, frame i starts at
    * (i·4) mod bytes and takes ≤16 bytes. Sketch family: line-for-line SQL
    * twins of the SqlHash-based operators (see object doc).
    */
  val oracles: Map[String, String] = Map(
    // t4: rolling fingerprint — nested char/token polynomial folds, every
    // intermediate < 2^62 (the same arithmetic as TextAnalysis.fingerprintHof)
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text, ' '), tok ->
        |    (list_reduce(list_prepend(0::BIGINT, list_transform(string_split(tok, ''),
        |        ch -> unicode(ch)::BIGINT)), (a, c) -> (a * 31 + c) % 2147483647) * 2147483648
        |     + list_reduce(list_prepend(0::BIGINT, list_transform(string_split(tok, ''),
        |        ch -> unicode(ch)::BIGINT)), (a, c) -> (a * 37 + c) % 2147483629)) % 1000000007)),
        |    (acc, h) -> (acc * 131 + h) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin,

    // m2: 61-bit SimHash — per-token hash, per-bit vote sums, 4×16-bit band
    // candidate join, exact hamming verify
    "m2_simhash_pairs" ->
      s"""WITH th AS (
         |  SELECT doc_id, ${sqlTokHash("tok")} AS h
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)),
         |bits AS (
         |  SELECT doc_id, r.k, sum(CASE WHEN (h >> r.k) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM th CROSS JOIN range(61) r(k) GROUP BY doc_id, r.k),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, simhash, rb.b AS band, (simhash >> (rb.b * 16)) & 65535 AS band_key
         |  FROM sig CROSS JOIN range(4) rb(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |         a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 6""".stripMargin,

    // m1: MinHash signatures (32 seeded minima over 2-gram shingles), 16
    // 2-row band keys, candidate join, exact token-set Jaccard verify
    "m1_minhash_lsh" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         |sh AS (
         |  SELECT doc_id, concat_ws(' ', toks[s.i + 1], toks[s.i + 2]) AS shingle
         |  FROM tk, LATERAL (SELECT unnest(generate_series(0, greatest(len(toks) - 2, 0))) AS i) s),
         |hs AS (
         |  SELECT doc_id, ${sqlTokHash("shingle")} AS base FROM sh),
         |mh AS (
         |  SELECT doc_id, rj.j AS j,
         |    min(CAST(((((2 * rj.j + 1)::HUGEINT * 1476695655912598219) % 2305843009213693951) * base
         |              + ((rj.j + 1)::HUGEINT * 1131312115126579579) % 2305843009213693951)
         |        % 2305843009213693951 AS BIGINT)) AS v
         |  FROM hs CROSS JOIN range(32) rj(j) GROUP BY doc_id, rj.j),
         |bd AS (
         |  SELECT a.doc_id, a.j // 2 AS band,
         |    CAST((a.v::HUGEINT * 1476695655912598219 + b.v) % 2305843009213693951 AS BIGINT) AS band_key
         |  FROM mh a JOIN mh b ON a.doc_id = b.doc_id AND b.j = a.j + 1
         |  WHERE a.j % 2 = 0),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bd a JOIN bd b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |ts AS (
         |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS tset FROM documents)
         |SELECT c.id_a, c.id_b,
         |  round(len(list_intersect(ta.tset, tb.tset)) * 1.0 /
         |        len(list_distinct(list_concat(ta.tset, tb.tset))), 4) AS jaccard
         |FROM cand c JOIN ts ta ON ta.doc_id = c.id_a JOIN ts tb ON tb.doc_id = c.id_b
         |WHERE round(len(list_intersect(ta.tset, tb.tset)) * 1.0 /
         |            len(list_distinct(list_concat(ta.tset, tb.tset))), 4) >= 0.3""".stripMargin,

    // n2: LSH ANN top-3 — query side multi-probes (base + 1-bit flips),
    // corpus side keeps its base bucket, exact cosine within probed buckets,
    // best-of across 4 tables
    "n2_ann_lsh" ->
      s"""WITH $sqlLshBuckets,
         |qp AS (
         |  SELECT vec_id AS query_id, t,
         |    xor(bucket, CASE WHEN f.f = 0 THEN 0 ELSE (1::BIGINT << (f.f - 1)) END) AS bucket
         |  FROM bkt CROSS JOIN range(5) f(f) WHERE vec_id < 5),
         |cb AS (SELECT vec_id AS neighbor_id, t, bucket FROM bkt WHERE vec_id >= 5),
         |met AS (
         |  SELECT DISTINCT q.query_id, c.neighbor_id,
         |    round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                 CAST(ce.embedding AS DOUBLE[])), 4) AS cos
         |  FROM qp q JOIN cb c ON q.t = c.t AND q.bucket = c.bucket
         |  JOIN embeddings qe ON qe.vec_id = q.query_id
         |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id)
         |SELECT query_id, rnk, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM met)
         |WHERE rnk <= 3""".stripMargin,

    // m4: LSH-blocked near-dup — one side probes, the other keeps base,
    // cosine >= 0.45 verify, distinct across tables
    "m4_embedding_neardup_lsh" ->
      s"""WITH $sqlLshBuckets,
         |lp AS (
         |  SELECT vec_id AS id_a, t,
         |    xor(bucket, CASE WHEN f.f = 0 THEN 0 ELSE (1::BIGINT << (f.f - 1)) END) AS bucket
         |  FROM bkt CROSS JOIN range(5) f(f)),
         |met AS (
         |  SELECT DISTINCT l.id_a, r.vec_id AS id_b,
         |    round(list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
         |                                 CAST(be.embedding AS DOUBLE[])), 4) AS cos
         |  FROM lp l JOIN bkt r ON l.t = r.t AND l.bucket = r.bucket AND l.id_a < r.vec_id
         |  JOIN embeddings ae ON ae.vec_id = l.id_a
         |  JOIN embeddings be ON be.vec_id = r.vec_id)
         |SELECT id_a, id_b, cos FROM met WHERE cos >= 0.45""".stripMargin,

    // n3: IVF ANN top-3 — 16 deterministic centroids (hpComponent key space
    // 65536+c), corpus indexed under its top-2 cells, queries probe their
    // top-8, exact cosine within met cells
    "n3_ann_ivf" ->
      s"""WITH sc AS (
         |  SELECT vec_id, rc.c AS cell, ${sqlPlaneDot("65536 + rc.c", "0")} AS dot,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |      (a, b) -> a + b) AS nrm
         |  FROM embeddings CROSS JOIN range(16) rc(c)),
         |rankd AS (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY CASE WHEN nrm > 0 THEN dot / sqrt(nrm) ELSE 0 END DESC, cell) AS rk
         |  FROM sc),
         |cb AS (SELECT vec_id AS neighbor_id, cell FROM rankd WHERE rk <= 2 AND vec_id >= 5),
         |qb AS (SELECT vec_id AS query_id, cell FROM rankd WHERE rk <= 8 AND vec_id < 5),
         |met AS (
         |  SELECT DISTINCT q.query_id, c.neighbor_id,
         |    round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                 CAST(ce.embedding AS DOUBLE[])), 4) AS cos
         |  FROM qb q JOIN cb c ON q.cell = c.cell
         |  JOIN embeddings qe ON qe.vec_id = q.query_id
         |  JOIN embeddings ce ON ce.vec_id = c.neighbor_id)
         |SELECT query_id, rnk, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM met)
         |WHERE rnk <= 3""".stripMargin,

    // r5: the enrichment round-trip's OUTCOME ACCOUNTING is deterministic —
    // the query assigns batch fates by year % 4 (0 → already-current,
    // 2 → json deleted → skip, 1/3 → stale/missing url → update), and the
    // batch set is the frontier universe's distinct (subject, year). The
    // oracle re-derives both in SQL, pinning the scan→classify→enrich
    // contract (mm1/mm2-style: the arithmetic around the file round-trip,
    // not the file I/O itself): a batch mis-scanned, mis-classified, or
    // dropped by enrichMetadataFile flips a count red.
    "r5_enrich_outcomes" ->
      s"""${Queries.FRONTIER_CTE}
         |, batches AS (SELECT DISTINCT subject, year FROM frontier)
         |SELECT outcome, CAST(count(*) AS BIGINT) AS n FROM (
         |  SELECT CASE CAST(year % 4 AS INT) WHEN 0 THEN 'current'
         |              WHEN 2 THEN 'skip' ELSE 'update' END AS outcome
         |  FROM batches) GROUP BY outcome""".stripMargin,

    // w1: the screenshot workflow's batch tally over the injectable capture
    // stub (always succeeds, 1 attempt — browser I/O out of scope, SURVEY
    // §0): every counter is a function of the batch count, re-derived from
    // the frontier universe. Pins the capture→upload→enrich composition's
    // accounting: a skipped/failed/retried batch or a lost enrichment makes
    // a counter diverge.
    "w1_screenshot_workflow" ->
      s"""${Queries.FRONTIER_CTE}
         |, b AS (SELECT CAST(count(*) AS BIGINT) AS nb
         |        FROM (SELECT DISTINCT subject, year FROM frontier))
         |SELECT nb AS n_items, nb AS successful, CAST(0 AS BIGINT) AS failed,
         |  CAST(0 AS BIGINT) AS skipped_items, nb AS capture_attempts,
         |  nb AS upload_attempts, nb AS enriched_batches
         |FROM b""".stripMargin,

    // c3's output IS the invariant's verdict: n_mismatch counts pages whose
    // html-extracted text differs from the golden `text` column, and pages
    // are one per documents row (PagesGen.pages, factor 1). The oracle pins
    // the expected verdict (0 mismatches over exactly count(documents)
    // pages), so a broken extraction flips the driver compare red — the
    // same style as mm1/mm2's arithmetic-contract oracles.
    "c3_text_invariant" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_pages,
        |       CAST(0 AS BIGINT) AS n_mismatch
        |FROM documents""".stripMargin,
    "mm1_multimodal_features" ->
      """SELECT kind,
        |  CAST(count(*) AS BIGINT) AS n_assets,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  round(avg(64 + (doc_id % 16) * 8), 2) AS avg_width,
        |  CAST(sum(CASE WHEN kind = 'video'
        |           THEN 1 + (strlen(text) % 32) ELSE 1 END) AS BIGINT) AS total_frames
        |FROM (SELECT doc_id, text,
        |        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |             WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |      FROM documents)
        |GROUP BY kind""".stripMargin,
    "mm2_frame_sample" ->
      """WITH v AS (SELECT doc_id, strlen(text) AS len FROM documents
        |           WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id,
        |    least(((i * 4) % greatest(len, 1)) + 16, len)
        |      - ((i * 4) % greatest(len, 1)) AS nb
        |  FROM v, LATERAL (SELECT unnest(generate_series(0, (1 + (len % 32)) - 1)) AS i) s
        |)
        |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
        |  CAST(count(*) AS BIGINT) AS total_frames,
        |  CAST(sum(nb) AS BIGINT) AS total_frame_bytes
        |FROM fr""".stripMargin)

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The queries that are artifact SINK round-trips, not scan queries: they
    * write + re-read a real batch tree (by design — that IS the operator).
    * Bench reports them separately so file I/O doesn't read as scan cost.
    */
  val sinkQueries: Set[String] =
    Set("r5_enrich_outcomes", "r6_raw_feed_roundtrip", "w1_screenshot_workflow")

  /** One session-scoped scratch root for the sink queries (VERDICT r02 #5):
    * a per-query subdir is WIPED on (re-)invocation — warmup + timed bench
    * passes reuse one tree instead of leaking a fresh temp dir each — and
    * the whole root is removed at JVM exit.
    */
  private object Scratch {
    private def deleteTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(x => java.nio.file.Files.deleteIfExists(x))
    private lazy val root: java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory("graft-sink-scratch")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteTree(p), "graft-scratch-cleanup"))
      p
    }
    def dir(name: String): String = {
      val d = root.resolve(name)
      deleteTree(d)
      java.nio.file.Files.createDirectories(d)
      d.toString
    }
  }

  val queries: Map[String, Q] = Map(
    // one full politeness wave over the real seed frontier (dedup-free wave 0)
    "c1_politeness_wave" -> ((s, d) => {
      val frontier = CrawlEngine.seedFrontier(s, d)
      val b = Politeness.budgetTopK(frontier, Politeness.robotsFixture(s).toDF(), 60000L)
      b.fetchNow.select(col("host"), col("host_rank"), col("url"))
    }),

    // full-page parse → flattened questions (the extraction hot path)
    "c2_parse_questions" -> ((s, d) => {
      val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
      PagesGen.pages(s, d).toDF()
        .withColumn("p", parse(col("html")))
        .select(col("url"), explode(col("p.questions")).as("q"))
        .select(col("url"), col("q.section"), col("q.qtype"), col("q.number"),
          col("q.question"), col("q.answer"), col("q.solution"),
          size(col("q.diagrams")).as("n_diagrams"),
          size(col("q.subparts")).as("n_subparts"))
    }),

    // the byte-identical invariant, surfaced as a query: per-page match flag
    // aggregated — n_mismatch MUST be 0
    "c3_text_invariant" -> ((s, d) => {
      val extractText = udf((html: Array[Byte]) => Extract.pageText(html))
      PagesGen.pages(s, d).toDF()
        .select(when(extractText(col("html")) === col("text"), 0L).otherwise(1L)
          .as("mismatch"))
        .agg(count(lit(1)).as("n_pages"), sum(col("mismatch")).as("n_mismatch"))
    }),

    // MinHash+LSH near-dup candidate pairs, Jaccard-verified
    "m1_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), threshold = 0.3)),

    // SimHash near-dup pairs (bucketed hamming)
    "m2_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 6)),

    // LSH-bucketed approximate nearest neighbors — corpus-sized planes +
    // 1-flip multi-probe (the SimilaritySpec recall@3>=0.8 configuration)
    "n2_ann_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.annTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), 3,
        nPlanes = 4)
    }),

    // embedding near-dup blocked by LSH bucket (the label-free 100-TB path)
    "m4_embedding_neardup_lsh" -> ((s, d) =>
      Similarity.cosineNearDupLsh(t(s, d, "embeddings"), 0.45, nPlanes = 4)),

    // IVF-cell approximate nearest neighbors (coarse-quantizer scale path;
    // recall-gated params: 2-cell corpus assignment, 8-cell probe)
    "n3_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), 3,
        nCells = 16, nProbe = 8, corpusAssign = 2)
    }),

    // document fingerprints (rolling hash)
    "t4_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprints(t(s, d, "documents"))),

    // multimodal decode-stub pipeline: binary payloads → features → summary
    "mm1_multimodal_features" -> ((s, d) => Multimodal.featureSummary(s, d)),

    // multimodal frame sampling: per-video frame rows → per-doc counts,
    // reconciled against the decoder's frame count downstream
    "mm2_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.assets(s, d)).toDF()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"),
          sum(col("n_bytes")).as("frame_bytes"))
        .agg(count(lit(1)).as("n_videos"), sum(col("n_frames")).as("total_frames"),
          sum(col("frame_bytes")).as("total_frame_bytes"))),

    // A1/S8: restructured per-batch docs (objectives/theory arrays)
    "r1_restructured_docs" -> ((s, d) =>
      Restructure.restructuredDocs(parsedQuestions(s, d, materialize = false))
        .select(col("subject"), col("year"), size(col("objectives")).as("n_objectives"),
          size(col("theory")).as("n_theory"), col("page_screenshot"))),

    // F12/S9: flattened CSV rows with the reference's dynamic header order
    "r2_flatten_csv" -> ((s, d) => Restructure.flattenCsv(parsedQuestions(s, d))),

    // S10/A2: per-batch metadata docs (format_version 2.0) — projected to
    // flat columns: the driver's pandas compare cannot sort nested structs
    // (CORRECTNESS_r01 r3 crash); the full nested doc is exercised by
    // RestructureSpec / BatchSinkSpec goldens.
    "r3_metadata" -> ((s, d) => Restructure.metadata(parsedQuestions(s, d, materialize = false))
      .select(col("subject"), col("year"), col("extraction_date"),
        col("spider_stats.total_questions").as("total_questions"),
        col("spider_stats.objective_questions").as("objective_questions"),
        col("spider_stats.theory_questions").as("theory_questions"),
        col("spider_stats.questions_with_diagrams.objectives").as("diagrams_objectives"),
        col("spider_stats.questions_with_diagrams.theory").as("diagrams_theory"),
        col("spider_stats.questions_with_solutions.objectives").as("solutions_objectives"),
        col("spider_stats.questions_with_solutions.theory").as("solutions_theory"),
        col("spider_stats.image_download_stats.total_images_expected").as("images_expected"),
        col("spider_stats.image_download_stats.downloaded_images_count").as("images_downloaded"),
        col("spider_stats.image_download_stats.failed_downloads").as("failed_downloads"),
        to_json(col("file_structure")).as("file_structure_json"),
        col("format_version"))),

    // S12/J3/A3: image manifest with deterministic local paths
    "r4_image_manifest" -> ((s, d) =>
      Restructure.imageManifest(parsedQuestions(s, d, materialize = false))),

    // J2/A6: metadata enrichment outcomes — the REAL round-trip: write the
    // batch artifact tree, put batches into all three states (enriched =
    // current, stale url = update-replace, untouched = update-add, missing
    // JSON = skip), scan the files back, classify per
    // update_all_metadata.py:104-133.
    "r5_enrich_outcomes" -> ((s, d) => {
      val out = Scratch.dir("r5")
      BatchSink.writeBatchOutputs(s, parsedQuestions(s, d), out)
      Enrichment.scanBatchState(s, out).select("subject", "year", "screenshot_url")
        .collect().foreach { r =>
          val name = s"${r.getString(0)}_${r.getInt(1)}"
          val meta = s"$out/$name/${name}_metadata.json"
          r.getInt(1) % 4 match {
            case 0 => Enrichment.enrichMetadataFile(meta, r.getString(2)) // current
            case 1 => Enrichment.enrichMetadataFile(meta, "https://stale.example/old.png") // update
            case 2 => java.nio.file.Files.delete(
              java.nio.file.Paths.get(s"$out/$name/$name.json")) // skip
            case _ => () // metadata lacks the url -> update (add new)
          }
        }
      Enrichment.classify(Enrichment.scanBatchState(s, out))
        .groupBy(col("outcome")).agg(count(lit(1)).as("n"))
    }),

    // S13/S14/A7: composed screenshot workflow with batch tally
    "w1_screenshot_workflow" -> ((s, d) => workflowQuery(s, d)),

    // S5/S6/S7 literal: raw Scrapy feed write + scan-back round-trip —
    // per-batch item counts by type from the re-read temp json.
    // One multiLine json read over ALL feed files (guide §6 small-files /
    // §2.4): the per-file spark.read.json formulation ran one schema-
    // inference job per batch plus a 20-way union (40 Exchanges in the
    // plan); reading the file set in a single scan with the batch key
    // recovered from the file name computes the identical (subject, year,
    // type, n_items) rows in one job. readRawFeed stays the per-file S7
    // operator (tests, BatchSinkSpec).
    "r6_raw_feed_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("r6")
      val feeds = BatchSink.writeRawFeeds(s, parsedQuestions(s, d), out)
      // only `type` is aggregated: an explicit schema skips the inference
      // pass; the batch key is the file name's last '_' split, as before
      s.read.option("multiLine", "true").schema("type STRING")
        .json(feeds.map(_._1): _*)
        .select(col("type"),
          regexp_extract(input_file_name(), "temp_(.*)_(\\d+)\\.json$", 1)
            .as("subject"),
          regexp_extract(input_file_name(), "temp_(.*)_(\\d+)\\.json$", 2)
            .cast("int").as("year"))
        .groupBy(col("subject"), col("year"), col("type"))
        .agg(count(lit(1)).as("n_items"))
        .select(col("subject"), col("year"), col("type"), col("n_items"))
    })
  )

  /** S13/S14/A7: the composed screenshot workflow over a real artifact tree —
    * capture → upload → enrich per batch, per-stage retry accounting, batch
    * tally (screenshot_workflow.py:87-190,283-296).
    */
  private def workflowQuery(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ScreenshotWorkflow
    val out = Scratch.dir("w1")
    val q = parsedQuestions(s, d)
    val dirs = BatchSink.writeBatchOutputs(s, q, out)
    // batch items from the just-written artifact dirs (the reference's
    // workflow walks the output tree, screenshot_workflow.py:283-296) —
    // the separate metadata job this replaced recomputed the same
    // (subject, year) set a sixth time per invocation. Dir names are
    // `<subject>_<year>` with subject = everything before the LAST '_'
    // (X10 name parse), already sorted by writeBatchOutputs.
    val items = dirs.map { p =>
      val name = java.nio.file.Paths.get(p).getFileName.toString
      val cut = name.lastIndexOf('_')
      val (subject, year) = (name.substring(0, cut), name.substring(cut + 1).toInt)
      ScreenshotWorkflow.Item(subject, year,
        s"https://kuulchat.com/bece/questions/$subject-$year/")
    }.sortBy(i => (i.subject, i.year))
    val results = ScreenshotWorkflow.processBatch(s, items.toSeq, out)
    ScreenshotWorkflow.batchTally(results)
  }

  /** Questions parsed straight from the synthesized pages (shared input for
    * the restructure-family queries).
    *
    * `materialize` (guide §1.2/§5): the SINK queries run SEVERAL actions
    * over this frame (flattenCsv's schema agg + main pass; metadata's
    * self-join of two aggregates; writeBatchOutputs' four collects) — the
    * w1 invocation measured ~9 full page-parse passes. localCheckpoint
    * bounds that to one. It is invocation-scoped — each call re-parses from
    * the parquet inputs, nothing is keyed on the plan across bench passes.
    * The single-action queries (r1, r3, r4) skip it: for them the
    * materialize/read-back round-trip costs more than the one or two
    * in-plan parse subtrees it saves (measured +0.1 s each).
    */
  private def parsedQuestions(s: SparkSession, d: String,
                              materialize: Boolean = true): DataFrame = {
    val parse = udf((html: Array[Byte]) => QuestionParser.parsePage(html))
    val base = PagesGen.pages(s, d).toDF()
      .withColumn("p", parse(col("html")))
      .select(col("url"),
        regexp_extract(col("url"), "questions/([a-z-]+)-", 1).as("seed_subject"),
        regexp_extract(col("url"), "-(\\d+)/c", 1).cast("int").as("seed_year"),
        posexplode(col("p.questions")).as(Seq("pos", "q")))
      .select(col("url"), col("seed_subject"), col("seed_year"), col("pos"),
        col("q.section"), col("q.qtype"), col("q.number"), col("q.question"),
        col("q.options"), col("q.subparts"), col("q.diagrams"),
        col("q.answer"), col("q.solution"), col("q.answer_after_solution"))
    if (materialize) base.localCheckpoint() else base
  }
}
