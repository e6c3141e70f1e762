package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity}

/** Text-analysis / dedup / similarity queries with DuckDB oracles. */
object QueriesText {
  import Queries.Q

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val queries: Map[String, Q] = Map(
    // exact dedup: canonical id + copy count per distinct text
    "d1_exact_dedup" -> ((s, d) => Dedup.exact(t(s, d, "documents"))),

    // blocked n-gram Jaccard near-dup pairs (two offset length bands).
    // The hot-block cap is ON (VERDICT r03 #8): 1000 is >11× the largest
    // sf0.1 block (87 rows), so the oracle result is provably unchanged
    // (0 dropped — asserted in SimilaritySpec) while the configuration
    // benched and oracled is the 100-TB-safe one.
    "d2_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(t(s, d, "documents"), threshold = 0.3,
        maxBlock = Some(1000))),

    // token counting (whitespace)
    "t1_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    // quality features
    "t2_quality_features" -> ((s, d) =>
      TextAnalysis.qualityFeatures(t(s, d, "documents"))),

    // language-ID marker scores (portable slice)
    "t3_langid_scores" -> ((s, d) =>
      TextAnalysis.langIdFeatures(t(s, d, "documents"))
        .select(col("doc_id"), col("score_en"), col("score_de"),
          col("score_fr"), col("score_es"))),

    // language guess: argmax over the marker scores (Spark: greatest over
    // (score, lang) structs; DuckDB twin: list_sort of the same structs)
    "t5_langid_guess" -> ((s, d) =>
      TextAnalysis.langIdFeatures(t(s, d, "documents"))
        .groupBy(col("lang_guess")).agg(count(lit(1)).as("n_docs"))),

    // brute-force cosine top-3 neighbors for probe vectors
    "n1_knn_bruteforce" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), 3)
    }),

    // embedding cosine near-dup pairs within label blocks. Threshold 0.45:
    // the synthetic embeddings are near-orthogonal (max same-label cosine
    // ≈0.51), so a conventional 0.9 never fires — this keeps the operator
    // path exercised with real rows (r01 matched on 0 rows both sides);
    // semantics at a production threshold are pinned by SimilaritySpec.
    "m3_embedding_neardup" -> ((s, d) =>
      Similarity.cosineNearDup(t(s, d, "embeddings"), 0.45))
  )

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "d2_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, source, length(text) AS len,
        |         list_distinct(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |banded AS (
        |  SELECT doc_id, source, tok, 0 AS band, len // 64 AS len_band FROM tok
        |  UNION ALL
        |  SELECT doc_id, source, tok, 1 AS band, (len + 32) // 64 AS len_band FROM tok)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.tok, b.tok)) * 1.0 /
        |        len(list_distinct(list_concat(a.tok, b.tok))), 4) AS jaccard
        |FROM banded a JOIN banded b
        |  ON a.source = b.source AND a.band = b.band AND a.len_band = b.len_band
        |     AND a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.tok, b.tok)) * 1.0 /
        |            len(list_distinct(list_concat(a.tok, b.tok))), 4) >= 0.3"""
        .stripMargin,
    "t1_token_count" ->
      "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
    "t2_quality_features" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_text,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        |  round(len(list_distinct(string_split(text, ' '))) * 1.0
        |        / len(string_split(text, ' ')), 4) AS distinct_ratio,
        |  round(length(text) * 1.0 / len(string_split(text, ' ')), 4) AS mean_token_len,
        |  (length(text) - length(replace(text, ' the ', ''))) // 5
        |  + (length(text) - length(replace(text, ' a ', ''))) // 3
        |  + (length(text) - length(replace(text, ' of ', ''))) // 4
        |  + (length(text) - length(replace(text, ' and ', ''))) // 5
        |  + (length(text) - length(replace(text, ' to ', ''))) // 4 AS stopword_hits
        |FROM documents""".stripMargin,
    "t3_langid_scores" ->
      """SELECT doc_id,
        |  (length(text) - length(replace(text, ' the ', ''))) // 5
        |    + (length(text) - length(replace(text, ' and ', ''))) // 5 AS score_en,
        |  (length(text) - length(replace(text, ' der ', ''))) // 5
        |    + (length(text) - length(replace(text, ' und ', ''))) // 5 AS score_de,
        |  (length(text) - length(replace(text, ' le ', ''))) // 4
        |    + (length(text) - length(replace(text, ' et ', ''))) // 4 AS score_fr,
        |  (length(text) - length(replace(text, ' el ', ''))) // 4
        |    + (length(text) - length(replace(text, ' y ', ''))) // 3 AS score_es
        |FROM documents""".stripMargin,
    "t5_langid_guess" ->
      """WITH scores AS (
        |  SELECT doc_id,
        |    (length(text) - length(replace(text, ' the ', ''))) // 5
        |      + (length(text) - length(replace(text, ' and ', ''))) // 5 AS score_en,
        |    (length(text) - length(replace(text, ' der ', ''))) // 5
        |      + (length(text) - length(replace(text, ' und ', ''))) // 5 AS score_de,
        |    (length(text) - length(replace(text, ' le ', ''))) // 4
        |      + (length(text) - length(replace(text, ' et ', ''))) // 4 AS score_fr,
        |    (length(text) - length(replace(text, ' el ', ''))) // 4
        |      + (length(text) - length(replace(text, ' y ', ''))) // 3 AS score_es
        |  FROM documents)
        |SELECT lang_guess, count(*) AS n_docs FROM (
        |  SELECT list_sort([
        |      {'s': score_en, 'l': 'en'}, {'s': score_de, 'l': 'de'},
        |      {'s': score_fr, 'l': 'fr'}, {'s': score_es, 'l': 'es'}])[-1].l
        |    AS lang_guess
        |  FROM scores)
        |GROUP BY 1""".stripMargin,
    "n1_knn_bruteforce" ->
      """SELECT query_id, rnk, neighbor_id, cos FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                 CAST(c.embedding AS DOUBLE[])), 4) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(c.embedding AS DOUBLE[])), 4) DESC,
        |               c.vec_id) AS rnk
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q,
        |       (SELECT * FROM embeddings WHERE vec_id >= 5) c)
        |WHERE rnk <= 3""".stripMargin,
    "m3_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.45"""
        .stripMargin
  )
}
