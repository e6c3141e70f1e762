package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Registry of operator queries (SURVEY.md §2) + DuckDB oracle SQL.
  *
  * Conventions (driver compare: columns sorted by name, then value-hash):
  *  - every computed column aliased identically in Spark and SQL;
  *  - floats rounded on both sides;
  *  - deterministic content (no wall clock, no partition-order dependence).
  *
  * The crawl-family queries run over a *frontier view* derived from
  * `documents` with pure integer arithmetic (PagesGen's url scheme), so
  * DuckDB can reproduce them from the same parquet — the html-dependent
  * operators (parse, cuckoo, minhash, …) are registered without oracle SQL
  * and get the driver's rows-only check, with their real verification in
  * `sbt -batch test` (golden fixtures + CPython oracle).
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // --- the frontier view (Spark side) ---------------------------------------
  // Matches PagesGen.urlOf/hostOf/subjectOf/yearOf; all expressions are
  // Catalyst built-ins → whole-stage codegen, pushdown-friendly.
  private[graft] def frontierView(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .selectExpr(
        "doc_id",
        "doc_id div 4 AS chain",
        "cast(doc_id % 4 AS int) AS page_idx",
        "n_chars")
      .selectExpr(
        "doc_id", "chain", "page_idx", "n_chars",
        "CASE cast(chain % 4 AS int) WHEN 0 THEN 'science' WHEN 1 THEN 'mathematics' " +
          "WHEN 2 THEN 'english' ELSE 'social-studies' END AS subject",
        "cast(2015 + chain % 10 AS int) AS year",
        "CASE WHEN chain % 10 < 3 THEN 0 ELSE cast(1 + (chain * 7) % 31 AS int) END AS host_id")
      .selectExpr(
        "doc_id", "chain", "page_idx", "n_chars", "subject", "year", "host_id",
        "concat('h', cast(host_id AS string), '.example.test') AS host",
        "cast(page_idx AS int) AS priority",
        "cast(page_idx AS int) AS depth")
      .selectExpr(
        "doc_id", "chain", "page_idx", "n_chars", "subject", "year", "host_id",
        "host", "priority", "depth",
        "concat('https://', host, '/bece/questions/', subject, '-', " +
          "cast(year AS string), '/c', cast(chain AS string), '/p', " +
          "cast(page_idx AS string)) AS url")

  // DuckDB twin of frontierView (CTE prefix shared by crawl-family oracles)
  private[graft] val FRONTIER_CTE =
    """WITH frontier AS (
      |  SELECT doc_id, chain, page_idx, n_chars, subject, year, host_id, host,
      |         priority, depth,
      |         concat('https://', host, '/bece/questions/', subject, '-',
      |                cast(year AS varchar), '/c', cast(chain AS varchar),
      |                '/p', cast(page_idx AS varchar)) AS url
      |  FROM (
      |    SELECT doc_id, chain, page_idx, n_chars, subject, year, host_id,
      |           concat('h', cast(host_id AS varchar), '.example.test') AS host,
      |           cast(page_idx AS int) AS priority, cast(page_idx AS int) AS depth
      |    FROM (
      |      SELECT doc_id, chain, page_idx, n_chars,
      |             CASE cast(chain % 4 AS int) WHEN 0 THEN 'science'
      |                  WHEN 1 THEN 'mathematics' WHEN 2 THEN 'english'
      |                  ELSE 'social-studies' END AS subject,
      |             cast(2015 + chain % 10 AS int) AS year,
      |             CASE WHEN chain % 10 < 3 THEN 0
      |                  ELSE cast(1 + (chain * 7) % 31 AS int) END AS host_id
      |      FROM (SELECT doc_id, doc_id // 4 AS chain,
      |                   cast(doc_id % 4 AS int) AS page_idx, n_chars
      |            FROM documents)
      |    )
      |  )
      |)""".stripMargin

  // X16 fixture: CLI `--subjects` strings exactly as run_spider.py:121-123
  // receives them (messy whitespace, the parse target) — shared verbatim by
  // the Spark query and the DuckDB VALUES oracle.
  private val X16Args = Seq(
    (2015, " science , mathematics"),
    (2016, "english,  social-studies ,science"),
    (2017, "mathematics,integrated-science , english "),
    (2018, "social-studies"))
  private val X16ValuesSql = X16Args
    .map { case (y, a) => s"($y, '$a')" }.mkString(", ")

  // ==========================================================================
  // crawl family (S1-S2, J4-J6, O6, A8-A9, X9, X15)
  // ==========================================================================

  private val crawlQueries: Map[String, Q] = Map(
    // S1: seed generation — subjects × years cross product realized as the
    // page-0 slice of the frontier (run_spider.py:137-143)
    "s1_seed_generation" -> ((s, d) =>
      frontierView(s, d).filter(col("page_idx") === 0)
        .select(col("subject"), col("year"), col("url"))),

    // S2: seed validation — year window + subject whitelist (run_spider.py:40-66)
    "s2_seed_validation" -> ((s, d) =>
      frontierView(s, d).filter(col("page_idx") === 0)
        .filter(col("year").between(2016, 2022) &&
          col("subject").isin("science", "mathematics"))
        .select(col("subject"), col("year"), col("url"))),

    // J4/U3: URL-seen anti-join — candidates minus seen (the dedup hot join)
    "j4_seen_antijoin" -> ((s, d) => {
      val f = frontierView(s, d)
      val seen = f.filter(col("chain") % 3 === 0 && col("page_idx") < 2)
        .select(col("url").as("seen_url"))
      f.join(seen, f("url") === seen("seen_url"), "left_anti")
        .select(col("url"), col("host"), col("depth"))
    }),

    // J5: fetch join — frontier ⋈ pages(store) on url; pages stand-in keyed
    // by the same arithmetic (broadcast of the smaller side is Catalyst's
    // choice here; the engine broadcasts the wave, CrawlEngine.scala)
    "j5_fetch_join" -> ((s, d) => {
      val f = frontierView(s, d).select(col("url"), col("host"), col("doc_id"))
      val pages = t(s, d, "documents").selectExpr("doc_id", "lang", "n_chars")
      f.join(pages, Seq("doc_id"))
        .select(col("url"), col("host"), col("lang"), col("n_chars"))
    }),

    // J6: robots politeness gate — broadcast join on host; h13 disallowed
    "j6_robots_gate" -> ((s, d) => {
      val f = frontierView(s, d)
      val robots = f.select(col("host_id")).distinct()
        .selectExpr("host_id",
          "host_id <> 13 AS allowed",
          "CASE WHEN host_id = 0 THEN 2000 ELSE 1000 END AS crawl_delay_ms")
      f.join(broadcast(robots), Seq("host_id"))
        .groupBy(col("host"), col("allowed"))
        .agg(count(lit(1)).as("n_urls"),
          max(col("crawl_delay_ms")).as("crawl_delay_ms"))
    }),

    // O6: frontier priority queue — top-5 per host by (priority, depth, url)
    "o6_priority_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("host"))
        .orderBy(col("priority"), col("depth"), col("url"))
      frontierView(s, d)
        .withColumn("host_rank", row_number().over(w))
        .filter(col("host_rank") <= 5)
        .select(col("host"), col("host_rank"), col("url"))
    }),

    // A8: per-partition lineage counts — wave proxy × host bucket. One scan:
    // n_chars rides through frontierView (no self-join of documents).
    "a8_lineage_counts" -> ((s, d) =>
      frontierView(s, d)
        .selectExpr("page_idx AS wave", "cast(host_id % 8 AS int) AS host_bucket",
          "CASE WHEN n_chars < 100 THEN 1L ELSE 0L END AS n_chars_flag")
        .groupBy(col("wave"), col("host_bucket"))
        .agg(count(lit(1)).as("fetched"), sum(col("n_chars_flag")).as("errors"))),

    // A9: seen-set digest — order-insensitive (count, arithmetic checksum)
    "a9_seen_digest" -> ((s, d) =>
      frontierView(s, d).filter(col("page_idx") < 2)
        .agg(count(lit(1)).as("seen_count"),
          sum(col("chain") * 4 + col("page_idx")).as("seen_checksum"))),

    // X16: comma-separated subject-list parse with whitespace strip
    // (run_spider.py:121-123 parse_subjects) — literal CLI-shaped argument
    // strings (the operator's REAL input; round 2 reverse-padded the output,
    // VERDICT r02 #9), identical VALUES rows on the DuckDB side
    "x16_subject_parse" -> ((s, d) => {
      import s.implicits._
      X16Args.toDF("year", "subjects_arg")
        .select(col("year"),
          explode(expr("transform(split(subjects_arg, ','), s -> trim(s))"))
            .as("subject"))
    }),

    // X9/X15: url templating + year-range expansion (sequence → explode)
    "x15_year_expansion" -> ((s, d) =>
      frontierView(s, d).select(col("subject")).distinct()
        .withColumn("year", explode(sequence(lit(2019), lit(2022))))
        .selectExpr("subject", "year",
          "concat('https://kuulchat.com/bece/questions/', subject, '-', " +
            "cast(year AS string), '/') AS url"))
  )

  private val crawlOracles: Map[String, String] = Map(
    "s1_seed_generation" ->
      s"""$FRONTIER_CTE SELECT subject, year, url FROM frontier WHERE page_idx = 0""",
    "s2_seed_validation" ->
      s"""$FRONTIER_CTE SELECT subject, year, url FROM frontier
         | WHERE page_idx = 0 AND year BETWEEN 2016 AND 2022
         |   AND subject IN ('science','mathematics')""".stripMargin,
    "j4_seen_antijoin" ->
      s"""$FRONTIER_CTE SELECT url, host, depth FROM frontier f
         | WHERE NOT EXISTS (SELECT 1 FROM frontier s
         |   WHERE s.chain % 3 = 0 AND s.page_idx < 2 AND s.url = f.url)""".stripMargin,
    "j5_fetch_join" ->
      s"""$FRONTIER_CTE SELECT f.url, f.host, p.lang, p.n_chars
         | FROM frontier f JOIN documents p USING (doc_id)""".stripMargin,
    "j6_robots_gate" ->
      s"""$FRONTIER_CTE SELECT f.host, r.allowed, count(*) AS n_urls,
         |        max(r.crawl_delay_ms) AS crawl_delay_ms
         | FROM frontier f JOIN (
         |   SELECT DISTINCT host_id, host_id <> 13 AS allowed,
         |          CASE WHEN host_id = 0 THEN 2000 ELSE 1000 END AS crawl_delay_ms
         |   FROM frontier) r USING (host_id)
         | GROUP BY 1, 2""".stripMargin,
    "o6_priority_topk" ->
      s"""$FRONTIER_CTE SELECT host, host_rank, url FROM (
         |   SELECT host, url, row_number() OVER (PARTITION BY host
         |     ORDER BY priority, depth, url) AS host_rank FROM frontier)
         | WHERE host_rank <= 5""".stripMargin,
    // CAST(sum(...) AS BIGINT): DuckDB sums BIGINT→HUGEINT, which the
    // driver's pandas bridge renders float64 and the hash compare then
    // mismatches Spark's int64 despite equal values.
    "a8_lineage_counts" ->
      s"""$FRONTIER_CTE SELECT page_idx AS wave, cast(host_id % 8 AS int) AS host_bucket,
         |        count(*) AS fetched,
         |        CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS errors
         | FROM frontier
         | GROUP BY 1, 2""".stripMargin,
    "a9_seen_digest" ->
      s"""$FRONTIER_CTE SELECT count(*) AS seen_count,
         |        CAST(sum(chain * 4 + page_idx) AS BIGINT) AS seen_checksum
         | FROM frontier WHERE page_idx < 2""".stripMargin,
    // c1: one politeness wave over the seed frontier — budget = 60000 ms /
    // crawl_delay (h0: 2000 → 30, default 1000 → 60), h13 robots-blocked,
    // rank ordered by (priority, depth, url) (discovery_ts constant at seed)
    "c1_politeness_wave" ->
      s"""$FRONTIER_CTE SELECT host, host_rank, url FROM (
         |   SELECT host, url,
         |          row_number() OVER (PARTITION BY host
         |            ORDER BY priority, depth, url) AS host_rank,
         |          CASE WHEN host_id = 0 THEN 30 ELSE 60 END AS budget
         |   FROM frontier WHERE page_idx = 0 AND host_id <> 13)
         | WHERE host_rank <= budget""".stripMargin,
    "x16_subject_parse" ->
      s"""SELECT year, trim(s) AS subject FROM (
         |   SELECT year, unnest(string_split(subjects_arg, ',')) AS s
         |   FROM (VALUES $X16ValuesSql) t(year, subjects_arg))""".stripMargin,
    "x15_year_expansion" ->
      s"""$FRONTIER_CTE SELECT subject, year,
         |   concat('https://kuulchat.com/bece/questions/', subject, '-',
         |          cast(year AS varchar), '/') AS url
         | FROM (SELECT DISTINCT subject FROM frontier),
         |      (SELECT unnest(generate_series(2019, 2022)) AS year)""".stripMargin
  )

  // ==========================================================================
  // relational family (A1-A7, O1-O5, U1-U2, F13, J1-J3 analogs)
  // ==========================================================================

  private val relationalQueries: Map[String, Q] = Map(
    // A2-analog: grouped stats with conditional counts (restructure stats)
    "q1_lineitem_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))),

    // J2/J3-analog: multi-way dim join, broadcast-shaped
    "q2_dim_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))),

    // O1/O3-analog: global sort + limit (deterministic tiebreak)
    "q3_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // J4-inverse: left-semi (EXISTS)
    "q4_semijoin" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "lineitem").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders_with_items"))),

    // O6-analog on events: top-3 per user by value
    "q5_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, d, "events").withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("user_id"), col("rnk"), col("event_id"),
          round(col("value"), 2).as("value"))
    }),

    // A2+rollup: per-type and grand-total in one pass
    "q6_rollup" -> ((s, d) =>
      t(s, d, "events").rollup(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))),

    // O2: first-wins dedup (sort by ts then keep first per key)
    "o2_dedup_first_wins" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
    }),

    // U1: union of two projected streams (objectives ++ theory analog)
    "u1_union" -> ((s, d) => {
      val e = t(s, d, "events")
      val a = e.filter(col("event_type") === "click")
        .select(col("user_id"), lit("objective").as("section"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("theory").as("section"))
      a.unionByName(b).groupBy(col("section"), col("user_id"))
        .agg(count(lit(1)).as("n"))
    }),

    // U2: except — users with clicks minus users with errors
    "u2_except" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "click").select(col("user_id")).distinct()
        .except(e.filter(col("event_type") === "error").select(col("user_id")).distinct())
    }),

    // F13-analog: null-guarded filter + regexp field extraction from props
    "f13_props_extract" -> ((s, d) =>
      t(s, d, "events")
        .filter(col("props").isNotNull)
        .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("int"))
        .filter(col("k") > 50)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_high"))),

    // X13-analog: array_join of sorted collected set (diagrams "|" encoding)
    "x13_array_join" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), "|").as("types")))
  )

  private val relationalOracles: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q2_dim_join" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "q3_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_semijoin" ->
      """SELECT count(*) AS n_orders_with_items FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,
    "q5_window_topk" ->
      """SELECT user_id, rnk, event_id, round(value, 2) AS value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        |  FROM events) WHERE rnk <= 3""".stripMargin,
    "q6_rollup" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ROLLUP (event_type)""".stripMargin,
    "o2_dedup_first_wins" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "u1_union" ->
      """SELECT section, user_id, count(*) AS n FROM (
        |  SELECT user_id, 'objective' AS section FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, 'theory' AS section FROM events WHERE event_type = 'purchase')
        |GROUP BY 1, 2""".stripMargin,
    "u2_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error'""".stripMargin,
    "f13_props_extract" ->
      """SELECT event_type, count(*) AS n_high FROM (
        |  SELECT event_type, cast(regexp_extract(props, '([0-9]+)', 1) AS int) AS k
        |  FROM events WHERE props IS NOT NULL)
        |WHERE k > 50 GROUP BY 1""".stripMargin,
    "x13_array_join" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types
        |FROM events GROUP BY 1""".stripMargin
  )

  def all: Map[String, Q] = crawlQueries ++ relationalQueries ++
    QueriesText.queries ++ QueriesCrawlOps.queries

  def oracles: Map[String, String] = crawlOracles ++ relationalOracles ++
    QueriesText.oracles ++ QueriesCrawlOps.oracles ++ QueriesGenOracles.oracles
}
