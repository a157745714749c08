package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._
import graft.functions.{BqShims, Routines}
import graft.operators.Collect

/** Arrays, structs, JSON, laterals, strings, dates, pivot/unpivot, spine
  * joins (SURVEY §2.3 J5/J9, §2.4 A5–A7/A13–A16/A21, §2.8, §2.9 F1/F7).
  */
object ArrayJsonQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Integer floor-division on columns (positive operands). */
  private def floorDiv(a: Column, b: Column): Column =
    floor(a.cast(DoubleType) / b).cast(LongType)

  /** Deterministic synthetic URL per document — drives the URL routine
    * family exactly like bug.url drives WEBCOMPAT_HOST in the reference. */
  private def withUrl(df: DataFrame): DataFrame =
    df.withColumn("url",
      concat(lit("https://www.src"), pmod(col("doc_id"), lit(20)),
        lit(".example.com/p/"), col("doc_id"),
        lit("?q="), pmod(col("doc_id"), lit(7)), lit("#sec")))

  val queries: Map[String, Q] = Map(
    // A6/O4 — ordered+limited ARRAY_AGG: ids of the 3 highest-value
    // events per user (UO summary.sql:39-43), rendered as csv for
    // engine-portable comparison.
    "q40_collect_top_k" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(array_join(
          Collect.orderedLimitedCollect(
            struct((-col("value")).as("nv"), col("event_id").as("id")),
            col("event_id"), 3), ",").as("top3_ids"))
        .orderBy("user_id")
    }),

    // A7 — ARRAY_AGG(DISTINCT ... IGNORE NULLS), sorted csv.
    "q41_collect_set" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(Collect.sortedSetCsv(col("event_type")).as("types_csv"))
        .orderBy("user_id")
    }),

    // A14/A16 — pivoted aggregation (bugs_platform_data/view.sql:29-30).
    // Scale: pivot with an explicit value list is one shuffle; never use
    // the value-discovering overload on big data.
    "q42_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy("day")
    }),

    // A15 — melt / unpivot back to long format (search-alert UNION ALL
    // fan-out, main.py:60-115; Spark 3.4+ unpivot).
    "q43_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .groupBy("day")
        .agg(
          count_if(col("event_type") === "click").as("click"),
          count_if(col("event_type") === "error").as("error"),
          count_if(col("event_type") === "purchase").as("purchase"))
      wide.unpivot(Array(col("day")), Array(col("click"), col("error"), col("purchase")),
          "metric", "n")
        .orderBy("day", "metric")
    }),

    // J5/F7 — lateral array join: explode split tokens, count words
    // (site_reports/view.sql:5 JOIN UNNEST(SPLIT(...))).
    "q44_explode_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("word"))
    }),

    // X8 — JSON access on a semi-structured column
    // (scored_site_reports/view.sql:27-35 JSON_VALUE usage).
    "q45_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", BqShims.jsonValue(col("props"), "$.k").try_cast("bigint"))
        .groupBy("event_type")
        .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count_if(col("k") > 50).as("n_big"))
        .orderBy("event_type")
    }),

    // q45's VARIANT twin (r13 verdict ask #6): the SAME JSON column
    // parsed ONCE to Spark 4 VariantType, then accessed four times
    // (typed bigint, string form, null-probe of a missing path, and a
    // validity count) — with get_json_object each access would re-parse
    // the string; here the plan carries ONE ParseJson per row and four
    // binary path reads (plan proof in PLANS.md; equality + plan shape
    // pinned by VariantSpec). The legacy q45 stays the canonical
    // string path.
    "q272_json_variant" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("v", BqShims.jsonVariant(col("props")))
        .withColumn("k", BqShims.variantGet(col("v"), "$.k", "bigint"))
        .withColumn("k_str", BqShims.variantValue(col("v"), "$.k"))
        .withColumn("missing", BqShims.variantValue(col("v"), "$.absent"))
        .groupBy("event_type")
        .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count_if(col("k") > 50).as("n_big"),
          count_if(col("k_str") === col("k").cast(StringType)).as("n_str_eq"),
          count_if(col("missing").isNull).as("n_missing"))
        .orderBy("event_type")
    }),

    // The flagship's user_story multi-access shape on a VARIANT: the
    // q105 path reads the same JSON column ~8 times via
    // get_json_object (impact, platform, diagnosis-team, configuration,
    // …) — the exact repeated-parse pattern VariantType exists for.
    // Same synthetic user_story JSON as q105, parsed once, four
    // accesses (two present keys, one defaulted-missing, one split),
    // aggregated per source. At 100×, this halves-or-better the CPU of
    // every JSON-heavy job: one parse amortizes across all accesses.
    "q273_variant_story" -> ((s, dir) => {
      val story = concat(lit("""{"impact":""""),
        element_at(array(lit("severe"), lit("low"), lit("blocked")),
          pmod(col("doc_id"), lit(3)).cast(IntegerType) + 1),
        lit("""","platform":""""),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("windows,android"))
          .otherwise(lit("ios")),
        lit(""""}"""))
      t(s, dir, "documents")
        .withColumn("v", BqShims.jsonVariant(story))
        .select(col("doc_id"), col("source"),
          BqShims.variantValue(col("v"), "$.impact").as("impact"),
          size(split(BqShims.variantValue(col("v"), "$.platform"), ","))
            .as("n_platforms"),
          coalesce(BqShims.variantValue(col("v"), "$.configuration"),
            lit("general")).as("configuration"))
        .groupBy("source")
        .agg(count_if(col("impact") === "blocked").as("n_blocked"),
          sum(col("n_platforms")).cast(LongType).as("total_platforms"),
          count_if(col("configuration") === "general").as("n_default_cfg"))
        .orderBy("source")
    }),

    // F7/X4 — date spine via sequence+explode, monthly order counts
    // (GENERATE_DATE_ARRAY, metrics.py:204), left join keeps empty months.
    "q46_date_spine" -> ((s, dir) => {
      val spine = s.range(1).select(explode(
        sequence(lit(java.sql.Date.valueOf("1995-01-01")),
          lit(java.sql.Date.valueOf("2001-08-01")),
          expr("interval 1 month"))).as("month"))
      val counts = t(s, dir, "orders")
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(count(lit(1)).as("n"))
      spine.join(counts, Seq("month"), "left")
        .select(col("month"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("month")
    }),

    // J9 — date-range interval join: weekly spine × order "active window"
    // [o_orderdate, o_orderdate + 84 days) — the sightline topline shape
    // (webcompat_topline_metric_sightline/view.sql:7-15).
    // Scale: instead of a spine×fact BNLJ (quadratic in spine length),
    // each fact row EXPLODES into exactly the spine weeks it covers
    // (bounded 12/row) and a single hash agg counts them — linear, one
    // shuffle, survives any fact-table size. The tiny spine is only used
    // at the end to restore empty weeks.
    "q47_interval_join" -> ((s, dir) => {
      val start = java.sql.Date.valueOf("1995-01-01")
      val maxK = 360  // weekly spine 1995-01-01 .. 2001-12-01
      val spine = s.range(1).select(explode(
        sequence(lit(start), lit(java.sql.Date.valueOf("2001-12-01")),
          expr("interval 7 day"))).as("week"))
      val o = t(s, dir, "orders").select(to_date(col("o_orderdate")).as("od"))
      val diff = datediff(col("od"), lit(start))
      val counts = o
        .select(explode(sequence(
          floorDiv(diff + 6, lit(7)),
          least(floorDiv(diff + 83, lit(7)), lit(maxK)))).as("k"))
        .groupBy(date_add(lit(start), (col("k") * 7).cast(IntegerType)).as("week"))
        .agg(count(lit(1)).as("n_active"))
      spine.join(counts, Seq("week"), "left")
        .select(col("week"), coalesce(col("n_active"), lit(0L)).as("n_active"))
        .orderBy("week")
    }),

    // A21/X6 — higher-order-function fold over an array column
    // (graphics_dashboard.sql:113-121 labeled-counter fold). Sequential
    // left fold in both engines → bit-identical doubles.
    "q48_hof_fold" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          aggregate(transform(col("embedding"), e => e.cast(DoubleType)),
            lit(0.0), (acc, x) => acc + x).as("esum"),
          array_min(col("embedding")).as("emin"),
          array_max(col("embedding")).as("emax"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    }),

    // X6 — element access: OFFSET / SAFE_OFFSET / ARRAY_LAST
    // (platform_priorities/view.sql:88, graphics_dashboard.sql:141).
    "q49_array_index" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          BqShims.offset(col("embedding"), 0).as("first_e"),
          BqShims.arrayLast(col("embedding")).as("last_e"),
          BqShims.safeOffset(col("embedding"), 100).as("oob_e"))
        .orderBy("vec_id")
    }),

    // O3/X7 — multi-key sort on struct fields (features_latest/view.sql:4-7
    // ORDER BY version.major DESC, minor DESC ... LIMIT 1 shape).
    "q50_struct_sort" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("v", struct(
          element_at(split(col("p_type"), " "), 1).as("family"),
          col("p_size").as("major"),
          col("p_partkey").as("minor")))
      p.orderBy(col("v.family").asc, col("v.major").desc, col("v.minor").asc)
        .select(col("v.family").as("family"), col("v.major").as("major"),
          col("v.minor").as("minor"))
        .limit(20)
    }),

    // X1 — string function battery (SPLIT/TRIM/LOWER/SUBSTR/REPLACE/
    // STARTS_WITH/CONCAT/LENGTH/FORMAT, §2.8).
    "q51_string_battery" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          lower(col("c_mktsegment")).as("seg_lower"),
          substring(col("c_name"), 10, 5).as("name_tail"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey").cast(StringType)).as("seg_key"),
          col("c_name").startsWith("Customer#00000001").as("low_key"),
          length(col("c_name")).as("name_len"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy("c_custkey")
    }),

    // F1/X3 — URL routine family: WEBCOMPAT_HOST + URL_PARSE +
    // BUG_ID_FROM_BUGZILLA_URL over synthesized urls.
    "q52_url_routines" -> ((s, dir) => {
      val d = withUrl(t(s, dir, "documents"))
        .withColumn("bz_url",
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("https://bugzilla.mozilla.org/show_bug.cgi?id="), col("doc_id")))
            .otherwise(col("url")))
      val parsed = Routines.urlParse(col("url"))
      d.select(col("doc_id"),
          Routines.webcompatHost(col("url")).as("host"),
          parsed.getField("scheme").as("scheme"),
          parsed.getField("path").as("path"),
          parsed.getField("query").as("query"),
          parsed.getField("fragment").as("fragment"),
          Routines.bugIdFromBugzillaUrl(col("bz_url")).as("bug_id"))
        .orderBy("doc_id")
    }),

    // X5 — SAFE_DIVIDE / NULLIF / LEAST / COALESCE battery
    // (UO summary.sql, data_validation.py:46-52).
    "q53_safe_math" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          BqShims.safeDivide(col("l_extendedprice"), col("l_quantity") - 25).as("per_unit_off25"),
          BqShims.nullIf(col("l_linestatus"), lit("F")).as("status_nf"),
          least(col("l_tax"), col("l_discount")).as("min_rate"),
          coalesce(BqShims.nullIf(col("l_returnflag"), lit("N")), lit("NONE")).as("flag_or_none"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // X9 — portable deterministic hashing (FARM_FINGERPRINT role):
    // md5-bucket distribution check.
    "q54_hash_bucket" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("bucket", pmod(BqShims.md5Bucket(col("c_custkey")), lit(16)))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // X4/A13 — date/time battery: Sunday-week floor, month trunc,
    // datediff, extract, format (72× DATE_TRUNC in reference corpus).
    "q55_datetime_battery" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("od", to_date(col("o_orderdate")))
        .groupBy(
          BqShims.weekSunday(col("od")).as("week_sun"),
          year(col("od")).as("yr"))
        .agg(count(lit(1)).as("n"),
          min(date_format(col("od"), "yyyy-MM")).as("first_month"),
          max(datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("od"))).as("max_age_days"))
        .orderBy("week_sun")
    })
  )

  val oracles: Map[String, String] = Map(
    "q40_collect_top_k" ->
      """SELECT user_id, string_agg(event_id::VARCHAR, ',' ORDER BY value DESC, event_id) AS top3_ids
        |FROM (SELECT user_id, event_id, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q41_collect_set" ->
      """SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q42_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count_if(event_type = 'click')::BIGINT AS click,
        |  count_if(event_type = 'error')::BIGINT AS error,
        |  count_if(event_type = 'purchase')::BIGINT AS purchase,
        |  count_if(event_type = 'signup')::BIGINT AS signup,
        |  count_if(event_type = 'view')::BIGINT AS "view"
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q43_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    count_if(event_type = 'click')::BIGINT AS click,
        |    count_if(event_type = 'error')::BIGINT AS error,
        |    count_if(event_type = 'purchase')::BIGINT AS purchase
        |  FROM events GROUP BY 1)
        |SELECT day, metric, n FROM wide UNPIVOT (n FOR metric IN (click, error, purchase))
        |ORDER BY day, metric""".stripMargin,
    "q44_explode_tokens" ->
      """SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "q45_json_extract" ->
      """SELECT event_type,
        |  MIN(k) AS min_k, MAX(k) AS max_k, count_if(k > 50)::BIGINT AS n_big
        |FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the variant twin must agree with the STRING-parse oracle — that
    // is the point: parse-once changes the plan, never the values
    "q272_json_variant" ->
      """SELECT event_type,
        |  MIN(k) AS min_k, MAX(k) AS max_k, count_if(k > 50)::BIGINT AS n_big,
        |  count_if(ks = CAST(k AS VARCHAR))::BIGINT AS n_str_eq,
        |  count_if(json_extract_string(props, '$.absent') IS NULL)::BIGINT
        |    AS n_missing
        |FROM (SELECT event_type, props,
        |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        json_extract_string(props, '$.k') AS ks
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q273_variant_story" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    '{"impact":"' || ['severe','low','blocked'][(doc_id % 3) + 1] ||
        |    '","platform":"' ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'windows,android' ELSE 'ios' END ||
        |    '"}' AS us
        |  FROM documents),
        |x AS (
        |  SELECT source,
        |    json_extract_string(us, '$.impact') AS impact,
        |    len(string_split(json_extract_string(us, '$.platform'), ','))
        |      AS n_platforms,
        |    COALESCE(json_extract_string(us, '$.configuration'), 'general')
        |      AS configuration
        |  FROM d)
        |SELECT source,
        |  count_if(impact = 'blocked')::BIGINT AS n_blocked,
        |  CAST(SUM(n_platforms) AS BIGINT) AS total_platforms,
        |  count_if(configuration = 'general')::BIGINT AS n_default_cfg
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    "q46_date_spine" ->
      """SELECT CAST(m AS DATE) AS month, COALESCE(n, 0) AS n
        |FROM generate_series(DATE '1995-01-01', DATE '2001-08-01', INTERVAL 1 MONTH) s(m)
        |LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, COUNT(*) AS n
        |           FROM orders GROUP BY 1) c
        |  ON CAST(m AS DATE) = c.month
        |ORDER BY month""".stripMargin,
    "q47_interval_join" ->
      """SELECT CAST(w AS DATE) AS week, COUNT(od) AS n_active
        |FROM generate_series(DATE '1995-01-01', DATE '2001-12-01', INTERVAL 7 DAY) s(w)
        |LEFT JOIN (SELECT CAST(o_orderdate AS DATE) AS od FROM orders) o
        |  ON CAST(w AS DATE) >= od AND CAST(w AS DATE) < od + 84
        |GROUP BY 1 ORDER BY week""".stripMargin,
    "q48_hof_fold" ->
      """SELECT vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b) AS esum,
        |  list_min(embedding) AS emin, list_max(embedding) AS emax,
        |  len(embedding) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q49_array_index" ->
      """SELECT vec_id, embedding[1] AS first_e, embedding[-1] AS last_e,
        |  CASE WHEN len(embedding) > 100 THEN embedding[101] END AS oob_e
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q50_struct_sort" ->
      """SELECT string_split(p_type, ' ')[1] AS family, p_size AS major, p_partkey AS minor
        |FROM part ORDER BY family ASC, major DESC, minor ASC LIMIT 20""".stripMargin,
    "q51_string_battery" ->
      """SELECT c_custkey, lower(c_mktsegment) AS seg_lower,
        |  substr(c_name, 10, 5) AS name_tail,
        |  replace(c_name, 'Customer', 'Cust') AS name_short,
        |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
        |  starts_with(c_name, 'Customer#00000001') AS low_key,
        |  length(c_name) AS name_len,
        |  trim('  x  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q52_url_routines" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://www.src' || (doc_id % 20) || '.example.com/p/' || doc_id ||
        |      '?q=' || (doc_id % 7) || '#sec' AS url,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'https://bugzilla.mozilla.org/show_bug.cgi?id=' || doc_id
        |      ELSE 'https://www.src' || (doc_id % 20) || '.example.com/p/' || doc_id ||
        |        '?q=' || (doc_id % 7) || '#sec' END AS bz_url
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN starts_with(h, 'www.') THEN h[5:]
        |       WHEN starts_with(h, 'm.') THEN h[3:] ELSE h END AS host,
        |  NULLIF(regexp_extract(url, '^([^:]+):', 1), '') AS scheme,
        |  COALESCE(NULLIF(regexp_extract(url, '^[^:]+:/+[^/]+([^#?]+)?', 1), ''), '/') AS path,
        |  NULLIF(regexp_extract(url, '[^#]*\?([^#]+)', 1), '') AS query,
        |  NULLIF(regexp_extract(url, '#(.*)', 1), '') AS fragment,
        |  TRY_CAST(NULLIF(regexp_extract(
        |    regexp_extract(bz_url, 'https://bugzilla\.mozilla\.org/show_bug\.cgi\?(.+)', 1),
        |    '(?:^|&)id=([^&#]+)', 1), '') AS BIGINT) AS bug_id
        |FROM (SELECT *, regexp_extract(url, '^[^:]+:/+([^/?#]+)', 1) AS h FROM d)
        |ORDER BY doc_id""".stripMargin,
    "q53_safe_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity - 25 = 0 THEN NULL
        |       ELSE l_extendedprice / (l_quantity - 25) END AS per_unit_off25,
        |  NULLIF(l_linestatus, 'F') AS status_nf,
        |  LEAST(l_tax, l_discount) AS min_rate,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q54_hash_bucket" ->
      """SELECT CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS bucket,
        |  COUNT(*) AS n
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q55_datetime_battery" ->
      """SELECT od - CAST(dayofweek(od) AS INTEGER) AS week_sun,
        |  CAST(year(od) AS INTEGER) AS yr, COUNT(*) AS n,
        |  MIN(strftime(od, '%Y-%m')) AS first_month,
        |  MAX(CAST(DATE '2002-01-01' - od AS INTEGER)) AS max_age_days
        |FROM (SELECT CAST(o_orderdate AS DATE) AS od FROM orders)
        |GROUP BY 1, 2 ORDER BY week_sun""".stripMargin
  )
}
