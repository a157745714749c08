package graft.dag

import org.apache.spark.sql.SparkSession

/** The reference's routine corpus deployed as Spark SQL scalar
  * functions — the direct analog of its `CREATE OR REPLACE FUNCTION`
  * deployment step (D6; update_schema.py RoutineUpdater:406-421), so
  * dialect-translated view SQL that calls routines by name runs as-is.
  *
  * Bodies are pure Spark SQL expressions (SQL UDFs inline into the
  * calling plan — codegen-friendly, no black-box closures) mirroring
  * /root/reference/jobs/webcompat-kb/data/sql/webcompat_knowledge_base/
  * routines/<NAME>/routine.sql; semantics match graft.functions.Routines
  * (the Column-combinator forms) — asserted by SqlRoutinesSpec.
  */
object SqlRoutines {

  val definitions: Seq[(String, String)] = Seq(
    "WEBCOMPAT_HOST" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION WEBCOMPAT_HOST(url STRING)
        |RETURNS STRING RETURN
        |CASE WHEN startswith(parse_url(url, 'HOST'), 'www.')
        |       THEN substring(parse_url(url, 'HOST'), 5)
        |     WHEN startswith(parse_url(url, 'HOST'), 'm.')
        |       THEN substring(parse_url(url, 'HOST'), 3)
        |     ELSE parse_url(url, 'HOST') END""".stripMargin,
    "URL_PARSE" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION URL_PARSE(url STRING)
        |RETURNS STRUCT<scheme: STRING, host: STRING, path: STRING, query: STRING, fragment: STRING>
        |RETURN struct(
        |  nullif(regexp_extract(url, '^([^:]+):', 1), '') AS scheme,
        |  nullif(regexp_extract(url, '^[^:]+:/+([^/?#]+)', 1), '') AS host,
        |  coalesce(nullif(regexp_extract(url, '^[^:]+:/+[^/]+([^#?]+)?', 1), ''), '/') AS path,
        |  nullif(regexp_extract(url, '[^#]*\\?([^#]+)', 1), '') AS query,
        |  nullif(regexp_extract(url, '#(.*)', 1), '') AS fragment)""".stripMargin,
    "BUG_ID_FROM_BUGZILLA_URL" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION BUG_ID_FROM_BUGZILLA_URL(url STRING)
        |RETURNS BIGINT RETURN
        |try_cast(nullif(regexp_extract(
        |  regexp_extract(url, 'https://bugzilla\\.mozilla\\.org/show_bug\\.cgi\\?(.+)', 1),
        |  '(?:^|&)id=([^&#]+)', 1), '') AS BIGINT)""".stripMargin,
    "EXTRACT_ARRAY" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION EXTRACT_ARRAY(value STRING, json_pattern STRING)
        |RETURNS ARRAY<STRING> RETURN
        |transform(
        |  CASE WHEN from_json(get_json_object(value, json_pattern), 'array<string>') IS NOT NULL
        |         THEN from_json(get_json_object(value, json_pattern), 'array<string>')
        |       WHEN get_json_object(value, json_pattern) IS NOT NULL
        |         THEN array(get_json_object(value, json_pattern))
        |       ELSE array() END,
        |  e -> trim(e))""".stripMargin,
    "WEBCOMPAT_BLOCKED_REASON" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION WEBCOMPAT_BLOCKED_REASON(keywords ARRAY<STRING>)
        |RETURNS STRING RETURN
        |CASE WHEN array_contains(keywords, 'webcompat:blocked-resources') THEN 'resources'
        |     WHEN array_contains(keywords, 'webcompat:blocked') THEN
        |       CASE WHEN array_contains(keywords, 'spec-needed') THEN 'spec'
        |            WHEN array_contains(keywords, 'webcompat:needs-diagnosis')
        |                 AND array_contains(keywords, 'webcompat:needs-login') THEN 'needs-login'
        |            WHEN array_contains(keywords, 'webcompat:needs-contact') THEN 'needs-contact'
        |            ELSE 'other' END
        |     ELSE NULL END""".stripMargin,
    "WEBCOMPAT_METRIC_YYYYMM" ->
      """CREATE OR REPLACE TEMPORARY FUNCTION WEBCOMPAT_METRIC_YYYYMM()
        |RETURNS BIGINT RETURN 202603""".stripMargin
  )

  /** Deploy all routines into the session (idempotent). */
  def deployAll(spark: SparkSession): Unit =
    definitions.foreach { case (_, ddl) => spark.sql(ddl) }
}
