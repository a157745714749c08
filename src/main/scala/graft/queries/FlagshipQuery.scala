package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._
import graft.jobs.Webcompat

/** Flagship end-to-end slice: the webcompat scored_site_reports chain
  * (lateral platform arrays, JSON access, broadcast cross-join scoring,
  * decorrelated F2 triage score, rank-tier broadcast join) driven by
  * bugs synthesized deterministically from the `documents` table so the
  * whole chain is DuckDB-oracle-checkable at any scale factor.
  */
object FlagshipQuery {

  type Q = (SparkSession, String) => DataFrame

  private def syntheticBugs(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    docs.select(
      col("doc_id").as("number"),
      when(m === 0, lit("Web Compatibility")).otherwise(lit("Core")).as("product"),
      when(m === 0, lit("Site Reports")).otherwise(lit("Layout")).as("component"),
      (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType).as("severity"),
      array_compact(array(
        when(pmod(col("doc_id"), lit(4)) =!= 0, lit("webcompat:site-report")),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("webcompat:needs-diagnosis")),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("webcompat:sitepatch-applied")),
        when(pmod(col("doc_id"), lit(7)) === 0, lit("webcompat:platform-bug"))))
        .as("keywords"),
      concat(lit("https://www."), col("source"), lit(".example.com/r/"), col("doc_id"))
        .as("url"),
      concat(lit("""{"impact":""""),
        element_at(array(lit("severe"), lit("low"), lit("blocked")),
          pmod(col("doc_id"), lit(3)).cast(IntegerType) + 1),
        lit("""","platform":""""),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("windows,android")).otherwise(lit("ios")),
        lit(""""}""")).as("user_story"))
  }

  private def weightRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("severity", "1", 1), ("severity", "2", 2), ("severity", "3", 3),
      ("impact", "severe", 10), ("impact", "low", 1), ("impact", "blocked", 20),
      ("platform", "windows", 2), ("platform", "android", 3), ("platform", "ios", 4),
      ("configuration", "general", 1), ("users_affected", "all", 2),
      ("patch_applied", "none", 1), ("patch_applied", "site-bug", 5),
      ("patch_applied", "platform-bug", 7), ("branch", "release", 1))
      .toDF("lookup_type", "lookup_value", "raw")
      .select(col("lookup_type"), col("lookup_value"),
        col("raw").cast(DecimalType(38, 9)).as("score"))
  }

  private def hostRanks(docs: DataFrame): DataFrame = {
    val n = regexp_extract(col("source"), "src(\\d+)", 1).cast(LongType)
    docs.select(col("source")).distinct()
      .select(
        lit(202603L).as("yyyymm"),
        concat(lit("www."), col("source"), lit(".example.com")).as("host"),
        (n * 700 + 100).as("global_rank"),
        (n * 3000 + 20000).as("core_rank"),
        (n * 5000 + 20000).as("local_rank"))
  }

  val queries: Map[String, Q] = Map(
    "q105_webcompat_flagship" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bugs = syntheticBugs(docs)
      val emptyOwners = s.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("bugzilla_product", StringType),
          StructField("bugzilla_component", StringType),
          StructField("manager", StringType), StructField("team", StringType))))
      val emptyBreakage = s.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("breakage_bug", LongType))))
      val site = Webcompat.siteReports(bugs, emptyOwners, emptyBreakage)
      val scored = Webcompat.scoredSiteReports(site, weightRows(s), hostRanks(docs), 202603L)
      scored.select(
          col("number"),
          col("assigned_team"),
          col("is_mobile"), col("is_desktop"),
          col("severity_score").cast(DoubleType).as("severity_score"),
          col("impact_score").cast(DoubleType).as("impact_score"),
          col("platform_score").cast(DoubleType).as("platform_score"),
          col("intervention_score").cast(DoubleType).as("intervention_score"),
          col("triage_score_no_rank").cast(DoubleType).as("triage_no_rank"),
          col("site_rank_score").cast(DoubleType).as("rank_modifier"),
          col("triage_score").cast(DoubleType).as("triage_score"))
        .orderBy("number")
    })
  )

  val oracles: Map[String, String] = Map(
    "q105_webcompat_flagship" ->
      """WITH bugs AS (
        |  SELECT doc_id AS number,
        |    doc_id % 4 = 0 AS is_wc,
        |    doc_id % 3 + 1 AS severity,
        |    doc_id % 2 = 0 AS plat_desktop,
        |    doc_id % 5 = 0 AS has_patch,
        |    doc_id % 7 = 0 AS has_platform_bug,
        |    ['severe', 'low', 'blocked'][(doc_id % 3) + 1] AS impact,
        |    source
        |  FROM documents),
        |filtered AS (
        |  -- WC bugs pass via product/component; non-WC carry the
        |  -- site-report keyword by construction, so the universe is all
        |  SELECT * FROM bugs),
        |scored AS (
        |  SELECT number,
        |    CAST(severity AS DOUBLE) AS severity_score,
        |    CASE impact WHEN 'severe' THEN 10.0 WHEN 'low' THEN 1.0 ELSE 20.0 END AS impact_score,
        |    CASE WHEN plat_desktop THEN 5.0 ELSE 4.0 END AS platform_score,
        |    CASE WHEN has_patch THEN (CASE WHEN has_platform_bug THEN 7.0 ELSE 5.0 END)
        |         ELSE 1.0 END AS intervention_score,
        |    CAST(CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) * 700 + 100 AS BIGINT) AS g,
        |    CAST(CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) * 3000 + 20000 AS BIGINT) AS c,
        |    CAST(CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) * 5000 + 20000 AS BIGINT) AS l,
        |    plat_desktop
        |  FROM filtered),
        |final AS (
        |  SELECT number,
        |    'unknown' AS assigned_team,
        |    TRUE AS is_mobile,  -- android or ios present in every synthetic story
        |    plat_desktop AS is_desktop,
        |    severity_score, impact_score, platform_score, intervention_score,
        |    impact_score * platform_score * 1.0 * 2.0 * intervention_score * 1.0 AS triage_no_rank,
        |    CASE WHEN g <= 1000 THEN 15.0
        |         WHEN c <= 1000 THEN 10.0
        |         WHEN g <= 10000 THEN 7.5
        |         WHEN l <= 1000 THEN 5.0
        |         WHEN c <= 10000 THEN 5.0
        |         WHEN l <= 10000 THEN 2.5
        |         ELSE 1.0 END AS rank_modifier
        |  FROM scored)
        |SELECT number, assigned_team, is_mobile, is_desktop,
        |  CAST(severity_score AS DOUBLE) AS severity_score,
        |  CAST(impact_score AS DOUBLE) AS impact_score,
        |  CAST(platform_score AS DOUBLE) AS platform_score,
        |  CAST(intervention_score AS DOUBLE) AS intervention_score,
        |  CAST(triage_no_rank AS DOUBLE) AS triage_no_rank,
        |  CAST(rank_modifier AS DOUBLE) AS rank_modifier,
        |  CAST(triage_no_rank * rank_modifier AS DOUBLE) AS triage_score
        |FROM final ORDER BY number""".stripMargin
  )
}
