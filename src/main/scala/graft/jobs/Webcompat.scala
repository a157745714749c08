package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Routines

/** The webcompat-kb flagship view chain, Spark-first: `site_reports` →
  * `scored_site_reports` (reference:
  * /root/reference/jobs/webcompat-kb/data/sql/webcompat_knowledge_base/
  * views/site_reports/view.sql:1-40 and views/scored_site_reports/
  * view.sql:1-100).
  *
  * Scale design:
  *  - The weight dimension (`dim_bug_score`, dozens of rows) is CROSS
  *    JOINed broadcast for the per-component scores (the reference's J4
  *    shape) — conditional sums fold map-side, so the fact table is
  *    scanned once with no extra shuffle.
  *  - The F2 correlated-subquery UDF (WEBCOMPAT_METRIC_SCORE_NO_SITE_RANK)
  *    is decorrelated into a pure expression over a driver-collected
  *    weight map (Routines.scoreNoSiteRank) — zero joins per row.
  *  - The rank-modifier routine's per-call probe of host_min_ranks is
  *    decorrelated into one broadcast join on webcompat_host.
  */
object Webcompat {

  /** user_story accessed through the ONE parsed variant column `__us`
    * (r14: was get_json_object per access — site_reports reads the
    * JSON 3×, scored_site_reports 6× with five of them inside the
    * weight-dim cross join, i.e. re-parsed per weight row; the variant
    * column is materialized once before the join and every read is a
    * binary path lookup — see BqShims.jsonVariant / PLANS.md r14). */
  private def uv(path: String): Column =
    try_variant_get(col("__us"), path, "string")
  private def withStoryVar(df: DataFrame): DataFrame =
    df.withColumn("__us", graft.functions.BqShims.jsonVariant(col("user_story")))
  private def has(k: String): Column = array_contains(col("keywords"), k)

  /** site_reports (view.sql:1-40): filtered bug universe + platform
    * arrays + team attribution + blocked/metric-type flags. */
  def siteReports(bugs: DataFrame, componentOwners: DataFrame,
      breakageCoreBugs: DataFrame): DataFrame = {
    val filtered = withStoryVar(bugs.filter(
      (col("product") === "Web Compatibility" && col("component") === "Site Reports") ||
        (col("product") =!= "Web Compatibility" && array_contains(col("keywords"), "webcompat:site-report"))))

    val platforms = transform(
      split(lower(coalesce(uv("$.platform"), lit(""))), ","),
      p => trim(p))

    val withBreakage = filtered.join(
      broadcast(breakageCoreBugs.select(col("breakage_bug").as("number"))
        .distinct().withColumn("__has_breakage", lit(true))),
      Seq("number"), "left")

    val blockedReason = Routines.webcompatBlockedReason(col("keywords"))

    withBreakage
      .join(broadcast(componentOwners),
        col("product") === componentOwners("bugzilla_product") &&
          col("component") === componentOwners("bugzilla_component"), "left")
      .withColumn("assigned_team",
        trim(lower(coalesce(uv("$.diagnosis-team"),
          col("team"), lit("unknown")))))
      .withColumn("has_intervention", has("webcompat:sitepatch-applied"))
      .withColumn("blocked_reason", blockedReason)
      .withColumn("blocked", col("blocked_reason").isNotNull)
      .withColumn("platforms", platforms)
      .withColumn("is_mobile",
        array_contains(col("platforms"), "ios") || array_contains(col("platforms"), "android"))
      .withColumn("is_desktop",
        array_contains(col("platforms"), "windows") ||
          array_contains(col("platforms"), "mac") ||
          array_contains(col("platforms"), "linux"))
      .withColumn("metric_type_needs_diagnosis", has("webcompat:needs-diagnosis"))
      .withColumn("metric_type_platform_bug",
        !has("webcompat:needs-diagnosis") &&
          (has("webcompat:platform-bug") || coalesce(col("__has_breakage"), lit(false))))
      .withColumn("metric_type_firefox_not_supported",
        coalesce(uv("$.impact"), lit("")) === "blocked")
      .drop("__has_breakage", "bugzilla_product", "bugzilla_component",
        "team", "manager", "__us")
  }

  /** scored_site_reports (view.sql:1-100): per-component scores via the
    * broadcast cross join + decorrelated triage score + rank modifier. */
  def scoredSiteReports(siteReports: DataFrame, dimBugScore: DataFrame,
      hostMinRanks: DataFrame, yyyymm: Long): DataFrame = {

    // --- scores CTE: cross join the weight dim, conditional sums (J4/A2)
    val w = dimBugScore.select(
      col("lookup_type"), col("lookup_value"), col("score").cast(DecimalType(38, 9)).as("score"))
    def scoreIf(cond: Column): Column =
      sum(when(cond, col("score")).otherwise(lit(BigDecimal(0)).cast(DecimalType(38, 9))))
    // the variant column is materialized BEFORE the weight cross join:
    // each fact row parses its user_story once, not once per weight row
    val sr = withStoryVar(siteReports)
    val scores = sr.crossJoin(broadcast(w))
      .groupBy("number")
      .agg(
        scoreIf(col("lookup_type") === "severity" &&
          col("lookup_value") === col("severity").cast(StringType)).as("severity_score"),
        scoreIf(col("lookup_type") === "impact" &&
          col("lookup_value") === uv("$.impact")).as("impact_score"),
        scoreIf(col("lookup_type") === "platform" &&
          array_contains(split(uv("$.platform"), ","), col("lookup_value")))
          .as("platform_score"),
        scoreIf(col("lookup_type") === "configuration" &&
          col("lookup_value") === coalesce(uv("$.configuration"), lit("general")))
          .as("configuration_score"),
        scoreIf(col("lookup_type") === "users_affected" &&
          col("lookup_value") === coalesce(uv("$.affects"), lit("all")))
          .as("affects_score"),
        scoreIf(col("lookup_type") === "patch_applied" &&
          col("lookup_value") === when(array_contains(col("keywords"), "webcompat:sitepatch-applied"),
            when(array_contains(col("keywords"), "webcompat:platform-bug"), lit("platform-bug"))
              .otherwise(lit("site-bug"))).otherwise(lit("none"))).as("intervention_score"),
        scoreIf(col("lookup_type") === "branch" &&
          col("lookup_value") === coalesce(uv("$.branch"), lit("release")))
          .as("branch_score"))

    // --- decorrelated F2: driver-collected weight map → pure expression
    val weightMap = w.collect().map { r =>
      (r.getString(0), r.getString(1)) -> r.getDecimal(2)
    }.toMap
    val triageNoRank = Routines.scoreNoSiteRankV(weightMap)(col("keywords"), col("__us"))

    // --- rank modifier decorrelated as a broadcast join on host
    val hostRanks = hostMinRanks
      .filter(col("yyyymm") === yyyymm)
      .groupBy(Routines.webcompatHost(concat(lit("https://"), col("host"))).as("webcompat_host"))
      .agg(min("global_rank").as("global_rank"), min("core_rank").as("core_rank"),
        min("local_rank").as("local_rank"))

    // computed_scores merged into the main pass (one fewer scan of the
    // fact table than the reference's separate CTE — the per-row F2
    // expression and the broadcast rank join don't need their own scan)
    sr
      .withColumn("webcompat_host", Routines.webcompatHost(col("url")))
      .join(broadcast(hostRanks), Seq("webcompat_host"), "left")
      .join(scores, Seq("number"))
      .withColumn("triage_score_no_rank", triageNoRank)
      .withColumn("site_rank_score",
        Routines.siteRankModifier(col("global_rank"), col("core_rank"), col("local_rank"),
          Routines.extractArrayV(col("__us"), "$.site-rank-override")))
      .drop("global_rank", "core_rank", "local_rank", "__us")
      .withColumn("triage_score",
        (col("triage_score_no_rank") * col("site_rank_score")).cast(DecimalType(38, 9)))
  }
}
