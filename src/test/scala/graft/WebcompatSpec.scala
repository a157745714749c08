package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jobs.Webcompat

/** Golden tests for the webcompat view chain on handcrafted fixtures
  * (FIXTURES.md A1/A3/A4; reference test style
  * jobs/webcompat-kb/tests/test_bugzilla.py SAMPLE_KB_BUGS). */
class WebcompatSpec extends SparkTestBase {
  import spark.implicits._

  private def bugsDf = {
    val schema = StructType(Seq(
      StructField("number", LongType, nullable = false),
      StructField("product", StringType), StructField("component", StringType),
      StructField("severity", IntegerType),
      StructField("keywords", ArrayType(StringType)),
      StructField("url", StringType), StructField("user_story", StringType)))
    spark.createDataFrame(java.util.List.of(
      // plain site report, severe impact, windows+android, top site
      Row(1L, "Web Compatibility", "Site Reports", 2,
        Seq("webcompat:needs-diagnosis"), "https://www.topsite.com/page",
        """{"impact":"severe","platform":"windows,android"}"""),
      // core-product bug tagged as site report, with intervention
      Row(2L, "Core", "Layout", 1,
        Seq("webcompat:site-report", "webcompat:sitepatch-applied"),
        "https://else.example/x", """{"impact":"low","platform":"ios"}"""),
      // filtered out: wrong product/component, no keyword
      Row(3L, "Firefox", "General", 1, Seq.empty[String], "https://x.org", "{}"),
      // blocked bug with diagnosis-team + breakage link
      Row(4L, "Web Compatibility", "Site Reports", 3,
        Seq("webcompat:blocked", "webcompat:needs-contact"),
        "https://m.other.net/a", """{"impact":"blocked","diagnosis-team":"Layout"}""")),
      schema)
  }

  private def ownersDf = Seq(
    ("Web Compatibility", "Site Reports", "alice", "webcompat"),
    ("Core", "Layout", "bob", "platform"))
    .toDF("bugzilla_product", "bugzilla_component", "manager", "team")

  private def breakageDf = Seq(Tuple1(4L)).toDF("breakage_bug")

  private def weightsDf = Seq(
    ("severity", "1", "1"), ("severity", "2", "2"), ("severity", "3", "3"),
    ("impact", "severe", "10"), ("impact", "low", "1"), ("impact", "blocked", "20"),
    ("platform", "windows", "2"), ("platform", "android", "3"), ("platform", "ios", "4"),
    ("configuration", "general", "1"),
    ("users_affected", "all", "2"),
    ("patch_applied", "none", "1"), ("patch_applied", "site-bug", "5"),
    ("branch", "release", "1"))
    .toDF("lookup_type", "lookup_value", "raw")
    .select(col("lookup_type"), col("lookup_value"),
      col("raw").cast(DecimalType(38, 9)).as("score"))

  private def ranksDf = Seq(
    (202603L, "www.topsite.com", 500L, 20000L, 30000L),
    (202603L, "other.net", 99999L, 5000L, 99999L),
    (202501L, "www.topsite.com", 999999L, 999999L, 999999L)) // wrong month
    .toDF("yyyymm", "host", "global_rank", "core_rank", "local_rank")

  private lazy val site = Webcompat.siteReports(bugsDf, ownersDf, breakageDf)
  private lazy val scored = Webcompat.scoredSiteReports(site, weightsDf, ranksDf, 202603L)

  test("site_reports filters the bug universe like the reference WHERE clause") {
    assert(site.select("number").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("site_reports computes teams, flags, platforms") {
    val byNum = site.collect().map(r => r.getAs[Long]("number") -> r).toMap
    val b1 = byNum(1L)
    assert(b1.getAs[String]("assigned_team") == "webcompat") // from owners
    assert(b1.getAs[scala.collection.Seq[String]]("platforms").toSeq ==
      Seq("windows", "android"))
    assert(b1.getAs[Boolean]("is_mobile") && b1.getAs[Boolean]("is_desktop"))
    assert(b1.getAs[Boolean]("metric_type_needs_diagnosis"))
    assert(!b1.getAs[Boolean]("metric_type_platform_bug"))
    val b2 = byNum(2L)
    assert(b2.getAs[Boolean]("has_intervention"))
    assert(b2.getAs[String]("assigned_team") == "platform")
    val b4 = byNum(4L)
    assert(b4.getAs[String]("assigned_team") == "layout") // user_story override wins
    assert(b4.getAs[Boolean]("blocked") &&
      b4.getAs[String]("blocked_reason") == "needs-contact")
    assert(b4.getAs[Boolean]("metric_type_platform_bug")) // via breakage link
    assert(b4.getAs[Boolean]("metric_type_firefox_not_supported"))
  }

  test("scored_site_reports: component scores match the weight dimension") {
    val byNum = scored.collect().map(r => r.getAs[Long]("number") -> r).toMap
    def d(r: Row, c: String): BigDecimal = BigDecimal(r.getAs[java.math.BigDecimal](c))
    val b1 = byNum(1L)
    assert(d(b1, "severity_score") == BigDecimal(2))
    assert(d(b1, "impact_score") == BigDecimal(10))
    assert(d(b1, "platform_score") == BigDecimal(5)) // windows 2 + android 3
    assert(d(b1, "intervention_score") == BigDecimal(1)) // none
    val b2 = byNum(2L)
    assert(d(b2, "intervention_score") == BigDecimal(5)) // site-bug
    assert(d(b2, "platform_score") == BigDecimal(4)) // ios
  }

  test("scored_site_reports: decorrelated F2 equals the component product (reference invariant)") {
    // view.sql comment: multiplying all components except severity must
    // equal WEBCOMPAT_METRIC_SCORE_NO_SITE_RANK
    scored.collect().foreach { r =>
      def d(c: String) = BigDecimal(r.getAs[java.math.BigDecimal](c))
      val product = d("impact_score") * d("platform_score") * d("configuration_score") *
        d("affects_score") * d("intervention_score") * d("branch_score")
      assert(d("triage_score_no_rank") == product,
        s"bug ${r.getAs[Long]("number")}: F2 ${d("triage_score_no_rank")} != product $product")
    }
  }

  test("scored_site_reports: rank modifier tiers from host_min_ranks") {
    val byNum = scored.collect().map(r => r.getAs[Long]("number") -> r).toMap
    def d(r: Row, c: String): BigDecimal = BigDecimal(r.getAs[java.math.BigDecimal](c))
    assert(d(byNum(1L), "site_rank_score") == BigDecimal(15)) // global 500 ≤ 1000
    assert(d(byNum(4L), "site_rank_score") == BigDecimal(5))  // core 5000 ≤ 10000 tier
    assert(d(byNum(2L), "site_rank_score") == BigDecimal(1))  // unknown host
    // triage_score = no_rank * modifier
    val b1 = byNum(1L)
    assert(d(b1, "triage_score") == d(b1, "triage_score_no_rank") * d(b1, "site_rank_score"))
  }
}
