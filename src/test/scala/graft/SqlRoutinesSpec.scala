package graft

import org.apache.spark.sql.functions._
import graft.dag.{Dialect, SqlRoutines, ViewDag, ViewDef}
import graft.functions.Routines

/** SQL-deployed routines must be callable from plain SQL (incl.
  * dialect-translated view bodies) and agree with the Column-combinator
  * forms on the same inputs. */
class SqlRoutinesSpec extends SparkTestBase {
  import spark.implicits._

  private val urls = Seq(
    "https://www.example.com/a/b?q=1#f",
    "https://m.site.io",
    "https://bugzilla.mozilla.org/show_bug.cgi?id=4321",
    "http://deep.sub.net/p")

  test("SQL routines deploy and agree with the Column forms") {
    SqlRoutines.deployAll(spark)
    urls.toDF("url").createOrReplaceTempView("urls_fixture")
    val viaSql = spark.sql(
      """SELECT WEBCOMPAT_HOST(url) AS h, URL_PARSE(url).path AS p,
        |BUG_ID_FROM_BUGZILLA_URL(url) AS b FROM urls_fixture""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    val viaCol = urls.toDF("url")
      .select(Routines.webcompatHost(col("url")).as("h"),
        Routines.urlParse(col("url")).getField("path").as("p"),
        Routines.bugIdFromBugzillaUrl(col("url")).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(viaSql == viaCol)
  }

  test("EXTRACT_ARRAY and WEBCOMPAT_BLOCKED_REASON via SQL") {
    SqlRoutines.deployAll(spark)
    val arr = spark.sql(
      """SELECT EXTRACT_ARRAY('{"k": [" a ", "b"]}', '$.k') AS a,
        |EXTRACT_ARRAY('{"k": "solo"}', '$.k') AS s,
        |WEBCOMPAT_BLOCKED_REASON(array('webcompat:blocked', 'spec-needed')) AS r,
        |WEBCOMPAT_METRIC_YYYYMM() AS m""".stripMargin).collect().head
    assert(arr.getSeq[String](0) == Seq("a", "b"))
    assert(arr.getSeq[String](1) == Seq("solo"))
    assert(arr.getString(2) == "spec")
    assert(arr.getLong(3) == 202603L)
  }

  test("translated view SQL calling routines runs through ViewDag") {
    SqlRoutines.deployAll(spark)
    Seq("https://www.shop.example/x", "https://m.shop.example/y",
      "https://other.net/z").toDF("url").createOrReplaceTempView("link_fixture")
    // reference-style body: routine call + COUNTIF, dialect-translated
    val body =
      """SELECT WEBCOMPAT_HOST(url) AS host, COUNTIF(url LIKE 'https://%') AS n_https,
        |COUNT(*) AS n
        |FROM {{ ref('link_fixture') }} GROUP BY WEBCOMPAT_HOST(url)""".stripMargin
    ViewDag.deploy(spark, Seq(ViewDef("hosts_view", Dialect.translate(body))))
    val got = spark.table("hosts_view").orderBy("host").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("other.net", 1L, 1L), ("shop.example", 2L, 2L)))
  }
}
