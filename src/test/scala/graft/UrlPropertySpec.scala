package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Routines

/** Seeded property tests for the URL routine family (VERDICT round-1
  * item 2: ScalaCheck coverage for URL_PARSE / WEBCOMPAT_HOST). URLs are
  * generated component-wise, so the expected parse is known exactly. */
class UrlPropertySpec extends SparkTestBase {
  import spark.implicits._

  private case class UrlParts(scheme: String, sub: String, host: String,
      path: String, query: Option[String], fragment: Option[String]) {
    def url: String = {
      val q = query.map("?" + _).getOrElse("")
      val f = fragment.map("#" + _).getOrElse("")
      s"$scheme://$sub$host$path$q$f"
    }
    def expectedHost: String = sub + host
    /** WEBCOMPAT_HOST strips exactly one leading www. / m. */
    def expectedWebcompatHost: String =
      if (sub == "www.") host else if (sub == "m.") host else sub + host
  }

  private val partsGen: Gen[UrlParts] = for {
    scheme <- Gen.oneOf("http", "https")
    sub <- Gen.oneOf("", "www.", "m.", "app.")
    base <- Gen.oneOf("example.com", "x.io", "a-b.org", "deep.sub.net")
    nPath <- Gen.choose(0, 3)
    segs <- Gen.listOfN(nPath, Gen.oneOf("a", "b1", "c-d", "page2"))
    query <- Gen.option(Gen.oneOf("q=1", "a=b&c=d", "x="))
    fragment <- Gen.option(Gen.oneOf("top", "sec2", ""))
  } yield UrlParts(scheme, sub, base,
    if (segs.isEmpty) "" else segs.mkString("/", "/", ""), query, fragment)

  test("property: urlParse recovers every generated component (300 seeded samples)") {
    val params = Gen.Parameters.default
    val samples = (0 until 300).map(i => partsGen.pureApply(params, Seed(7L + i)))
    val df = samples.map(_.url).toDF("url")
      .select(col("url"), Routines.urlParse(col("url")).as("p"),
        Routines.webcompatHost(col("url")).as("wh"))
      .select("url", "p.scheme", "p.host", "p.path", "p.query", "p.fragment", "wh")
      .collect()
    samples.zip(df).foreach { case (parts, row) =>
      assert(row.getString(1) == parts.scheme, s"scheme of ${parts.url}")
      assert(row.getString(2) == parts.expectedHost, s"host of ${parts.url}")
      val wantPath = if (parts.path.isEmpty) "/" else parts.path
      assert(row.getString(3) == wantPath, s"path of ${parts.url}")
      // reference regex: query must be non-empty to match; "" → null
      val wantQuery = parts.query.filter(_.nonEmpty).orNull
      assert(row.getString(4) == wantQuery, s"query of ${parts.url}")
      val wantFrag = parts.fragment.map(f => f).filter(_.nonEmpty).orNull
      assert(row.getString(5) == wantFrag, s"fragment of ${parts.url}")
      assert(row.getString(6) == parts.expectedWebcompatHost, s"wh of ${parts.url}")
    }
  }
}
