package graft.jobs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Routines

/** see_also link classification (SURVEY §2.12 G2): the reference sorts
  * each bug's external links into classes by substring/host tests and
  * extracts linked bug ids (/root/reference/jobs/webcompat-kb/
  * webcompat_kb/etl/bugzilla.py:337-388, 617-655). Column-combinator
  * form: applied per element of the see_also array with HOFs — no UDFs,
  * no explode required unless the caller wants one row per link.
  */
object LinkExtraction {

  /** Classify one link URL. Classes mirror the reference's routing:
    * bugzilla show_bug links → "bugzilla" (joinable bug id via
    * BUG_ID_FROM_BUGZILLA_URL), webcompat.com reports → "webcompat",
    * github web-bugs issues → "github-web-bugs", anything else "other". */
  def classifyLink(url: Column): Column =
    when(url.contains("bugzilla.mozilla.org/show_bug.cgi"), lit("bugzilla"))
      .when(url.contains("webcompat.com/issues/"), lit("webcompat"))
      .when(url.contains("github.com/webcompat/web-bugs/issues"), lit("github-web-bugs"))
      .otherwise(lit("other"))

  /** Per-bug classified link structs: array<struct<url, link_class,
    * linked_bug>> from a see_also array column. */
  def classifiedLinks(seeAlso: Column): Column =
    transform(seeAlso, u => struct(
      u.as("url"),
      classifyLink(u).as("link_class"),
      Routines.bugIdFromBugzillaUrl(u).as("linked_bug")))

  /** Linked bugzilla ids only (the kb→core edge source). */
  def linkedBugIds(seeAlso: Column): Column =
    filter(transform(seeAlso, u => Routines.bugIdFromBugzillaUrl(u)),
      id => id.isNotNull)
}
