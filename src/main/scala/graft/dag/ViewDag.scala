package graft.dag

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** View/routine DAG runtime — the reference's deployment "compiler"
  * (/root/reference/jobs/webcompat-kb/webcompat_kb/etl/update_schema.py:
  * 60-252 and projectdata.py:515-633): templates with `ref(name)`
  * resolution, reference extraction, DFS-postorder topological sort,
  * deploy in topo order, and a tree-hash short-circuit for unchanged
  * trees (update_schema.py:551-588).
  *
  * Spark shape: "deploy" = register temp views over the session catalog;
  * each view body is Spark SQL with `{{ ref('name') }}` placeholders.
  * Because temp views are lazy logical plans, registering the DAG costs
  * nothing until a consumer runs — Catalyst then optimizes ACROSS view
  * boundaries (filter pushdown through the whole chain), which is the
  * scale win over the reference's materialized-per-view model.
  */
final case class ViewDef(name: String, sql: String)

/** `deployed` actually re-registered this call; `unchanged` skipped
  * because their rendered text matches what the session already has
  * (the per-object diff of update_schema.py:374-421 `needs_update`);
  * `skipped` = the whole tree short-circuited on `lastHash`. */
final case class DagResult(order: Seq[String], deployed: Seq[String], skipped: Boolean,
    unchanged: Seq[String] = Nil)

object ViewDag {

  private val refPattern = """\{\{\s*ref\s*\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r

  /** Extract `ref()` targets from a template body. */
  def extractRefs(sql: String): Seq[String] =
    refPattern.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Substitute `{{ ref('x') }}` with the resolved identifier. */
  def render(sql: String, resolve: String => String): String =
    refPattern.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(resolve(m.group(1))))

  /** DFS-postorder topological sort (update_schema.py:218-252), cycle
    * detection included. External refs (not defined in the project) are
    * assumed pre-existing tables. */
  def topoSort(views: Seq[ViewDef]): Seq[String] = {
    val byName = views.map(v => v.name -> v).toMap
    val visiting = mutable.Set[String]()
    val done = mutable.LinkedHashSet[String]()
    def visit(name: String): Unit = {
      if (done.contains(name)) return
      if (!byName.contains(name)) return // external ref
      if (!visiting.add(name)) sys.error(s"Cycle detected at view '$name'")
      extractRefs(byName(name).sql).foreach(visit)
      visiting.remove(name)
      done.add(name)
    }
    views.map(_.name).foreach(visit)
    done.toSeq
  }

  /** Stable content hash of the view tree (treehash short-circuit). */
  def treeHash(views: Seq[ViewDef]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    views.sortBy(_.name).foreach { v =>
      md.update(v.name.getBytes("UTF-8")); md.update(0.toByte)
      md.update(v.sql.getBytes("UTF-8")); md.update(0.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Per-session record of each view's deployed rendered text — the
    * "live catalog" side of the needs_update diff. Weak keys: dropping a
    * session drops its registry. */
  private val deployedTexts =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, mutable.Map[String, String]]())

  /** Deploy: register every view as a temp view in topo order. `resolve`
    * maps external ref names to existing table/view identifiers (the
    * staging mapper hook). `lastHash` short-circuits whole unchanged
    * trees; below that, a per-object diff against the session's
    * previously-deployed text skips no-op re-registrations
    * (update_schema.py:374-421 `needs_update`). Views register from SQL
    * TEXT (`CREATE OR REPLACE TEMPORARY VIEW`), so references re-resolve
    * by name at use — a redeployed dependency propagates to unchanged
    * dependents without re-registering them. */
  def deploy(spark: SparkSession, views: Seq[ViewDef],
      resolve: String => String = identity,
      lastHash: Option[String] = None): DagResult = {
    val hash = treeHash(views)
    if (lastHash.contains(hash)) return DagResult(Nil, Nil, skipped = true)
    val registry = deployedTexts.synchronized {
      deployedTexts.computeIfAbsent(spark, _ => mutable.Map[String, String]())
    }
    val byName = views.map(v => v.name -> v).toMap
    val order = topoSort(views)
    val deployed = mutable.ArrayBuffer[String]()
    val unchanged = mutable.ArrayBuffer[String]()
    order.foreach { name =>
      val rendered = render(byName(name).sql,
        ref => if (byName.contains(ref)) ref else resolve(ref))
      // "unchanged" needs BOTH an identical previously-deployed text AND
      // the view still live in the catalog — the registry is a shadow
      // cache, and anything can drop/replace a temp view behind its back
      // (the reference's needs_update diffs the live catalog,
      // update_schema.py:374-421); skipping on cache alone would leave
      // the view missing/stale
      if (registry.get(name).contains(rendered) && spark.catalog.tableExists(name))
        unchanged += name
      else {
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `$name` AS $rendered")
        registry(name) = rendered
        deployed += name
      }
    }
    DagResult(order, deployed.toSeq, skipped = false, unchanged.toSeq)
  }

  /** Run a deployed view to a DataFrame. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
