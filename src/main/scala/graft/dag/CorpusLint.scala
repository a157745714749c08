package graft.dag

import graft.catalog.TomlLite

/** Template sanity gates mirrored from the reference's deploy pipeline:
  * routine-shape validation (update_schema.py:254-279
  * `validate_routine_sql`) and the template lint
  * (projectdata.py:636-673 `lint_templates`). Run by CorpusSweepSpec
  * over every rendered object before deployment is trusted.
  */
object CorpusLint {

  /** The reference's ETL job registry (main.py:90-112 job list). Table
    * metadata may only name these in its `etl` array. */
  val knownEtlJobs: Set[String] = Set(
    "autowebcompat", "bugzilla", "chrome-use-counters", "interop",
    "interventions", "metric", "metric-changes", "site-ranks",
    "standards-positions", "update-schema", "user-reports-aggregate",
    "web_features")

  private val routineFormat =
    """(?s)^CREATE OR REPLACE FUNCTION `([^`]+)`\(([^)]*)\) RETURNS ([^(]+) AS \((.*)\);?\s*$""".r

  /** Shape-check a RENDERED (still BigQuery-dialect) routine: must parse
    * as `CREATE OR REPLACE FUNCTION `name`(args) RETURNS type AS
    * (body);`, the name must match the deploy target, and OPTIONS(
    * clauses are not permitted. Returns the errors (empty = valid). */
  def validateRoutineSql(expectedName: String, sql: String): Seq[String] =
    routineFormat.findFirstMatchIn(sql.trim) match {
      case None => Seq(s"routine does not match CREATE OR REPLACE FUNCTION shape: ${sql.take(80)}")
      case Some(m) =>
        val nameErr =
          if (m.group(1) != expectedName)
            Seq(s"expected function name '$expectedName' but got '${m.group(1)}'")
          else Nil
        val optErr = if (sql.contains("OPTIONS(")) Seq("OPTIONS not permitted") else Nil
        nameErr ++ optErr
    }

  /** Lint the raw templates of a scanned corpus: (1) table `etl` entries
    * must name known jobs; (2) view/routine templates must not hardcode
    * the project id; (3) nor use their own dataset id as a table
    * qualifier (`dataset.` with word boundary) — cross-dataset refs must
    * go through `ref()`. Returns the error list (empty = clean). */
  def lintTemplates(project: String, objects: Seq[CorpusLoader.CorpusObject],
      etlJobs: Set[String] = knownEtlJobs): Seq[String] = {
    val errors = Seq.newBuilder[String]
    objects.foreach { o =>
      if (o.kind == "table") {
        for {
          meta <- o.metaToml.toSeq
          doc = TomlLite.parse(meta)
          arr <- doc.root.get("etl").toSeq.collect { case TomlLite.TArr(vs) => vs }
          TomlLite.TStr(job) <- arr
          if !etlJobs.contains(job)
        } errors += s"${o.dataset}.${o.name}: invalid ETL job name '$job'"
      } else {
        if (o.template.contains(project))
          errors += s"${o.dataset}.${o.name}: found project id in template"
        if (("\\b" + java.util.regex.Pattern.quote(o.dataset) + "\\.").r
            .findFirstIn(o.template).isDefined)
          errors += s"${o.dataset}.${o.name}: found dataset id used as qualifier"
      }
    }
    errors.result()
  }
}
