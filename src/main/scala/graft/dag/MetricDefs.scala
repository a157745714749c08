package graft.dag

import graft.catalog.TomlLite
import JinjaLite._
import scala.collection.immutable.ListMap

/** The reference's metric/rank definition model — the Jinja template
  * context for its SQL/schema corpus (webcompat_kb/metrics/metrics.py:
  * Metric/SiteReportsFieldMetric/MetricType hierarchy and metrics.py:
  * 252-262 `_metric_types`; ranks.py RankColumn). Loaded from
  * data/metrics/metrics.toml and data/metrics/ranks.toml, declaration
  * order preserved (ranks.toml:1 requires field order to match
  * host_min_ranks).
  */
object MetricDefs {

  sealed trait Metric {
    def name: String
    def conditional: Boolean
    def condition(table: String): String
    def hostMinRanksCondition: Option[String]
    def siteReportsCondition(table: String): Option[String]
  }

  final case class UnconditionalMetric(name: String) extends Metric {
    val conditional = false
    def condition(table: String) = "TRUE"
    def hostMinRanksCondition: Option[String] = None
    def siteReportsCondition(table: String): Option[String] = None
  }

  final case class SiteReportsFieldMetric(
      name: String,
      hostMinRanksCond: Option[String],
      conditions: Option[Seq[String]]) extends Metric {
    val conditional = true
    def condition(table: String) = s"$table.is_$name"
    def hostMinRanksCondition: Option[String] = hostMinRanksCond
    def siteReportsCondition(table: String): Option[String] =
      conditions match {
        case Some(items) => Some(items.map(_.replace("{table}", table)).mkString(" AND "))
        case None => Some(s"IFNULL($table.is_$name, FALSE)")
      }
  }

  sealed trait MetricType {
    def name: String
    def fieldType: String
    def metricTypeField: Option[String]
    /** Which ETL contexts include this type (metric.py/backfill_metric.py
      * filter metric types by context; platform_score is history-only). */
    def contexts: Set[String] = Set("history", "daily")
    def aggFunction(table: String, metric: Metric, includeMetricCondition: Boolean): String
    def condition(table: String, metric: Metric, includeMetricCondition: Boolean): String = {
      val conds = metricTypeField.map(f => s"$table.$f").toSeq ++
        (if (metric.conditional && includeMetricCondition) Seq(metric.condition(table)) else Nil)
      if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
    }
  }

  final case class CountMetricType(name: String, metricTypeField: Option[String]) extends MetricType {
    val fieldType = "INTEGER"
    def aggFunction(table: String, metric: Metric, includeMetricCondition: Boolean): String =
      if (!metric.conditional) s"COUNT($table.number)"
      else s"COUNTIF(${condition(table, metric, includeMetricCondition)})"
  }

  final case class SumMetricType(name: String, metricTypeField: Option[String],
      override val contexts: Set[String] = Set("history", "daily")) extends MetricType {
    val fieldType = "NUMERIC"
    def aggFunction(table: String, metric: Metric, includeMetricCondition: Boolean): String =
      s"SUM(IF(${condition(table, metric, includeMetricCondition)}, $table.score, 0))"
  }

  /** metrics.py:252-262 `_metric_types`, verbatim (platform_score
    * carries contexts={"history"} there). */
  val metricTypes: Seq[MetricType] = Seq(
    CountMetricType("bug_count", None),
    SumMetricType("needs_diagnosis_score", Some("metric_type_needs_diagnosis")),
    SumMetricType("not_supported_score", Some("metric_type_firefox_not_supported")),
    SumMetricType("platform_score", Some("metric_type_platform_bug"), contexts = Set("history")),
    SumMetricType("total_score", None))

  final case class RankDef(name: String)

  def loadMetrics(metricsToml: String): Seq[Metric] = {
    val doc = TomlLite.parse(metricsToml)
    doc.sections.map { sec =>
      val name = sec.path.head
      doc.str(sec, "type") match {
        case Some("unconditional") => UnconditionalMetric(name)
        case Some("site_reports_field") =>
          SiteReportsFieldMetric(name, doc.str(sec, "host_min_ranks_condition"), doc.strArr(sec, "conditions"))
        case other => sys.error(s"Unknown metric type $other for $name")
      }
    }
  }

  def loadRanks(ranksToml: String): Seq[RankDef] =
    TomlLite.parse(ranksToml).sections.map(sec => RankDef(sec.path.head))

  // ---- Jinja context wrappers -----------------------------------------

  private def opt(s: Option[String]): V = s.map(VStr.apply).getOrElse(VNone)

  def metricV(m: Metric): V = VObj(
    attrs = Map("name" -> VStr(m.name), "conditional" -> VBool(m.conditional)),
    methods = Map(
      "condition" -> { args => VStr(m.condition(argStr(args.head))) },
      "host_min_ranks_condition" -> { _ => opt(m.hostMinRanksCondition) },
      "site_reports_condition" -> { args => opt(m.siteReportsCondition(argStr(args.head))) }))

  def metricTypeV(metricsByName: Map[String, Metric])(mt: MetricType): V = VObj(
    attrs = Map("name" -> VStr(mt.name), "field_type" -> VStr(mt.fieldType)),
    methods = Map(
      "agg_function" -> { args =>
        val table = argStr(args.head)
        val metric = metricForV(metricsByName, args(1))
        val include = args.lift(2).forall(_.truthy)
        VStr(mt.aggFunction(table, metric, include))
      },
      "condition" -> { args =>
        val table = argStr(args.head)
        val metric = metricForV(metricsByName, args(1))
        val include = args.lift(2).forall(_.truthy)
        VStr(mt.condition(table, metric, include))
      }))

  private def argStr(v: V): String = v match {
    case VStr(s) => s
    case other => sys.error(s"Expected string arg, got $other")
  }

  /** Recover the Scala Metric behind a wrapped VObj via its name attr. */
  private def metricForV(byName: Map[String, Metric], v: V): Metric = v match {
    case VObj(attrs, _) => byName(argStr(attrs("name")))
    case VStr(s) => byName(s)
    case other => sys.error(s"Expected metric, got $other")
  }

  /** Full template context (projectdata.py:463-469 `template_globals`)
    * plus `ref`/`name`/`dataset` bindings supplied by the corpus loader. */
  def context(metrics: Seq[Metric], ranks: Seq[RankDef], extra: Map[String, V] = Map.empty): Map[String, V] = {
    val byName = metrics.map(m => m.name -> m).toMap
    Map(
      "metrics" -> VMap(ListMap(metrics.map(m => m.name -> metricV(m)): _*)),
      "metric_types" -> VSeq(metricTypes.map(metricTypeV(byName))),
      "ranks" -> VSeq(ranks.map(r => VObj(Map("name" -> VStr(r.name)), Map.empty)))) ++ extra
  }
}
