package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable training-data preparation pipeline: an ordered list of named
  * filter/transform stages folded over the corpus, plus audit funnels
  * that report the surviving row count after every stage — the standard
  * "how much data did each filter cost me" report of an LLM data pipeline
  * (the same funnel shape C4/RefinedWeb/FineWeb publish for their
  * filtering cascades).
  */
object PrepPipeline {

  final case class Stage(name: String, apply: DataFrame => DataFrame)

  /** Fold the stages and return the final surviving corpus. */
  def run(input: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(input)((df, st) => st.apply(df))

  /** Funnel report for ARBITRARY transform stages: (stage_idx, stage,
    * n_rows) for the raw input and after each stage. One union-of-counts
    * job, but NOTE Spark does not share scan subtrees across union
    * branches: stage k's branch re-scans the source and re-applies
    * stages 1..k, so this costs O(stages) scans and O(stages²) filter
    * work. Correct for any stage; for predicate cascades use
    * [[auditOnePass]], which is a genuine single pass. */
  def audit(input: DataFrame, stages: Seq[Stage]): DataFrame = {
    val staged = stages.scanLeft(("raw", input)) {
      case ((_, df), st) => (st.name, st.apply(df))
    }
    staged.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(i).cast("int").as("stage_idx"), lit(name).as("stage"),
          col("n_rows"))
    }.reduce(_ unionByName _)
  }

  /** Funnel report for a PREDICATE cascade (plus an optional final
    * dedup-by-key stage) in ONE aggregation over ONE scan: per-row
    * survival flags are cumulative ANDs computed in a single projection,
    * stage counts are conditional sums (map-side combined), and the
    * dedup stage is a conditional COUNT(DISTINCT key) over the last
    * cascade's survivors. This is the funnel that actually costs one
    * pass at 100 TB. */
  def auditOnePass(input: DataFrame, preds: Seq[(String, Column)],
      dedupKey: Option[(String, Column)] = None): DataFrame = {
    val flags = preds.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }.tail
    val stageCounts = flags.zipWithIndex.map { case (f, i) =>
      sum(f.cast("long")).as(s"n$i")
    }
    val dedupCount = dedupKey.toSeq.map { case (_, key) =>
      count_distinct(when(flags.last, key)).as("n_dedup")
    }
    val row = input.agg(count(lit(1)).as("n_raw"), stageCounts ++ dedupCount: _*)
    val entries =
      struct(lit(0).cast("int").as("stage_idx"), lit("raw").as("stage"),
        col("n_raw").as("n_rows")) +:
      preds.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(i + 1).cast("int").as("stage_idx"), lit(name).as("stage"),
          col(s"n$i").as("n_rows"))
      } ++:
      dedupKey.toSeq.map { case (name, _) =>
        struct(lit(preds.size + 1).cast("int").as("stage_idx"),
          lit(name).as("stage"), col("n_dedup").as("n_rows"))
      }
    row.select(explode(array(entries: _*)).as("e"))
      .select(col("e.stage_idx"), col("e.stage"), col("e.n_rows"))
  }
}
