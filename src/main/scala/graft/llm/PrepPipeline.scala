package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composable training-data preparation pipeline: an ordered list of named
  * filter/transform stages folded over the corpus, plus an audit funnel
  * that reports the surviving row count after every stage — the standard
  * "how much data did each filter cost me" report of an LLM data pipeline
  * (the same funnel shape C4/RefinedWeb/FineWeb publish for their
  * filtering cascades).
  *
  * The audit builds ONE plan: each stage's count is a branch off the
  * shared upstream, unioned together — a single job whose branches reuse
  * the same scan, not N sequential actions. At 100 TB each branch is a
  * partial-aggregated count (no shuffle beyond the final 1-row combine),
  * so the funnel costs one pass over the data.
  */
object PrepPipeline {

  final case class Stage(name: String, apply: DataFrame => DataFrame)

  /** Fold the stages and return the final surviving corpus. */
  def run(input: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(input)((df, st) => st.apply(df))

  /** Funnel report: (stage_idx, stage, n_rows) for the raw input and
    * after each stage, in pipeline order. */
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
}
