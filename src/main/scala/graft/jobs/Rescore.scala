package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Routines
import graft.operators.HistoricStates.BugStates
import graft.operators.Incremental

/** Historic-score recomputation + unseen-delta emission — the reference's
  * rescore machinery (/root/reference/jobs/webcompat-kb/webcompat_kb/etl/
  * metric_changes.py:327-411 `compute_historic_scores` + :553-588 change
  * scoping): every reconstructed bug state gets a triage score (0 when
  * the state is closed or out of the webcompat universe; otherwise the
  * decorrelated F2 score × rank modifier), and only deltas whose
  * (number, change_time) key is not already recorded are emitted.
  *
  * Scale: states explode to one row each (bounded by history length);
  * scoring is the same broadcast-map + broadcast-rank-join plan as
  * scored_site_reports; the unseen filter is a left-anti join (I6).
  */
object Rescore {

  /** FIXED_STATES (metric_changes.py:17). */
  val FixedStates: Set[String] = Set("RESOLVED", "VERIFIED")

  /** Flatten reconstructed states and score each one:
    * (number, index, score) where index 0 = current state. */
  def historicScores(spark: SparkSession,
      states: org.apache.spark.sql.Dataset[BugStates],
      weights: Map[(String, String), java.math.BigDecimal],
      hostRanks: DataFrame, yyyymm: Long): DataFrame = {

    val flat = states
      .select(col("number"), posexplode(col("states")).as(Seq("index", "st")))
      .select(col("number"), col("index"),
        col("st.status").as("status"), col("st.product").as("product"),
        col("st.component").as("component"), col("st.keywords").as("keywords"),
        col("st.url").as("url"), col("st.userStory").as("user_story"))

    val isOpen = !col("status").isin(FixedStates.toSeq: _*)
    val isWebcompat =
      (col("product") === "Web Compatibility" && col("component") === "Site Reports") ||
        (col("product") =!= "Web Compatibility" &&
          array_contains(col("keywords"), "webcompat:site-report"))

    val ranks = hostRanks
      .filter(col("yyyymm") === yyyymm)
      .groupBy(Routines.webcompatHost(concat(lit("https://"), col("host")))
        .as("webcompat_host"))
      .agg(min("global_rank").as("global_rank"), min("core_rank").as("core_rank"),
        min("local_rank").as("local_rank"))

    // user_story parsed ONCE per row to a variant; the score expression
    // reads it ~7 times (five weight families + the override array's
    // two probes) as binary path lookups instead of 7 full re-parses
    val score = (Routines.scoreNoSiteRankV(weights)(col("keywords"), col("__us")) *
      Routines.siteRankModifier(col("global_rank"), col("core_rank"), col("local_rank"),
        Routines.extractArrayV(col("__us"), "$.site-rank-override")))
      .cast(DecimalType(38, 9))

    flat
      .withColumn("__us", graft.functions.BqShims.jsonVariant(col("user_story")))
      .withColumn("webcompat_host", Routines.webcompatHost(col("url")))
      .join(broadcast(ranks), Seq("webcompat_host"), "left")
      .withColumn("score",
        when(isOpen && isWebcompat, score)
          .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 9))))
      .select("number", "index", "score")
  }

  /** Pair consecutive states into deltas: change i maps states index
    * i → i+1 (newer → older), so delta_i = score(i) − score(i+1), keyed
    * by that change's change_time. `changeTimes(number, index,
    * change_time)` supplies the key; only keys absent from
    * `recorded(number, change_time)` are emitted (I6 anti-join). */
  def unseenScoreDeltas(scores: DataFrame, changeTimes: DataFrame,
      recorded: DataFrame): DataFrame = {
    val newer = scores.select(col("number"), col("index"), col("score").as("new_score"))
    val older = scores.select(col("number"), (col("index") - 1).as("index"),
      col("score").as("old_score"))
    val deltas = newer.join(older, Seq("number", "index"))
      .join(changeTimes, Seq("number", "index"))
      .filter(col("new_score") =!= col("old_score"))
      .select(col("number"), col("change_time"), col("old_score"), col("new_score"))
    Incremental.unprocessed(deltas, recorded, Seq("number", "change_time"))
  }
}
