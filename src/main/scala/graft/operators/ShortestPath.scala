package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop weighted shortest paths (Bellman–Ford rounds) — the
  * weighted companion to [[Closure]] (unweighted reachability) and
  * [[PageRank]] (centrality) on the same edge tables: k relax rounds
  * give exact shortest distances over paths of ≤ k hops, the standard
  * distributed SSSP formulation (each round is one join + one
  * min-aggregation; GraphX's `shortestPaths` is this same loop).
  *
  * Determinism: weights and distances are BIGINTs, infinity is the
  * sentinel [[Inf]] (min-safe, no NULL handling differences between
  * engines), every round is `min(dist, min(dist_u + w))` — pure
  * integer min/plus, so [[unrolledSql]] (generated from the same
  * constants) replays every round bit-for-bit.
  *
  * Scale shape: identical to [[PageRank]] — the edge table is
  * hash-partitioned by src once and cached; per round only the
  * distance vector (|V| rows) shuffles: once to meet the edges, once
  * for the per-dst min. Rounds are fixed, so no convergence-test
  * collect in the loop.
  */
object ShortestPath {

  /** Distance sentinel for "unreached" (min-safe; any real path is
    * shorter). */
  val Inf = 1000000000000000L

  /** Run `rounds` relax rounds from `sources` (id column) over
    * weighted edges (src, dst, w — BIGINT weight ≥ 0). Returns
    * (id, dist) with dist = exact min-weight over ≤ rounds hops, or
    * [[Inf]] if unreached.
    *
    * Frontier optimization (exactness preserved by induction: a node's
    * distance can only improve via a neighbor improved in the PREVIOUS
    * round, and round 0 improves exactly the sources): each round
    * relaxes only edges out of last round's improved set, so the relax
    * join carries |frontier|-adjacent edges, not all |E| candidates —
    * on wide graphs the early rounds shrink from |E| to ~|sources|·deg.
    * Each round's (dist ⟕ relaxed) is localCheckpoint'd: the reused
    * intermediate is computed once and the iteration lineage stays one
    * round deep (no 2^rounds plan blowup, bounded driver plans). */
  def run(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val ed = edges.repartition(col("src")).cache()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toRelease = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var dist = nodes
      .join(sources.select(col("id")).withColumn("s", lit(1)), Seq("id"), "left")
      .select(col("id"), when(col("s").isNotNull, 0L).otherwise(Inf).as("dist"))
      .persist(lvl)
    toRelease += dist
    var frontier = dist.filter(col("dist") === 0L)
    for (_ <- 1 to rounds) {
      val relaxed = ed
        .join(frontier.select(col("id"), col("dist").as("fd")),
          ed("src") === col("id"))
        .select(ed("dst").as("id"), (col("fd") + col("w")).as("cand"))
        .groupBy("id").agg(min(col("cand")).as("best"))
      // LAZY persist: the final action materializes each round's reused
      // (dist ⟕ relaxed) exactly once (both its dist and frontier
      // consumers hit the cache within that one job) — no per-round
      // count() jobs, and — unlike localCheckpoint, whose RDD the cache
      // manager cannot release — every intermediate is freed below.
      val joined = dist.join(relaxed, Seq("id"), "left").persist(lvl)
      toRelease += joined
      dist = joined.select(col("id"),
        least(col("dist"), coalesce(col("best"), lit(Inf))).as("dist"))
      frontier = joined.filter(col("best") < col("dist"))
        .select(col("id"), col("best").as("dist"))
    }
    // ONE action materializes the whole loop, then every loop cache is
    // released — no session-lifetime cache leak from a library call.
    val out = dist.localCheckpoint()
    toRelease.foreach(_.unpersist(false))
    ed.unpersist(false)
    out
  }

  /** DuckDB replay of [[run]]: one CTE per relax round from the same
    * constants. `edgesSql` SELECTs (src, dst, w); `sourcesSql` SELECTs
    * (id). */
  def unrolledSql(edgesSql: String, sourcesSql: String, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""d$i AS (
         |  SELECT d.id,
         |    LEAST(d.dist, COALESCE(m.best, $Inf)) AS dist
         |  FROM d${i - 1} d LEFT JOIN (
         |    SELECT e.dst AS id, MIN(p.dist + e.w) AS best
         |    FROM e JOIN d${i - 1} p ON p.id = e.src
         |    GROUP BY 1) m ON m.id = d.id)""".stripMargin
    }
    s"""WITH e AS ($edgesSql),
       |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |src AS ($sourcesSql),
       |d0 AS (
       |  SELECT n.id,
       |    CASE WHEN s.id IS NULL THEN $Inf ELSE 0 END AS dist
       |  FROM n LEFT JOIN src s ON s.id = n.id),
       |${roundCtes.mkString(",\n")}""".stripMargin
  }
}
