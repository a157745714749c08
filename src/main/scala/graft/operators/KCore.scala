package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core decomposition (iterative peeling): each round
  * removes nodes whose degree among SURVIVING nodes is < k; after
  * `rounds` rounds the survivor set is the k-core if converged, else a
  * superset (the contract is "r peeling rounds", replayed exactly by
  * the unrolled oracle — the [[ShortestPath]] fixed-iteration
  * pattern). The standard batch formulation: Batagelj–Zaveršnik is the
  * sequential version; distributed peeling converges in O(peel depth)
  * rounds.
  *
  * Scale shape: per round one semi-join of the (cached, src-hash-
  * partitioned) symmetric edge list against the survivor set and one
  * degree aggregation — only the survivor vector (≤ |V|) and degree
  * counts move; lazily persisted rounds materialize in the single
  * final action, then every intermediate is released.
  */
object KCore {

  /** Survivors of `rounds` peeling rounds at threshold k over a
    * SYMMETRIC edge list (src, dst) — returns (id, deg) with each
    * survivor's final-round degree.
    *
    * Iteration cadence (r17): each round's |V|-sized degree frame is an
    * EAGER localCheckpoint — the ConnectedComponents barrier pattern.
    * The previous lazy persist chain deferred all rounds to the single
    * final action, whose plan nested every round's InMemoryRelation:
    * at fixture scale the cost was driver-side planning/scheduling of
    * that one deep plan (q180's 8c/32c scaling ratio was 0.73 —
    * serial), not data. The barriers keep every per-round plan shallow
    * (two joins over a LogicalRDD) and both consumers of `alive` read
    * materialized rows. Blocks are executor-resident and
    * ContextCleaner-reclaimed; on a real cluster an executor loss
    * mid-query recomputes nothing (localCheckpoint is not
    * fault-tolerant) — acceptable for an intra-query barrier, same
    * trade as CC documents. */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val ed = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    var alive = ed.select(col("src").as("id")).distinct()
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      // one |E|-sized join per round (dst-side aliveness), then the
      // node's own aliveness is applied to the |V|-sized degree table —
      // not to the edge table — before the threshold filter
      val degAll = ed
        .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
      deg = degAll.join(alive, Seq("id"), "left_semi").localCheckpoint(true)
      alive = deg.filter(col("deg") >= k).select("id")
    }
    deg.filter(col("deg") >= k)
  }

  /** DuckDB replay of [[run]]: one (edge-restrict, degree, filter) CTE
    * triple per round. `edgesSql` SELECTs a symmetric (src, dst). */
  def unrolledSql(edgesSql: String, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""e$i AS (
         |  SELECT e.src, e.dst FROM e
         |  JOIN a${i - 1} s ON s.id = e.src
         |  JOIN a${i - 1} t ON t.id = e.dst),
         |d$i AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM e$i GROUP BY 1),
         |a$i AS (SELECT id FROM d$i WHERE deg >= $k)""".stripMargin
    }
    s"""WITH e AS ($edgesSql),
       |a0 AS (SELECT DISTINCT src AS id FROM e),
       |${roundCtes.mkString(",\n")}
       |SELECT id, deg FROM d$rounds WHERE deg >= $k""".stripMargin
  }
}
