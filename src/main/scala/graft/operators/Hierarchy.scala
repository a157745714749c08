package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by POINTER DOUBLING: every node's (root, depth)
  * in O(log depth) rounds instead of the O(depth) parent-at-a-time
  * walk — each round rewires a node's ancestor pointer to its
  * ancestor's ancestor and adds the two hop counts, so the covered
  * distance doubles per round (the classic parallel list-ranking /
  * Wheeler-pointer-jumping scheme; [[ConnectedComponents]] uses the
  * label form of the same idea). The org-chart / category-tree
  * materialization every warehouse dimension build needs.
  *
  * Scale shape: per round ONE |V|-sized self-equi-join on the current
  * ancestor pointer — no per-level frontier, no |V|·depth blowup; a
  * depth-1M chain still flattens in 20 rounds.
  */
object Hierarchy {

  /** (id, root, depth) for every node of a forest given (id, parent) —
    * roots are the nodes with parent == id; `rounds` must satisfy
    * 2^rounds ≥ max depth. */
  def flatten(nodes: DataFrame, rounds: Int): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toRelease = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var state = nodes.select(col("id"), col("parent").as("anc"),
      when(col("parent") === col("id"), 0L).otherwise(1L).as("d"))
    for (_ <- 1 to rounds) {
      val s = state.persist(lvl)
      toRelease += s
      state = s.alias("x")
        .join(s.select(col("id").as("anc"), col("anc").as("anc2"),
          col("d").as("d2")).alias("y"), Seq("anc"))
        .select(col("id"), col("anc2").as("anc"),
          (col("d") + col("d2")).as("d"))
    }
    val out = state.select(col("id"), col("anc").as("root"),
      col("d").as("depth")).localCheckpoint()
    toRelease.foreach(_.unpersist(false))
    out
  }
}
