package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog apply — the MERGE INTO / Delta-style upsert the
  * reference approximates with delete-then-insert idempotency and
  * UPDATE...FROM rewrites (SURVEY §2.10 D2/D3; q91 covers the UPDATE
  * rewrite). This operator covers the general changelog form those
  * patterns are special cases of: a stream of (key, seq, op ∈ I/U/D,
  * payload) rows, possibly OUT OF ORDER and with multiple changes per
  * key, folded onto a base snapshot:
  *
  *  - latest-wins: per key, the change with the highest (seq, op)
  *    wins ('U' beats 'D' on an exact seq tie — the documented,
  *    engine-portable ASCII tiebreak);
  *  - tombstones: a winning 'D' removes the key;
  *  - untouched snapshot keys pass through unchanged.
  *
  * Scale shape: one window shuffle of the CHANGELOG by key (the small
  * side in steady-state CDC — the snapshot is never windowed), then
  * one join of the snapshot against the distilled per-key verdict.
  * With the changelog batch ≪ snapshot, that join broadcasts; with
  * both bucketed by key it is zero-shuffle. No full-outer join, no
  * read-modify-write loop — the snapshot is touched exactly once,
  * which is what makes the pattern viable as a daily MERGE over a
  * 100 TB table.
  */
object CdcApply {

  /** Distill a changelog to its per-key winning row. `seqCols` must
    * give a total order per key (ties broken by op desc: 'U' > 'I' >
    * 'D' in ASCII — update beats delete on an exact tie). */
  def latest(changelog: DataFrame, key: String,
      seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(seqCols.map(c => col(c).desc) :+ col("op").desc: _*)
    changelog.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Apply the changelog to a snapshot. Payload columns of the two
    * frames must align (same names/types); `op`/seq columns are
    * stripped from the result. Adds `from_change`: whether the row
    * came from the changelog (upsert) or passed through untouched. */
  def apply(snapshot: DataFrame, changelog: DataFrame, key: String,
      seqCols: Seq[String]): DataFrame = {
    val win = latest(changelog, key, seqCols).cache()
    val payload = snapshot.columns.toSeq
    val untouched = snapshot
      .join(win.select(key), Seq(key), "left_anti")
      .withColumn("from_change", lit(false))
    val upserts = win.filter(col("op") =!= "D")
      .select(payload.map(col) :+ lit(true).as("from_change"): _*)
    untouched.unionByName(upserts)
  }
}
