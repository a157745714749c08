package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Typo-tolerant entity-resolution join — match each dirty record to
  * its best clean counterpart under an edit-distance budget. The
  * text-dedup family (q70-q73, q83) matches near-identical DOCUMENTS
  * by shingle sets; this is the short-string sibling for keys, names
  * and titles, where the right metric is Levenshtein and the right
  * scale trick is BLOCKING: never the O(n²) cross product, but an
  * equi-join on block keys that bound candidates to same-block pairs,
  * then the exact distance filter, then a best-match-per-dirty-record
  * window — the same block → verify → keep-best shape as MinHash-LSH
  * dedup, with the verify step a codegen'd `levenshtein`, no UDF.
  *
  * Blocking scheme: pigeonhole segment blocking (the PassJoin family of
  * published string-similarity joins). Each clean name is split into
  * `maxDist + 1` contiguous segments; if ed(d, c) <= maxDist then at
  * least one segment is untouched by every edit and appears verbatim in
  * the dirty name, shifted by at most maxDist positions. The dirty side
  * therefore probes, for every candidate clean length within ±maxDist
  * of its own, every segment's substring at every shift in ±maxDist —
  * a constant (~(2·maxDist+1)²·(maxDist+1)) number of probe keys per
  * row. This refinement is COMPLETE: it returns exactly the candidate
  * set of the naive "shared prefix AND |Δlen| <= maxDist" block (the
  * oracle's formulation), so results are identical — but block keys are
  * (prefix, segment-index, length, segment-text), whose entropy comes
  * from mid-string content rather than a short shared prefix.
  *
  * Scale shape: resolution runs on DISTINCT names, never on rows.
  * Real entity columns repeat heavily (the fixture's part names: 64
  * distinct values over 20k rows), so row-level blocking is inherently
  * quadratic — every same-name pair re-verifies the same distance. Both
  * sides are first collapsed to their distinct names (the clean side
  * keeping min(id) per name, which preserves the min-clean-id tie-break
  * bit-for-bit), candidates are generated and verified once per NAME
  * pair, and the per-name best match is mapped back to rows with one
  * equi-join. As data grows the name space saturates, so verify work
  * approaches a constant while the row map-back stays linear; with
  * fully unique names it degrades gracefully to per-row resolution.
  * Candidate count on the name level is bounded by segment-key
  * collisions (high-entropy mid-string content, |block| stays small
  * even when a short prefix is shared by thousands of names).
  */
object FuzzyJoin {

  /** Even-partition segment bounds: segment `j` of a length-`len` string
    * spans [floor(len·j/segs), floor(len·(j+1)/segs)). */
  private def segStart(len: Column, j: Int, segs: Int): Column =
    floor(len * j / segs).cast("int")

  /** Resolve `dirty` (id, name) against `clean` (id, name).
    *
    * @param maxDist   edit-distance budget (also the length-difference
    *                  bound enforced by the length-aware block keys)
    * @param prefixLen candidates must share their first `prefixLen`
    *                  chars (typos inside the prefix fall out of the
    *                  candidate set — the blocking recall trade-off,
    *                  identical on the oracle side)
    * @return (dirty_id, dirty_name, clean_id, clean_name, dist) — the
    *         single best match per dirty id (lowest dist, ties to the
    *         lowest clean id); dirty ids with no in-budget candidate
    *         are absent
    */
  def resolve(dirty: DataFrame, clean: DataFrame, maxDist: Int,
      prefixLen: Int): DataFrame = {
    val segs = maxDist + 1
    // collapse both sides to distinct names; min(id) per clean name keeps
    // the (dist, clean_id) tie-break exact — within a name group every row
    // has the same dist, so only the group's min id can ever win
    val cleanNames = clean.groupBy(col("name"))
      .agg(min(col("id")).as("id"))
    val dirtyNames = dirty.select(col("name")).distinct()
    // clean side: one key per segment — (block, j, own length, segment text)
    val c = cleanNames.select(col("id").as("clean_id"),
      col("name").as("clean_name"),
      substring(col("name"), 1, prefixLen).as("block"),
      length(col("name")).as("l"))
    val cKeys = c.select(col("clean_id"), col("clean_name"), col("block"),
      col("l"),
      explode(array((0 until segs).map { j =>
        val s = segStart(col("l"), j, segs)
        val e = segStart(col("l"), j + 1, segs)
        struct(lit(j).as("j"),
          col("clean_name").substr(s + 1, e - s).as("sub"))
      }: _*)).as("k"))
      .select(col("clean_id"), col("clean_name"), col("block"), col("l"),
        col("k.j").as("j"), col("k.sub").as("sub"))
      .filter(length(col("sub")) > 0)
    // dirty side: probe every (candidate length, segment, shift) — the
    // pigeonhole guarantee needs only shifts within ±maxDist
    val d = dirtyNames.select(col("name").as("dirty_name"),
      substring(col("name"), 1, prefixLen).as("block"),
      length(col("name")).as("m"))
    val probes = for {
      dl <- -maxDist to maxDist
      j <- 0 until segs
      sh <- -maxDist to maxDist
    } yield {
      val l = col("m") + dl // candidate clean length
      val s = segStart(l, j, segs)
      val e = segStart(l, j + 1, segs)
      val p = s + sh // shifted start within the dirty name
      val valid = l > lit(0) && e > s && p >= lit(0) && (p + (e - s)) <= col("m")
      when(valid, struct(lit(j).as("j"), l.cast("int").as("l"),
        col("dirty_name").substr(p + 1, e - s).as("sub")))
        .otherwise(lit(null))
    }
    val dKeys = d.select(col("dirty_name"), col("block"),
        explode(array_distinct(array(probes: _*))).as("k"))
      .filter(col("k").isNotNull)
      .select(col("dirty_name"), col("block"),
        col("k.j").as("j"), col("k.l").as("l"), col("k.sub").as("sub"))
    // equi-join on the composed key; joining dirty's probed length to the
    // clean side's actual length enforces |Δlen| <= maxDist by construction
    val cand = dKeys.join(cKeys, Seq("block", "j", "l", "sub"))
      .select("dirty_name", "clean_id", "clean_name")
      .distinct() // a pair can match on several segment keys — verify once
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")))
      .filter(col("dist") <= maxDist)
    val best = Window.partitionBy("dirty_name")
      .orderBy(col("dist"), col("clean_id"))
    val bestPerName = cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("dirty_name").as("name"), col("clean_id"),
        col("clean_name"), col("dist"))
    // map the per-name resolution back to rows (AQE broadcasts the
    // resolved-name side when the name space is small, the common case)
    dirty.select(col("id").as("dirty_id"), col("name"))
      .join(bestPerName, "name")
      .select(col("dirty_id"), col("name").as("dirty_name"),
        col("clean_id"), col("clean_name"), col("dist"))
  }
}
