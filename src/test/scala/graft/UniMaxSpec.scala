package graft

import org.apache.spark.sql.functions._
import graft.llm.UniMax

/** UniMax waterfilling: the closed-form (prefix-test) allocation must
  * satisfy the allocation invariants on real data and on adversarial
  * budgets — conservation, cap-respect, equal water level for uncapped
  * sources, and the two degenerate budgets (everything capped /
  * nothing capped). */
class UniMaxSpec extends SparkTestBase {

  // domain = source-suffix first digit: one domain is ~11x the others
  // (src1 + src10..src19), the structurally skewed mixture the query
  // surface (q278) uses — the raw sources are near-uniform and the
  // 2-epoch cap never binds on them at a proportional budget
  private lazy val counts = graft.util.Tables.t(spark, sfDir, "documents")
    .groupBy(substring(col("source"), 4, 1).as("domain"))
    .agg(sum(size(split(col("text"), "\\s+")).cast("long")).as("n_tok"))

  private def run(budgetExpr: String) = UniMax.allocate(
    counts, expr(budgetExpr), epochCap = 2, srcCol = "domain")
    .collect().toSeq

  private def invariants(rows: Seq[org.apache.spark.sql.Row],
      budget: Long): Unit = {
    val alloc = rows.map(_.getAs[Long]("alloc_tok"))
    val cap = rows.map(_.getAs[Long]("cap"))
    val capped = rows.map(_.getAs[Int]("is_capped") == 1)
    val leftover = rows.head.getAs[Long]("leftover")
    // conservation: every token of B is either allocated or leftover
    assert(alloc.sum + leftover === budget)
    assert(leftover >= 0)
    // nobody is asked for more than their epoch cap
    rows.indices.foreach(i => assert(alloc(i) <= cap(i)))
    // capped sources take exactly their cap
    rows.indices.filter(capped).foreach(i => assert(alloc(i) === cap(i)))
    // uncapped sources share one integer water level, and the level
    // dominates every capped cap (else that source should be uncapped)
    val levels = rows.indices.filterNot(capped).map(alloc)
    assert(levels.distinct.size <= 1)
    levels.headOption.foreach { lvl =>
      rows.indices.filter(capped).foreach(i => assert(cap(i) <= lvl)) }
  }

  test("1.5x-corpus budget: invariants hold and both regimes occur") {
    val rows = run("(sum(n_tok) OVER () * 3) DIV 2")
    val budget = counts.agg(expr("(sum(n_tok) * 3) DIV 2").as("b"))
      .collect().head.getLong(0)
    invariants(rows, budget)
    // the 11x domain skew makes the 2-epoch cap bind on the small
    // domains while the big one sits at the water level
    assert(rows.exists(_.getAs[Int]("is_capped") == 1))
    assert(rows.exists(_.getAs[Int]("is_capped") == 0))
    // dust bound: with an uncapped domain present, leftover is the
    // integer-division remainder, strictly below the domain count
    assert(rows.head.getAs[Long]("leftover") < rows.size)
  }

  test("budget above total caps: everyone capped, surplus is leftover") {
    val rows = run("sum(n_tok) OVER () * 4")
    val budget = counts.agg(expr("sum(n_tok) * 4").as("b")).collect().head.getLong(0)
    invariants(rows, budget)
    assert(rows.forall(_.getAs[Int]("is_capped") == 1))
    assert(rows.forall(r => r.getAs[Long]("alloc_tok") === r.getAs[Long]("cap")))
  }

  test("tiny budget: nobody capped, equal split of B") {
    val rows = run("CAST(count(*) OVER () * 3 AS BIGINT)") // 3 tokens per source
    invariants(rows, rows.size * 3L)
    assert(rows.forall(_.getAs[Int]("is_capped") == 0))
    assert(rows.forall(_.getAs[Long]("alloc_tok") === 3L))
  }

  test("allocateGrid arm == allocate on that arm's slice (q305 shape)") {
    // the grid run must be EXACTLY per-arm-independent: for every
    // leave-one-out arm, the partitioned windows give the same rows
    // as a standalone allocate over the filtered counts
    val b = counts.agg(expr("CAST((sum(n_tok) * 3) DIV 2 AS BIGINT)").as("b"))
      .collect().head.getLong(0)
    val armed = counts.withColumn("b", lit(b))
    val domains = counts.select("domain").collect().map(_.getString(0))
    val grid = UniMax.allocateGrid(
      domains.map(d => armed.filter(col("domain") =!= d)
          .withColumn("arm", lit(s"drop_$d")))
        .reduce(_ unionAll _),
      col("b"), epochCap = 2, armCol = "arm", srcCol = "domain")
      .collect().groupBy(_.getAs[String]("arm"))
    domains.foreach { d =>
      val solo = UniMax.allocate(armed.filter(col("domain") =!= d),
          lit(b), epochCap = 2, srcCol = "domain")
        .collect().map(r => (r.getAs[String]("domain"),
          r.getAs[Long]("alloc_tok"), r.getAs[Int]("is_capped"),
          r.getAs[Long]("leftover"))).toSet
      val fromGrid = grid(s"drop_$d").map(r => (r.getAs[String]("domain"),
        r.getAs[Long]("alloc_tok"), r.getAs[Int]("is_capped"),
        r.getAs[Long]("leftover"))).toSet
      assert(fromGrid == solo, s"arm drop_$d diverged from standalone")
    }
  }
}
