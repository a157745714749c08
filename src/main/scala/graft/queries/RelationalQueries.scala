package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._

/** Core relational block (SURVEY §2.1–2.4, 2.6, 2.7): scans, projections,
  * filters, every join kind, hash aggregation, set ops, sorts.
  *
  * Each query is a declarative DataFrame plan over the driver's testdata
  * tables; Catalyst handles pushdown/pruning/join strategy. Scale notes
  * sit on the queries where the plan choice matters at 100 TB.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1/P1/A1/A2/A3 — TPC-H Q1-shaped pricing summary.
    // Scale: single hash-agg with map-side partial aggregation; the
    // l_shipdate filter is pushed into the parquet scan.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          dsumCharge(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("sum_charge"),
          dmean(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"),
          count_if(col("l_discount") > 0.05).as("count_discounted"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1 — projection with rename + cast.
    "q02_projection_cast" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey").as("orderkey"),
          col("o_custkey").cast(StringType).as("custkey_str"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("price2"),
          to_date(col("o_orderdate")).as("odate"))
        .orderBy("orderkey")
    }),

    // P2 — SELECT * EXCEPT(col) via drop.
    "q03_except_columns" -> ((s, dir) => {
      t(s, dir, "nation").drop("n_comment", "n_regionkey").orderBy("n_nationkey")
    }),

    // P3/P4 — star expansion + computed cols + compound boolean predicate.
    "q04_filter_complex" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("*"), (col("o_totalprice") > 150000).as("is_big"))
        .filter((col("o_orderstatus") === "F" || col("o_orderstatus") === "O") &&
          col("o_totalprice").between(1000, 200000) &&
          !col("o_orderpriority").startsWith("3"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "is_big")
        .orderBy("o_orderkey")
    }),

    // P5 — regex predicate (rlike).
    "q05_regex_filter" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_type").rlike("^(STANDARD|LARGE) (ANODIZED|BRUSHED)"))
        .select("p_partkey", "p_type").orderBy("p_partkey")
    }),

    // P6 — parameterized membership predicate (IN UNNEST(@list)).
    "q06_param_in" -> ((s, dir) => {
      val segs = Seq("BUILDING", "MACHINERY")  // the bound @segments param
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin(segs: _*))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // J1/A1 — inner equi-join + group. Scale: lineitem⋈orders is the
    // big shuffle join; both sides hash-partition on the key, AQE picks
    // SMJ vs shuffled-hash. No broadcast (both sides large).
    "q07_join_inner" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // J2 — left outer join keeping customers without orders.
    "q08_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // J3 — full outer join of two aggregates (CrUX⟗Tranco shape,
    // etl/siterank.py:236-243: FULL OUTER JOIN USING(k) + coalesce).
    "q09_join_full" -> ((s, dir) => {
      val custN = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val suppN = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      custN.join(suppN, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // J4 — cross join against a small dimension + conditional agg
    // (scored_site_reports shape). Scale: explicit broadcast of the dim.
    "q10_cross_small_dim" -> ((s, dir) => {
      val thresholds = s.range(1, 4).select((col("id") * 50000).as("threshold"))
      val o = t(s, dir, "orders")
      o.crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(count_if(col("o_totalprice") > col("threshold")).as("n_above"))
        .orderBy("threshold")
    }),

    // J7 — left-semi join (EXISTS).
    "q11_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // J8 — left-anti join (NOT EXISTS / orphan detection,
    // broken-site-report-ml/main.py:206-226).
    "q12_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
    }),

    // J10 — non-equi θ-join against broadcast thresholds (rank-tier shape,
    // WEBCOMPAT_METRIC_SCORE_SITE_RANK_MODIFIER routine.sql:5-7).
    // Scale: BNLJ with the tiny side broadcast — never shuffle the fact.
    "q13_theta_join" -> ((s, dir) => {
      val tiers = s.createDataFrame(Seq((10, "small"), (25, "medium"), (50, "large")))
        .toDF("max_size", "tier")
      val p = t(s, dir, "part")
      p.join(broadcast(tiers), p("p_size") <= tiers("max_size"))
        .groupBy("tier").agg(count(lit(1)).as("n_parts"))
        .orderBy("tier")
    }),

    // J11 — OR-condition join (bugs_platform_data/view.sql:50-53).
    // Scale: an OR join forces BNLJ; keep the broadcast side tiny, or
    // rewrite as a union of two equi-joins + distinct when both are big.
    "q14_or_join" -> ((s, dir) => {
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey") || n("n_name") === r("r_name"))
        .select("n_nationkey", "n_name", "r_regionkey", "r_name")
        .orderBy("n_nationkey", "r_regionkey")
    }),

    // J13/W6 — self-join of an aggregate to its "ALL" row
    // (desktop_mau_dau.py:366-369 global-vs-country shape).
    "q15_self_join_share" -> ((s, dir) => {
      val byPrio = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("prio_total"))
      val overall = t(s, dir, "orders").agg(dsum(col("o_totalprice")).as("grand_total"))
      byPrio.crossJoin(broadcast(overall))
        .select(col("o_orderpriority"), col("prio_total"),
          (col("prio_total") / col("grand_total")).as("share"))
        .orderBy("o_orderpriority")
    }),

    // J15/A8 — as-of-ish latest-row join: aggregate MAX then join back
    // (bugs_platform_data/view.sql:65-66).
    "q16_latest_row_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val latest = o.groupBy(col("o_custkey").as("custkey"))
        .agg(max(col("o_orderdate")).as("last_date"))
      o.join(latest, o("o_custkey") === latest("custkey") && o("o_orderdate") === latest("last_date"))
        .groupBy(col("custkey"))
        .agg(max(col("o_totalprice")).as("last_price"), max(col("o_orderdate")).as("last_date"))
        .orderBy("custkey")
    }),

    // A4 — COUNT(DISTINCT) / DISTINCT.
    "q17_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"))
        .orderBy("o_orderstatus")
    }),

    // O2/O3 — ORDER BY ... LIMIT 1 argmax with deterministic tiebreak
    // (features_latest/view.sql:1-8). Scale: Spark turns this into a
    // TakeOrderedAndProject — no global sort materialization.
    "q18_argmax_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(5)
    }),

    // O1 — global ORDER BY presentation of an aggregate.
    "q19_global_order" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("total_bal").desc, col("n_name"))
    }),

    // U1/A22 — hand-rolled rollup via UNION ALL (mau_dau.sql:1-48 shape).
    "q20_union_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val per = o.groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
      val all = o.agg(count(lit(1)).as("n")).select(lit("ALL").as("status"), col("n"))
      per.unionByName(all).orderBy("status")
    }),

    // U2 — UNION DISTINCT (platform_priorities/view.sql:34,63).
    "q21_union_distinct" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.union(sn).distinct().orderBy("nationkey")
    }),

    // U3 — EXCEPT DISTINCT (platform_priorities/view.sql:50).
    "q22_except_distinct" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.except(sn).orderBy("nationkey")
    }),

    // U4 — INTERSECT (unused in reference; included for completeness).
    "q23_intersect" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy("nationkey")
    }),

    // A22 — native GROUPING SETS replacing the reference's UNION fan-out
    // (graphics_dashboard.sql:199-215). Scale: one shuffle instead of N.
    "q24_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("n"), col("total"))
        .orderBy("status")
    }),

    // Native CUBE over two dimensions (q24's ROLLUP widened to all 4
    // grouping sets in ONE shuffle) with grouping_id() published so
    // subtotal rows are distinguishable from real NULL groups — the
    // engine-portable disambiguator (both engines pack the grouping
    // bits first-column-most-significant).
    "q206_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          grouping_id().cast(LongType).as("gid"))
        .select(col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("total"))
        .orderBy("gid", "status", "prio")
    }),

    // Explicit GROUPING SETS (the irregular-subtotal form neither
    // ROLLUP q24 nor CUBE q206 covers): exactly the three sets
    // (status, priority), (status), () — skipping the (priority)-only
    // set a full cube would add — in ONE shuffle, with grouping_id
    // disambiguation. The reference's dashboard UNION fan-outs are
    // this shape.
    "q232_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
          |    AS gid,
          |  COALESCE(o_orderstatus, 'ALL') AS status,
          |  COALESCE(o_orderpriority, 'ALL') AS prio,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), ())
          |ORDER BY gid, status, prio""".stripMargin)
    }),

    // Pareto frontier — "cheapest-and-newest" orders: no other order is
    // both ≤ price and ≥ date (strict in one). The oracle runs the
    // textbook O(n²) NOT EXISTS self-join; the engine runs the grid-
    // pruned single-window rewrite (operators/Skyline) — no self-join.
    "q163_skyline" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_totalprice").as("p"),
        datediff(to_date(col("o_orderdate")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast(LongType).as("d"))
      graft.operators.Skyline.skyline2D(
          o.select(col("p"), (-col("d")).as("nd")),
          xCol = "p", yCol = "nd", bucketWidth = Some(10000.0))
        .select(col("p").as("o_totalprice"), (-col("nd")).as("order_day"))
        .orderBy("o_totalprice")
    }),

    // Skew-salted join — the explicit hot-key spreading form (AQE's
    // skew split can't reach inside cached stages): the events fact is
    // salted 8 ways on a stable row hash, the 5-row event-type dim is
    // exploded ×8, and the equi-join result is aggregated. The oracle
    // is the UNSALTED plain join — proving salt-invariance of the join
    // semantics, which is the whole correctness obligation of salting.
    "q152_salted_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val dim = e.groupBy("event_type")
        .agg(count(lit(1)).as("type_n"))
      graft.operators.SkewSalt.saltedJoin(
          e.select(col("event_type"), col("event_id"), col("user_id")),
          dim, key = "event_type", factIdCols = Seq("event_id"),
          saltFactor = 8)
        .groupBy(pmod(col("user_id"), lit(16)).as("user_bucket"))
        .agg(count(lit(1)).as("n_events"), sum(col("type_n")).as("sum_type_n"))
        .orderBy("user_bucket")
    }),

    // S17 — deterministic bucket sampling (sample_id < n shape,
    // UO summary.sql:30). Bucket via a portable hash both engines share.
    "q25_sample_scan" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("sample_bucket", pmod(col("o_orderkey"), lit(100)))
        .filter(col("sample_bucket") < 10)
        .groupBy("sample_bucket").agg(count(lit(1)).as("n"))
        .orderBy("sample_bucket")
    })
  )

  private val dec = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q163_skyline" ->
      """WITH od AS (
        |  SELECT DISTINCT o_totalprice AS p,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS d
        |  FROM orders)
        |SELECT a.p AS o_totalprice, a.d AS order_day
        |FROM od a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM od b
        |  WHERE b.p <= a.p AND b.d >= a.d AND (b.p < a.p OR b.d > a.d))
        |ORDER BY 1""".stripMargin,
    "q152_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY 1)
        |SELECT e.user_id % 16 AS user_bucket,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(d.type_n) AS BIGINT) AS sum_type_n
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order,
        |  count_if(l_discount > 0.05)::BIGINT AS count_discounted
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_projection_cast" ->
      """SELECT o_orderkey AS orderkey, CAST(o_custkey AS VARCHAR) AS custkey_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price2,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM orders ORDER BY orderkey""".stripMargin,
    "q03_except_columns" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "q04_filter_complex" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice > 150000 AS is_big
        |FROM orders
        |WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 200000
        |  AND NOT starts_with(o_orderpriority, '3')
        |ORDER BY o_orderkey""".stripMargin,
    "q05_regex_filter" ->
      """SELECT p_partkey, p_type FROM part
        |WHERE regexp_matches(p_type, '^(STANDARD|LARGE) (ANODIZED|BRUSHED)')
        |ORDER BY p_partkey""".stripMargin,
    "q06_param_in" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
        |WHERE c_mktsegment IN ('BUILDING','MACHINERY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q07_join_inner" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q08_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q09_join_full" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  USING (nationkey)
        |ORDER BY nationkey""".stripMargin,
    "q10_cross_small_dim" ->
      """SELECT threshold, count_if(o_totalprice > threshold)::BIGINT AS n_above
        |FROM orders CROSS JOIN (SELECT (g+1)*50000 AS threshold FROM generate_series(0,2) t(g)) d
        |GROUP BY threshold ORDER BY threshold""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q13_theta_join" ->
      """SELECT tier, COUNT(*) AS n_parts
        |FROM part JOIN (VALUES (10,'small'),(25,'medium'),(50,'large')) tiers(max_size, tier)
        |  ON p_size <= max_size
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "q14_or_join" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey OR n_name = r_name
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,
    "q15_self_join_share" ->
      s"""SELECT o_orderpriority, prio_total, prio_total / grand_total AS share
         |FROM (SELECT o_orderpriority, ${dec.format("o_totalprice")} AS prio_total
         |      FROM orders GROUP BY o_orderpriority) p
         |CROSS JOIN (SELECT ${dec.format("o_totalprice")} AS grand_total FROM orders) g
         |ORDER BY o_orderpriority""".stripMargin,
    "q16_latest_row_join" ->
      """SELECT o.o_custkey AS custkey, MAX(o.o_totalprice) AS last_price, MAX(o.o_orderdate) AS last_date
        |FROM orders o
        |JOIN (SELECT o_custkey, MAX(o_orderdate) AS last_date FROM orders GROUP BY o_custkey) l
        |  ON o.o_custkey = l.o_custkey AND o.o_orderdate = l.last_date
        |GROUP BY o.o_custkey ORDER BY custkey""".stripMargin,
    "q17_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q18_argmax_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5""".stripMargin,
    "q19_global_order" ->
      s"""SELECT n_name, ${dec.format("c_acctbal")} AS total_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY total_bal DESC, n_name""".stripMargin,
    "q20_union_rollup" ->
      """SELECT * FROM (
        |  SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL' AS status, COUNT(*) AS n FROM orders
        |) ORDER BY status""".stripMargin,
    "q21_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q22_except_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q23_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q24_grouping_sets" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n,
         |  ${dec.format("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP(o_orderstatus) ORDER BY status""".stripMargin,
    "q25_sample_scan" ->
      """SELECT o_orderkey % 100 AS sample_bucket, COUNT(*) AS n
        |FROM orders WHERE o_orderkey % 100 < 10
        |GROUP BY 1 ORDER BY sample_bucket""".stripMargin,
    "q232_grouping_sets" ->
      s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
         |    AS gid,
         |  COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS prio,
         |  COUNT(*) AS n, ${dec.format("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), ())
         |ORDER BY gid, status, prio""".stripMargin,
    "q206_cube" ->
      s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
         |    AS gid,
         |  COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS prio,
         |  COUNT(*) AS n, ${dec.format("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY gid, status, prio""".stripMargin
  )
}
