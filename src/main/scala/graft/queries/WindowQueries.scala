package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._
import graft.operators.Dedup

/** Window-function block (SURVEY §2.5): dedup-latest, deterministic
  * hash dedup, lag family, rolling means, partition-broadcast,
  * bucketed row-number pairing.
  *
  * All windows partition by a real key (client/user/type) — at 100 TB
  * each window is one hash shuffle on its partition key and streams
  * within partitions; no global windows anywhere.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Additive seasonal decomposition on the daily revenue series:
    // trend = centered 7-day window (published as the INTEGER cents
    // sum, null-free only where the window is full), seasonal =
    // day-of-week mean (published as exact integer numerator/
    // denominator plus the derived double), residual = daily − trend/7
    // − seasonal. Every float derives from identical integers via
    // identical IEEE ops, so the decomposition replays bit-for-bit.
    "q181_seasonal_decompose" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast(LongType))
          .as("daily_cents"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val trended = daily
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("trend7",
          when(col("n7") === 7, sum(col("daily_cents")).over(w7)))
        .drop("n7")
        // engine-free day-of-week: (epoch_day + 4) mod 7, Sunday = 0
        // (Spark's dayofweek is 1-based, DuckDB's 0-based — sidestep)
        .withColumn("dow", pmod(datediff(col("day"),
          lit(java.sql.Date.valueOf("1970-01-01"))) + 4, lit(7))
          .cast(LongType))
      val seas = trended.groupBy("dow")
        .agg(sum("daily_cents").as("seas_num"),
          count(lit(1)).as("seas_den"))
      trended.join(broadcast(seas), "dow")
        .select(col("day"), col("daily_cents"), col("trend7"), col("dow"),
          (col("seas_num").cast(DoubleType) / col("seas_den"))
            .as("seasonal"),
          when(col("trend7").isNotNull,
            col("daily_cents") - col("trend7") / lit(7.0) -
              col("seas_num").cast(DoubleType) / col("seas_den"))
            .as("residual"))
        .orderBy("day")
    }),

    // Event-time lateness audit — the watermark-sizing question every
    // streaming deployment answers first: with arrival order = event_id
    // per event_type stream, an event is late-beyond-watermark iff its
    // event time trails the stream's running max by > 1 hour. One
    // window pass per stream partition, exact integer counters.
    "q182_lateness_audit" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val e = t(s, dir, "events").select(col("event_type"),
        col("event_id"),
        graft.functions.BqShims.epochMicros(col("ts")).as("tsm"))
      val w = Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("hwm", max(col("tsm")).over(w))
        .withColumn("late",
          (col("hwm").isNotNull && col("tsm") < col("hwm") - hourUs)
            .cast(LongType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("late").as("n_late"),
          max(when(col("late") === 1, col("hwm") - col("tsm")))
            .as("max_lateness_us"))
        .orderBy("event_type")
    }),

    // Per-key gap fill: each user's daily error-count series densified
    // onto its own [min,max] day spine (per-key sequence explode — no
    // global calendar join), holes repaired by forward-fill and by
    // linear interpolation (exact-integer numerator, one IEEE divide →
    // engine-portable). One shuffle by user_id carries the spine and
    // both window fills.
    "q131_gap_fill" -> ((s, dir) => {
      val obs = t(s, dir, "events")
        .filter(col("event_type") === "error")
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")),
            lit(java.sql.Date.valueOf("1970-01-01"))).cast(LongType).as("day"))
        .agg(count(lit(1)).as("v"))
      graft.operators.GapFill.fillDaily(obs, key = "user_id")
        .select(col("user_id"), col("day"), col("is_gap"), col("ffill"),
          col("lerp"))
        .orderBy("user_id", "day")
    }),

    // Last-touch attribution via the union-carry trick: touches and
    // conversions share ONE stream ordered per user, the latest touch
    // is carried forward with last(ignoreNulls), and the 3-day lookback
    // is a post-predicate — no range join, one shuffle, one window.
    "q134_attribution" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id").as("key"),
        graft.functions.BqShims.epochMicros(col("ts")).as("ts"),
        col("event_type").as("kind"),
        col("event_id").as("id"))
      graft.operators.Attribution.lastTouch(e,
          touchKinds = Seq("click", "view"), convKind = "purchase",
          lookback = 259200000000L) // 3 days in micros
        .orderBy("key", "conv_id")
    }),

    // Linear MULTI-touch attribution (q134's single-credit rule
    // generalized): every click/view within 3 days BEFORE the user's
    // next purchase shares that purchase's credit equally, in integer
    // micro-units (floor(1e12/n) per touch — exact sums in any engine,
    // documented <n shortfall). The REVERSE union-carry: one window
    // pass ordered (ts DESC, id DESC) carries the nearest FOLLOWING
    // conversion onto each touch — no range join; then a conversion-
    // sized count joins back. Published as the per-channel rollup.
    "q207_multitouch" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id").as("key"),
        graft.functions.BqShims.epochMicros(col("ts")).as("ts"),
        col("event_type").as("kind"), col("event_id").as("id"))
      graft.operators.Attribution.linearMultiTouch(e,
          touchKinds = Seq("click", "view"), convKind = "purchase",
          lookahead = 259200000000L)
        .groupBy("touch_kind")
        .agg(count(lit(1)).as("n_touches"),
          count_distinct(col("conv_id")).as("n_convs"),
          sum("credit").as("credit_units"))
        .orderBy("touch_kind")
    }),

    // Generalized as-of join (merge_asof/kdb-aj): every purchase picks
    // the user's latest click at-or-before it, within a 1-day
    // tolerance — via the union-carry rewrite (one shuffle by user, one
    // sort, zero joins) instead of the O(|L|·|R|)-per-key range θ-join.
    // Clicks are pre-deduped to one row per (user, ts) so the oracle's
    // NATIVE DuckDB ASOF JOIN — a genuinely independent implementation —
    // agrees deterministically on ties.
    "q143_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("tsu", graft.functions.BqShims.epochMicros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu"),
          col("event_id").as("conv_id"), col("value").as("conv_value"))
      val wDedup = Window.partitionBy("user_id", "tsu")
        .orderBy(col("event_id").desc)
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
        .select(col("user_id"), col("tsu"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      graft.operators.AsOfJoin.backward(purchases, clicks,
          key = "user_id", ts = "tsu", rightTieBreak = "click_id",
          tolerance = Some(86400000000L)) // 1 day in micros
        .select(col("user_id"), col("conv_id"), col("tsu").as("conv_ts"),
          col("r_click_id").as("click_id"),
          col("r_tsu").as("click_ts"),
          col("r_click_value").as("click_value"),
          (col("tsu") - col("r_tsu")).as("gap_us"))
        .orderBy("user_id", "conv_id")
    }),

    // Range join without an equi-key: purchases falling inside each
    // error's 2-hour incident window, across ALL users — the pure
    // point-in-interval θ-join Spark would otherwise plan as a nested
    // loop. Bin-explode (bin = interval width) turns it into an
    // equi-join on the bin with the range check as a post-filter;
    // candidate pairs are Σ|P_bin|·|I_bin|, not |P|·|I|. The oracle IS
    // the naive inequality join (DuckDB's IEJoin) — proving the
    // rewrite, not replaying it.
    "q144_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("tsu", graft.functions.BqShims.epochMicros(col("ts")))
      val twoH = 7200000000L
      val intervals = e.filter(col("event_type") === "error")
        .select(col("event_id").as("interval_id"), col("tsu").as("lo"),
          (col("tsu") + twoH).as("hi"))
      val points = e.filter(col("event_type") === "purchase")
        .select(col("tsu").as("pts"))
      graft.operators.IntervalJoin.countPerInterval(intervals, points,
          lo = "lo", hi = "hi", ts = "pts", binWidth = twoH,
          idCols = Seq("interval_id"))
        .select("interval_id", "n_points", "first_ts", "last_ts")
        .orderBy("interval_id")
    }),

    // Quantile discretizer (the feature-engineering bucketizer): each
    // order's price decile WITHIN its priority class via ntile(10) on a
    // uniquely tie-broken order — deterministic bucket membership both
    // engines agree on — then per-(priority, decile) count + integer-
    // exact price bounds. One shuffle by priority, one window.
    "q151_quantile_discretize" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("decile", ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("o_orderpriority", "decile")
    }),

    // ORDERED funnel with per-step deadlines — signup → first click
    // within 7 days → first purchase within 7 days OF THE CLICK (q67's
    // funnel counts ignore order; this is the strict sequential form).
    // Composed from TWO forward as-of joins (AsOfJoin.forward), i.e.
    // two union-carry window passes — no range joins anywhere. The
    // oracle chains DuckDB's native ASOF JOIN twice.
    "q156_ordered_funnel" -> ((s, dir) => {
      val week7 = 604800000000L // 7 days in micros
      val e = t(s, dir, "events")
        .withColumn("tsu", graft.functions.BqShims.epochMicros(col("ts")))
      def firstPer(kind: String, tsName: String, idName: String) = {
        val w = Window.partitionBy("user_id", "tsu")
          .orderBy(col("event_id").desc)
        e.filter(col("event_type") === kind)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("tsu").as(tsName),
            col("event_id").as(idName))
      }
      val signups = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("tsu")).as("signup_ts"))
      val clicks = firstPer("click", "c_ts", "c_id")
        .withColumnRenamed("c_ts", "signup_ts") // shared ts column name
      val s1 = graft.operators.AsOfJoin.forward(signups, clicks,
          key = "user_id", ts = "signup_ts", rightTieBreak = "c_id",
          tolerance = Some(week7))
        .select(col("user_id"), col("signup_ts"),
          col("r_signup_ts").as("click_ts"), col("r_c_id").as("click_id"))
      val purchases = firstPer("purchase", "click_ts", "p_id")
      val s2ready = s1.filter(col("click_ts").isNotNull)
      val s2 = graft.operators.AsOfJoin.forward(s2ready, purchases,
          key = "user_id", ts = "click_ts", rightTieBreak = "p_id",
          tolerance = Some(week7))
        .select(col("user_id"), col("signup_ts"), col("click_ts"),
          col("r_click_ts").as("purchase_ts"))
      val perUser = s1.filter(col("click_ts").isNull)
        .select(col("user_id"), col("signup_ts"),
          col("click_ts"), lit(null).cast(LongType).as("purchase_ts"))
        .unionByName(s2)
      perUser
        .groupBy(expr("(signup_ts div 604800000000)").as("signup_week"))
        .agg(count(lit(1)).as("n_signups"),
          count(col("click_ts")).as("n_clicked"),
          count(col("purchase_ts")).as("n_purchased"))
        .withColumn("cr_click",
          col("n_clicked").cast(DoubleType) / col("n_signups"))
        .withColumn("cr_purchase",
          col("n_purchased").cast(DoubleType) / col("n_signups"))
        .orderBy("signup_week")
    }),

    // Cohort retention matrix — the product-analytics staple: users
    // grouped by first-activity week (their cohort), activity counted
    // per (cohort, week-offset), retention = share of the cohort still
    // active (one IEEE divide). Two shuffles total: the per-user
    // first-week agg and the (cohort, offset) rollup; the user→cohort
    // join is an ordinary equi-join on the user key.
    "q155_retention_cohorts" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("day", datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast(LongType))
        .withColumn("week", expr("day div 7"))
        .select("user_id", "week")
      val firstWeek = e.groupBy("user_id").agg(min("week").as("cohort"))
      val sizes = firstWeek.groupBy("cohort")
        .agg(countDistinct("user_id").as("cohort_size"))
      e.join(firstWeek, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .join(broadcast(sizes), "cohort")
        .select(col("cohort"), col("week_offset"), col("n_users"),
          col("cohort_size"),
          (col("n_users").cast(DoubleType) / col("cohort_size"))
            .as("retention"))
        .orderBy("cohort", "week_offset")
    }),

    // W1 — latest event per user (QUALIFY row_number = 1,
    // graphics_dashboard.sql:165-169).
    "q30_dedup_latest" -> ((s, dir) => {
      Dedup.latestPerKey(t(s, dir, "events"), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // W2 — deterministic pseudo-random representative per (user, day)
    // via portable md5 ordering (graphics_trends.sql:48 uses
    // FARM_FINGERPRINT; md5 here so the oracle can reproduce it).
    "q31_hash_dedup" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("day", to_date(col("ts")))
      Dedup.deterministicSamplePerKey(e, Seq("user_id", "day"),
          md5(col("event_id").cast("string")))
        .select("user_id", "day", "event_id")
        .orderBy("user_id", "day")
    }),

    // W4 — lag family: daily per-type counts with lag 1 and lag 7 +
    // day-over-day ratio (search-alert/main.py:194-236).
    "q32_lag_family" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("n_lag1", lag(col("n"), 1).over(w))
        .withColumn("n_lag7", lag(col("n"), 7).over(w))
        .withColumn("dod", col("n").cast(DoubleType) / col("n_lag1"))
        .orderBy("event_type", "day")
    }),

    // W5 — 7-day rolling mean (desktop_mau_dau.py:369-372). Integer
    // counts keep the double mean exact on both engines.
    "q33_rolling_mean" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("ma7", (sum(col("n")).over(w).cast(DoubleType) /
          count(col("n")).over(w)))
        .orderBy("day")
    }),

    // W6/A19 — group-scoped scalar broadcast: share of the partition
    // total (search-alert/main.py:212 transform(sum)).
    "q34_partition_share" -> ((s, dir) => {
      val n = t(s, dir, "nation"); val c = t(s, dir, "customer")
      val byNation = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
      val w = Window.partitionBy("n_regionkey")
      byNation
        .withColumn("region_total", sum(col("n_cust")).over(w))
        .withColumn("share", col("n_cust").cast(DoubleType) / col("region_total"))
        .orderBy("n_regionkey", "n_name")
    }),

    // W3/J12 — bucketed row-number pairing: i-th purchase joined to i-th
    // signup within a user bucket (client-regeneration/main.py:61-117,
    // two ROW_NUMBER() windows + LEFT JOIN USING(bucket, rn)).
    "q35_bucket_pairing" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("bucket", pmod(col("user_id"), lit(8)))
      def ranked(typ: String, idCol: String) = {
        val w = Window.partitionBy("bucket")
          .orderBy(md5(col("event_id").cast("string")), col("event_id"))
        e.filter(col("event_type") === typ)
          .withColumn("rn", row_number().over(w))
          .select(col("bucket"), col("rn"), col("event_id").as(idCol))
      }
      ranked("purchase", "purchase_id")
        .join(ranked("signup", "signup_id"), Seq("bucket", "rn"), "left")
        .orderBy("bucket", "rn")
    }),

    // W4 full search-alert shape (search-alert/main.py:203-230, 255-257):
    // dod/wow lag ratios, their own lags, ratio-of-ratios, and the alert
    // rule (previous value floor + dod cliff). Integer counts → exact
    // ratio doubles on both engines.
    "q37_search_alerts" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("dod", col("n").cast(DoubleType) / lag(col("n"), 1).over(w))
        .withColumn("wow", col("n").cast(DoubleType) / lag(col("n"), 7).over(w))
        .withColumn("dod_prevd", lag(col("dod"), 1).over(w))
        .withColumn("wow_in_dod", col("dod") / lag(col("dod"), 7).over(w))
        .withColumn("n_prev", lag(col("n"), 1).over(w))
        .withColumn("is_cliff", col("n_prev") > 50 && col("dod") < 0.7)
        .withColumn("is_spike", col("wow") > 1.4)
        .orderBy("event_type", "day")
    }),

    // A22/U1 full MAU rollup shape (desktop_mau/mau_dau.sql:1-56):
    // per-country + Global + Tier1/RoW fan-out via UNION ALL, presented
    // ordered. (q24 shows the native GROUPING SETS collapse of the same
    // pattern — one shuffle instead of three.)
    "q38_tier_rollup" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("day", to_date(col("ts")))
      val tier1 = Seq("click", "purchase")
      def agg(c: org.apache.spark.sql.Column) =
        e.groupBy(col("day"), c.as("segment"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      val perType = agg(col("event_type"))
      val global = agg(lit("Global"))
      val tiers = agg(when(col("event_type").isin(tier1: _*), lit("Tier1"))
        .otherwise(lit("RoW")))
      perType.unionByName(global).unionByName(tiers)
        .orderBy("day", "segment")
    }),

    // W7 — moving-average band check: flag days whose count falls below
    // 0.5× the trailing 7-day mean (search-term-data-validation-v2
    // data_validation.py:156-334 shape, simplified band).
    "q36_band_check" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
      daily
        .withColumn("trail_mean", sum(col("n")).over(w).cast(DoubleType) /
          count(col("n")).over(w))
        .withColumn("is_low", col("n") < col("trail_mean") * 0.5)
        .filter(col("trail_mean").isNotNull)
        .orderBy("event_type", "day")
    }),

    // Weekend-effect report: per series, weekday vs weekend DAILY-MEAN
    // comparison without a single division — the means cross-multiply
    // (sum_we·days_wd ≷ sum_wd·days_we), and the ±10% band flags are
    // scaled the same way. ISO weekday() (0=Mon) makes the weekend
    // test engine-portable. One daily rollup + a 2-way conditional
    // aggregate.
    "q242_weekend_effect" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("is_we", expr("weekday(day) >= 5"))
      daily.groupBy("event_type")
        .agg(count_if(!col("is_we")).as("d_wd"),
          sum(when(!col("is_we"), col("n")).otherwise(0L)).as("s_wd"),
          count_if(col("is_we")).as("d_we"),
          sum(when(col("is_we"), col("n")).otherwise(0L)).as("s_we"))
        .select(col("event_type"), col("d_wd"), col("s_wd"), col("d_we"),
          col("s_we"),
          (col("s_we") * col("d_wd") > col("s_wd") * col("d_we"))
            .as("weekend_higher"),
          (col("s_we") * col("d_wd") * 10 >
            col("s_wd") * col("d_we") * 11 ||
           col("s_we") * col("d_wd") * 10 <
            col("s_wd") * col("d_we") * 9).as("effect_gt_10pct"))
        .orderBy("event_type")
    }),

    // Week-over-week growth report: weekly counts per series (Monday
    // week start — date_sub(day, weekday) ↔ date_trunc('week'), the
    // engine-portable pair), lag comparison with cross-multiplied
    // flags: grew ⇔ n > prev, grew_10pct ⇔ 10·n > 11·prev. The BI
    // staple, integers end to end.
    "q233_wow_growth" -> ((s, dir) => {
      val weekly = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("date_sub(to_date(ts), weekday(to_date(ts)))").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      weekly
        .withColumn("prev", lag("n", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("week"), col("n"), col("prev"),
          (col("n") > col("prev")).as("grew"),
          (col("n") * 10 > col("prev") * 11).as("grew_10pct"))
        .orderBy("event_type", "week")
    }),

    // Week-over-week audience overlap (retention's set-similarity
    // form): the Jaccard of adjacent weeks' active-user sets, exactly —
    // distinct (user, week) reduce, one self-join on user across
    // adjacent weeks for the intersection, totals joined back; the
    // J > 0.2 gate cross-multiplies (5·inter > union). At scale the
    // per-user reduce partial-aggregates and the week pair space is
    // tiny.
    "q234_week_overlap" -> ((s, dir) => {
      val uw = t(s, dir, "events")
        .select(col("user_id"),
          expr("date_sub(to_date(ts), weekday(to_date(ts)))").as("week"))
        .distinct()
      val inter = uw.select(col("user_id"), col("week").as("w1"))
        .join(uw.select(col("user_id"),
          expr("date_sub(week, 7)").as("w1"), col("week").as("w2")),
          Seq("user_id", "w1"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("inter"))
      val totals = uw.groupBy("week").agg(count(lit(1)).as("n"))
      inter
        .join(totals.select(col("week").as("w1"), col("n").as("n1")), "w1")
        .join(totals.select(col("week").as("w2"), col("n").as("n2")), "w2")
        .select(col("w1"), col("w2"), col("n1"), col("n2"), col("inter"),
          (col("inter") * 5 > col("n1") + col("n2") - col("inter"))
            .as("sticky"))
        .orderBy("w1")
    }),

    // Calendar-dimension build + fact join: a generated 2024 date
    // spine with the derived attributes every warehouse calendar
    // carries — ISO week/year, quarter, ISO day-of-week, July-start
    // fiscal year/quarter (closed-form integer arithmetic, no locale)
    // — joined to the daily event rollup. The dim is 366 rows: always
    // a broadcast; the attributes are engine-portable by construction
    // (weekofyear=ISO in both, isodow via weekday+1).
    "q217_calendar_dim" -> ((s, dir) => {
      val spine = s.range(0, 366).select(
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          col("id").cast(IntegerType)).as("day"))
      val dim = spine.select(col("day"),
        weekofyear(col("day")).cast(LongType).as("iso_week"),
        quarter(col("day")).cast(LongType).as("cal_q"),
        expr("CAST(weekday(day) + 1 AS BIGINT)").as("iso_dow"),
        (year(col("day")) + when(month(col("day")) >= 7, 1).otherwise(0))
          .cast(LongType).as("fiscal_year"),
        (((month(col("day")) + 5) % 12) / 3 + 1).cast(LongType)
          .as("fiscal_q"))
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      daily.join(broadcast(dim), "day")
        .select(col("day"), col("iso_week"), col("cal_q"), col("iso_dow"),
          col("fiscal_year"), col("fiscal_q"), col("n"))
        .orderBy("day")
    }),

    // Sequential pattern mining (frequent "A then B" 2-sequences): for
    // each event, the SET of types seen strictly before it in the
    // user's (ts, id) order — one collect_set window pass, bounded by
    // the 5-type alphabet — explodes into distinct per-user (A, B)
    // precedence pairs, counted across users with a universal-support
    // flag. The oracle is the NAIVE precedence self-join: two
    // independent implementations must agree pair-for-pair.
    "q218_seq_patterns" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"),
        graft.functions.BqShims.epochMicros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pairs = e
        .withColumn("before", collect_set("event_type").over(w))
        .select(col("user_id"), explode(col("before")).as("a"),
          col("event_type").as("b"))
        .distinct()
      val nu = e.agg(count_distinct(col("user_id")).as("nu"))
      pairs.groupBy("a", "b").agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(nu))
        .select(col("a"), col("b"), col("n_users"),
          (col("n_users") === col("nu")).as("universal"))
        .orderBy("a", "b")
    }),

    // Exclusion funnel (the NOT-pattern conversion MATCH_RECOGNIZE
    // covers in other engines): a purchase converts from a click only
    // if NO error happened between that click and the purchase. Three
    // union-carries in ONE window pass — each purchase sees its
    // latest prior click and latest prior error, and qualifies iff
    // the click exists and is more recent than any error — instead of
    // a per-pair interval join. Published as the per-user rollup.
    "q214_exclusion_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = t(s, dir, "events").select(col("user_id"),
        graft.functions.BqShims.epochMicros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      e.withColumn("last_click",
          last(when(col("event_type") === "click", col("tsm")),
            ignoreNulls = true).over(w))
        .withColumn("last_error",
          last(when(col("event_type") === "error", col("tsm")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          (col("last_click").isNotNull &&
            (col("last_error").isNull ||
              col("last_error") < col("last_click"))).as("clean_conv"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          count_if(col("clean_conv")).as("n_clean"))
        .filter(col("n_purchases") > 0)
        .orderBy("user_id")
    }),

    // Hysteresis alert state machine over daily counts (ON above +1%
    // of the series mean, OFF below −1%, hold in between — the
    // anti-flap band every alerting system needs): path-dependent
    // state expressed RELATIONALLY with the union-carry trick — days
    // that cross a threshold emit ON/OFF events, and each day's state
    // is the last carried event (`last ignoreNulls`), default OFF.
    // Thresholds are mean-relative and cross-multiplied to integers
    // (100·n·D ≷ 101·S / 99·S) so the state path replays exactly.
    // One window pass riding the series-key exchange; the per-type
    // totals broadcast.
    "q213_hysteresis_alert" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy("event_type")
        .agg(sum("n").as("s"), count(lit(1)).as("d"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(tot), "event_type")
        .withColumn("crossing",
          when(col("n") * 100 * col("d") > col("s") * 101, "ON")
            .when(col("n") * 100 * col("d") < col("s") * 99, "OFF"))
        .withColumn("state",
          coalesce(last(col("crossing"), ignoreNulls = true).over(w),
            lit("OFF")))
        .select(col("event_type"), col("day"), col("n"), col("state"))
        .orderBy("event_type", "day")
    }),

    // Rolling EXACT 7-day median of daily counts per series — the
    // robust monitoring band (one outlier day cannot drag it, unlike
    // q36's rolling mean): the 7-element frame is collected, sorted
    // and indexed — integer in, integer out, engine-identical. Frame
    // collection is bounded by the window width (7), so the state per
    // row is constant; the window rides the series-key exchange.
    "q210_rolling_median" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      daily
        .withColumn("win", collect_list("n").over(w))
        .filter(size(col("win")) === 7)
        .select(col("event_type"), col("day"), col("n"),
          element_at(array_sort(col("win")), 4).as("med7"))
        .orderBy("event_type", "day")
    }),

    // Cumulative DISTINCT users per event_type by day — the classic
    // "can't window COUNT(DISTINCT)" growth metric, done scalably via
    // the first-seen rewrite: each (type, user) reduces to its first
    // day (a partial-aggregatable min — one user-level shuffle), daily
    // first-appearance counts then cum-sum over a days-sized window.
    // The naive per-day distinct-over-growing-prefix is quadratic in
    // days×users; this is one groupBy + one tiny window at any scale.
    "q197_cumulative_distinct" -> ((s, dir) => {
      val first = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
      val daily = first.groupBy("event_type", "day")
        .agg(count(lit(1)).as("new_users"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_users", sum("new_users").over(w))
        .orderBy("event_type", "day")
    }),

    // Time-decay attribution (the half-life-weighted member of the
    // family: q134 last-touch, q207 linear): a click/view touching a
    // same-user purchase in the prior 28 days earns weight
    // 2^(20 − Δweeks) — halving per week, EXACT powers of two as
    // integers (a float pow() would be the classic cross-engine seam),
    // so the per-kind weighted mass is an exact BIGINT and the share
    // one division. User-keyed equi-join, touch window bounded.
    "q267_timedecay_attribution" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val convs = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          col("ts").as("cts"))
      val touches = e.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("touch_kind"),
          col("ts").as("tts"))
      val pairs = convs.join(touches, Seq("user_id"))
        .filter(col("tts") <= col("cts") &&
          col("tts") > col("cts") - expr("INTERVAL 28 DAYS"))
        .withColumn("cts_us",
          graft.functions.BqShims.epochMicros(col("cts")))
        .withColumn("tts_us",
          graft.functions.BqShims.epochMicros(col("tts")))
        .withColumn("wk", expr(
          "CAST((cts_us - tts_us) div 604800000000 AS INT)"))
        .withColumn("weight",
          element_at(array(lit(1048576L), lit(524288L), lit(262144L),
            lit(131072L)), col("wk") + 1))
      val byKind = pairs.groupBy("touch_kind")
        .agg(count(lit(1)).as("n_touches"),
          count_distinct(col("conv_id")).as("n_convs"),
          sum("weight").as("weighted_mass"))
      val tot = byKind.agg(sum("weighted_mass").as("total_mass"))
      byKind.crossJoin(broadcast(tot))
        .select(col("touch_kind"), col("n_touches"), col("n_convs"),
          col("weighted_mass"),
          (col("weighted_mass").cast(DoubleType) /
            col("total_mass").cast(DoubleType)).as("share"))
        .orderBy("touch_kind")
    })
  )

  val oracles: Map[String, String] = Map(
    // identical integer inputs -> identical IEEE derivations
    "q181_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS daily_cents
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT day, daily_cents,
        |    CASE WHEN COUNT(*) OVER w = 7
        |      THEN CAST(SUM(daily_cents) OVER w AS BIGINT) END AS trend7,
        |    CAST((datediff('day', DATE '1970-01-01', day) + 4) % 7
        |      AS BIGINT) AS dow
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND
        |    3 FOLLOWING)),
        |s AS (
        |  SELECT dow, CAST(SUM(daily_cents) AS BIGINT) AS seas_num,
        |    COUNT(*)::BIGINT AS seas_den
        |  FROM t GROUP BY 1)
        |SELECT t.day, t.daily_cents, t.trend7, t.dow,
        |  CAST(s.seas_num AS DOUBLE) / s.seas_den AS seasonal,
        |  CASE WHEN t.trend7 IS NOT NULL
        |    THEN t.daily_cents - t.trend7 / 7.0
        |      - CAST(s.seas_num AS DOUBLE) / s.seas_den END AS residual
        |FROM t JOIN s USING (dow) ORDER BY t.day""".stripMargin,
    "q182_lateness_audit" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS tsm FROM events),
        |m AS (
        |  SELECT event_type, tsm,
        |    MAX(tsm) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM e),
        |f AS (
        |  SELECT event_type, tsm, hwm,
        |    CASE WHEN hwm IS NOT NULL
        |      AND tsm < hwm - 3600000000 THEN 1 ELSE 0 END AS late
        |  FROM m)
        |SELECT event_type, COUNT(*)::BIGINT AS n,
        |  CAST(SUM(late) AS BIGINT) AS n_late,
        |  CAST(MAX(CASE WHEN late = 1 THEN hwm - tsm END) AS BIGINT)
        |    AS max_lateness_us
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // Two chained NATIVE ASOF joins — again an independent
    // implementation of the two union-carry passes.
    "q156_ordered_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
        |  FROM events),
        |su AS (
        |  SELECT user_id, MIN(tsu) AS signup_ts FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |ck AS (
        |  SELECT user_id, tsu, event_id FROM (
        |    SELECT user_id, tsu, event_id, row_number() OVER (
        |      PARTITION BY user_id, tsu ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type = 'click') WHERE rn = 1),
        |pu AS (
        |  SELECT user_id, tsu, event_id FROM (
        |    SELECT user_id, tsu, event_id, row_number() OVER (
        |      PARTITION BY user_id, tsu ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type = 'purchase') WHERE rn = 1),
        |s1 AS (
        |  SELECT su.user_id, su.signup_ts, ck.tsu AS click_ts
        |  FROM su ASOF LEFT JOIN ck
        |    ON su.user_id = ck.user_id AND ck.tsu >= su.signup_ts),
        |s1t AS (
        |  SELECT user_id, signup_ts,
        |    CASE WHEN click_ts <= signup_ts + 604800000000
        |      THEN click_ts END AS click_ts
        |  FROM s1),
        |s2 AS (
        |  SELECT a.user_id, a.signup_ts, a.click_ts, p.tsu AS purchase_ts
        |  FROM (SELECT * FROM s1t WHERE click_ts IS NOT NULL) a
        |  ASOF LEFT JOIN pu p
        |    ON a.user_id = p.user_id AND p.tsu >= a.click_ts),
        |s2t AS (
        |  SELECT user_id, signup_ts, click_ts,
        |    CASE WHEN purchase_ts <= click_ts + 604800000000
        |      THEN purchase_ts END AS purchase_ts
        |  FROM s2),
        |all_u AS (
        |  SELECT user_id, signup_ts, click_ts,
        |    CAST(NULL AS BIGINT) AS purchase_ts
        |  FROM s1t WHERE click_ts IS NULL
        |  UNION ALL SELECT * FROM s2t)
        |SELECT signup_ts // 604800000000 AS signup_week,
        |  COUNT(*)::BIGINT AS n_signups,
        |  COUNT(click_ts)::BIGINT AS n_clicked,
        |  COUNT(purchase_ts)::BIGINT AS n_purchased,
        |  CAST(COUNT(click_ts) AS DOUBLE) / COUNT(*) AS cr_click,
        |  CAST(COUNT(purchase_ts) AS DOUBLE) / COUNT(*) AS cr_purchase
        |FROM all_u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q155_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS week
        |  FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort FROM e GROUP BY 1),
        |sz AS (SELECT cohort, COUNT(DISTINCT user_id) AS cohort_size
        |       FROM f GROUP BY 1),
        |m AS (
        |  SELECT f.cohort, e.week - f.cohort AS week_offset,
        |    COUNT(DISTINCT e.user_id) AS n_users
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort, m.week_offset, m.n_users, sz.cohort_size,
        |  CAST(m.n_users AS DOUBLE) / sz.cohort_size AS retention
        |FROM m JOIN sz USING (cohort)
        |ORDER BY cohort, week_offset""".stripMargin,
    "q151_quantile_discretize" ->
      """SELECT o_orderpriority, decile, COUNT(*) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Independent implementation: the NAIVE inequality join (DuckDB
    // plans its IEJoin) — semantically the definition the binned
    // rewrite must reproduce.
    "q144_interval_join" ->
      """WITH i AS (
        |  SELECT event_id AS interval_id, epoch_us(ts) AS lo,
        |    epoch_us(ts) + 7200000000 AS hi
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT epoch_us(ts) AS pts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT i.interval_id, COUNT(p.pts)::BIGINT AS n_points,
        |  MIN(p.pts) AS first_ts, MAX(p.pts) AS last_ts
        |FROM i LEFT JOIN p ON p.pts >= i.lo AND p.pts < i.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Independent implementation: DuckDB's NATIVE ASOF JOIN, not a
    // replay of the union-carry rewrite — a true cross-check of the
    // operator's semantics. Tolerance is the same post-predicate.
    "q143_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, event_id AS conv_id,
        |    value AS conv_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, tsu, click_id, click_value FROM (
        |    SELECT user_id, epoch_us(ts) AS tsu, event_id AS click_id,
        |      value AS click_value,
        |      row_number() OVER (PARTITION BY user_id, epoch_us(ts)
        |        ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1),
        |j AS (
        |  SELECT p.user_id, p.conv_id, p.tsu AS conv_ts,
        |    c.click_id, c.tsu AS click_ts, c.click_value
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.tsu <= p.tsu)
        |SELECT user_id, conv_id, conv_ts,
        |  CASE WHEN click_ts >= conv_ts - 86400000000 THEN click_id END
        |    AS click_id,
        |  CASE WHEN click_ts >= conv_ts - 86400000000 THEN click_ts END
        |    AS click_ts,
        |  CASE WHEN click_ts >= conv_ts - 86400000000 THEN click_value END
        |    AS click_value,
        |  CASE WHEN click_ts >= conv_ts - 86400000000
        |    THEN conv_ts - click_ts END AS gap_us
        |FROM j ORDER BY user_id, conv_id""".stripMargin,
    "q134_attribution" ->
      """WITH e AS (
        |  SELECT user_id AS key, epoch_us(ts) AS ts, event_type AS kind,
        |    event_id AS id
        |  FROM events),
        |c AS (
        |  SELECT key, id, ts, kind,
        |    last_value(CASE WHEN kind IN ('click','view') THEN id END
        |      IGNORE NULLS) OVER w AS t_id,
        |    last_value(CASE WHEN kind IN ('click','view') THEN ts END
        |      IGNORE NULLS) OVER w AS t_ts,
        |    last_value(CASE WHEN kind IN ('click','view') THEN kind END
        |      IGNORE NULLS) OVER w AS t_kind
        |  FROM e
        |  WINDOW w AS (PARTITION BY key ORDER BY ts, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT key, id AS conv_id, ts AS conv_ts,
        |  CASE WHEN t_ts >= ts - 259200000000 THEN t_id END AS touch_id,
        |  CASE WHEN t_ts >= ts - 259200000000 THEN t_ts END AS touch_ts,
        |  CASE WHEN t_ts >= ts - 259200000000 THEN t_kind END AS touch_kind
        |FROM c WHERE kind = 'purchase' ORDER BY key, conv_id""".stripMargin,
    // reverse carry (ts DESC, id DESC), integer floor-split credits
    "q207_multitouch" ->
      """WITH e AS (
        |  SELECT user_id AS key, epoch_us(ts) AS ts, event_type AS kind,
        |    event_id AS id
        |  FROM events),
        |c AS (
        |  SELECT key, ts, kind, id,
        |    last_value(CASE WHEN kind = 'purchase' THEN id END
        |      IGNORE NULLS) OVER w AS c_id,
        |    last_value(CASE WHEN kind = 'purchase' THEN ts END
        |      IGNORE NULLS) OVER w AS c_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY key ORDER BY ts DESC, id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (
        |  SELECT * FROM c WHERE kind IN ('click', 'view')
        |    AND c_ts IS NOT NULL AND c_ts - ts <= 259200000000),
        |n AS (SELECT c_id, COUNT(*)::BIGINT AS nt FROM t GROUP BY 1)
        |SELECT t.kind AS touch_kind, COUNT(*)::BIGINT AS n_touches,
        |  COUNT(DISTINCT t.c_id)::BIGINT AS n_convs,
        |  CAST(SUM(1000000000000 // n.nt) AS BIGINT) AS credit_units
        |FROM t JOIN n USING (c_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q131_gap_fill" ->
      """WITH obs AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    COUNT(*) AS v
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
        |  FROM obs GROUP BY user_id),
        |dense AS (
        |  SELECT s.user_id, s.day, o.v FROM spine s
        |  LEFT JOIN obs o ON o.user_id = s.user_id AND o.day = s.day),
        |f AS (
        |  SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER wb AS prev_v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wb AS prev_d,
        |    first_value(v IGNORE NULLS) OVER wf AS next_v,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wf AS next_d
        |  FROM dense
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, v IS NULL AS is_gap, prev_v AS ffill,
        |  CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |    ELSE CAST(prev_v AS DOUBLE) +
        |      CAST((next_v - prev_v) * (day - prev_d) AS DOUBLE) /
        |        CAST(next_d - prev_d AS DOUBLE) END AS lerp
        |FROM f ORDER BY user_id, day""".stripMargin,
    "q30_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q31_hash_dedup" ->
      """SELECT user_id, day, event_id FROM (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_id,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                       ORDER BY md5(CAST(event_id AS VARCHAR)) ASC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, day""".stripMargin,
    "q32_lag_family" ->
      """SELECT day, event_type, n, n_lag1, n_lag7, CAST(n AS DOUBLE) / n_lag1 AS dod
        |FROM (
        |  SELECT day, event_type, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS n_lag1,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS n_lag7
        |  FROM (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1, 2))
        |ORDER BY event_type, day""".stripMargin,
    "q33_rolling_mean" ->
      """SELECT day, n,
        |  CAST(SUM(n) OVER w AS DOUBLE) / COUNT(n) OVER w AS ma7
        |FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1)
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q34_partition_share" ->
      """SELECT n_regionkey, n_name, n_cust,
        |  CAST(SUM(n_cust) OVER (PARTITION BY n_regionkey) AS BIGINT) AS region_total,
        |  CAST(n_cust AS DOUBLE) / CAST(SUM(n_cust) OVER (PARTITION BY n_regionkey) AS BIGINT) AS share
        |FROM (SELECT n_regionkey, n_name, COUNT(*) AS n_cust
        |      FROM customer JOIN nation ON c_nationkey = n_nationkey
        |      GROUP BY 1, 2)
        |ORDER BY n_regionkey, n_name""".stripMargin,
    "q35_bucket_pairing" ->
      """WITH e AS (SELECT *, user_id % 8 AS bucket FROM events),
        |p AS (SELECT bucket, event_id AS purchase_id,
        |        row_number() OVER (PARTITION BY bucket ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |      FROM e WHERE event_type = 'purchase'),
        |g AS (SELECT bucket, event_id AS signup_id,
        |        row_number() OVER (PARTITION BY bucket ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |      FROM e WHERE event_type = 'signup')
        |SELECT p.bucket, p.rn, p.purchase_id, g.signup_id
        |FROM p LEFT JOIN g USING (bucket, rn)
        |ORDER BY bucket, rn""".stripMargin,
    "q37_search_alerts" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT day, event_type, n,
        |    CAST(n AS DOUBLE) / lag(n, 1) OVER w AS dod,
        |    CAST(n AS DOUBLE) / lag(n, 7) OVER w AS wow,
        |    CAST(lag(n, 1) OVER w AS BIGINT) AS n_prev
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |l2 AS (
        |  SELECT *,
        |    lag(dod, 1) OVER w AS dod_prevd,
        |    dod / lag(dod, 7) OVER w AS wow_in_dod
        |  FROM l WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT day, event_type, n, dod, wow, dod_prevd, wow_in_dod, n_prev,
        |  n_prev > 50 AND dod < 0.7 AS is_cliff,
        |  wow > 1.4 AS is_spike
        |FROM l2 ORDER BY event_type, day""".stripMargin,
    "q38_tier_rollup" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type, user_id FROM events)
        |SELECT * FROM (
        |  SELECT day, event_type AS segment, COUNT(*) AS n,
        |    COUNT(DISTINCT user_id) AS users FROM e GROUP BY 1, 2
        |  UNION ALL
        |  SELECT day, 'Global' AS segment, COUNT(*) AS n,
        |    COUNT(DISTINCT user_id) AS users FROM e GROUP BY 1, 2
        |  UNION ALL
        |  SELECT day,
        |    CASE WHEN event_type IN ('click', 'purchase') THEN 'Tier1' ELSE 'RoW' END AS segment,
        |    COUNT(*) AS n, COUNT(DISTINCT user_id) AS users FROM e GROUP BY 1, 2)
        |ORDER BY day, segment""".stripMargin,
    "q36_band_check" ->
      """SELECT day, event_type, n, trail_mean, n < trail_mean * 0.5 AS is_low
        |FROM (
        |  SELECT day, event_type, n,
        |    CAST(SUM(n) OVER w AS DOUBLE) / COUNT(n) OVER w AS trail_mean
        |  FROM (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1, 2)
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |WHERE trail_mean IS NOT NULL
        |ORDER BY event_type, day""".stripMargin,
    // isodow>=6 ⇔ weekday()>=5; same cross-multiplied mean comparison
    "q242_weekend_effect" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n,
        |    isodow(CAST(ts AS DATE)) >= 6 AS is_we
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(COUNT(*) FILTER (WHERE NOT is_we) AS BIGINT) AS d_wd,
        |  CAST(COALESCE(SUM(n) FILTER (WHERE NOT is_we), 0) AS BIGINT)
        |    AS s_wd,
        |  CAST(COUNT(*) FILTER (WHERE is_we) AS BIGINT) AS d_we,
        |  CAST(COALESCE(SUM(n) FILTER (WHERE is_we), 0) AS BIGINT) AS s_we,
        |  COALESCE(SUM(n) FILTER (WHERE is_we), 0) *
        |    COUNT(*) FILTER (WHERE NOT is_we) >
        |  COALESCE(SUM(n) FILTER (WHERE NOT is_we), 0) *
        |    COUNT(*) FILTER (WHERE is_we) AS weekend_higher,
        |  (COALESCE(SUM(n) FILTER (WHERE is_we), 0) *
        |     COUNT(*) FILTER (WHERE NOT is_we) * 10 >
        |   COALESCE(SUM(n) FILTER (WHERE NOT is_we), 0) *
        |     COUNT(*) FILTER (WHERE is_we) * 11) OR
        |  (COALESCE(SUM(n) FILTER (WHERE is_we), 0) *
        |     COUNT(*) FILTER (WHERE NOT is_we) * 10 <
        |   COALESCE(SUM(n) FILTER (WHERE NOT is_we), 0) *
        |     COUNT(*) FILTER (WHERE is_we) * 9) AS effect_gt_10pct
        |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin,
    // date_trunc('week') = Monday start, same integer flags
    "q233_wow_growth" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
        |    COUNT(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, week, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev
        |  FROM weekly)
        |SELECT event_type, week, n, prev,
        |  n > prev AS grew, n * 10 > prev * 11 AS grew_10pct
        |FROM l WHERE prev IS NOT NULL
        |ORDER BY event_type, week""".stripMargin,
    // same distinct (user, week) reduce and adjacent-week self-join
    "q234_week_overlap" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
        |  FROM events),
        |i AS (
        |  SELECT a.week AS w1, b.week AS w2, COUNT(*)::BIGINT AS inter
        |  FROM uw a JOIN uw b ON a.user_id = b.user_id
        |    AND b.week = a.week + INTERVAL 7 DAY
        |  GROUP BY 1, 2),
        |t AS (SELECT week, COUNT(*)::BIGINT AS n FROM uw GROUP BY 1)
        |SELECT i.w1, CAST(i.w2 AS DATE) AS w2, t1.n AS n1, t2.n AS n2,
        |  i.inter, i.inter * 5 > t1.n + t2.n - i.inter AS sticky
        |FROM i JOIN t t1 ON t1.week = i.w1 JOIN t t2 ON t2.week = i.w2
        |ORDER BY i.w1""".stripMargin,
    // same closed-form calendar arithmetic (week()=ISO, isodow()=1-Mon)
    "q217_calendar_dim" ->
      """WITH spine AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS day),
        |dim AS (
        |  SELECT day, CAST(week(day) AS BIGINT) AS iso_week,
        |    CAST(quarter(day) AS BIGINT) AS cal_q,
        |    CAST(isodow(day) AS BIGINT) AS iso_dow,
        |    CAST(year(day) + CASE WHEN month(day) >= 7 THEN 1 ELSE 0 END
        |      AS BIGINT) AS fiscal_year,
        |    CAST(((month(day) + 5) % 12) // 3 + 1 AS BIGINT) AS fiscal_q
        |  FROM spine),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n
        |  FROM events GROUP BY 1)
        |SELECT d.day, iso_week, cal_q, iso_dow, fiscal_year, fiscal_q, n
        |FROM daily d JOIN dim USING (day) ORDER BY d.day""".stripMargin,
    // the naive precedence self-join — an independent implementation
    "q218_seq_patterns" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tsm, event_id, event_type
        |  FROM events),
        |p AS (
        |  SELECT DISTINCT a.user_id, a.event_type AS a, b.event_type AS b
        |  FROM e a JOIN e b ON a.user_id = b.user_id
        |    AND (a.tsm < b.tsm OR (a.tsm = b.tsm AND a.event_id < b.event_id))),
        |u AS (SELECT COUNT(DISTINCT user_id) AS nu FROM e)
        |SELECT a, b, COUNT(*)::BIGINT AS n_users,
        |  COUNT(*) = nu AS universal
        |FROM p, u GROUP BY 1, 2, nu ORDER BY 1, 2""".stripMargin,
    // same three carries, same qualification predicate
    "q214_exclusion_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tsm, event_id, event_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN tsm END
        |      IGNORE NULLS) OVER w AS last_click,
        |    last_value(CASE WHEN event_type = 'error' THEN tsm END
        |      IGNORE NULLS) OVER w AS last_error
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, COUNT(*)::BIGINT AS n_purchases,
        |  CAST(COUNT(*) FILTER (WHERE last_click IS NOT NULL AND
        |    (last_error IS NULL OR last_error < last_click))
        |    AS BIGINT) AS n_clean
        |FROM c WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same crossing events, same carried state, same integer thresholds
    "q213_hysteresis_alert" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
        |    COUNT(*)::BIGINT AS d
        |  FROM daily GROUP BY 1),
        |x AS (
        |  SELECT daily.event_type, day, n,
        |    CASE WHEN n * 100 * d > s * 101 THEN 'ON'
        |         WHEN n * 100 * d < s * 99 THEN 'OFF' END AS crossing
        |  FROM daily JOIN tot USING (event_type))
        |SELECT event_type, day, n,
        |  COALESCE(last_value(crossing IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY day
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'OFF')
        |    AS state
        |FROM x ORDER BY event_type, day""".stripMargin,
    // same 7-frame list, sorted, 4th element — integer-exact median
    "q210_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    list(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
        |  FROM daily)
        |SELECT event_type, day, n,
        |  CAST(list_sort(win)[4] AS BIGINT) AS med7
        |FROM w WHERE len(win) = 7
        |ORDER BY event_type, day""".stripMargin,
    // same first-seen rewrite (min day per user, then cum-sum)
    "q197_cumulative_distinct" ->
      """WITH first AS (
        |  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, day, COUNT(*)::BIGINT AS new_users
        |  FROM first GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |  CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily ORDER BY event_type, day""".stripMargin,
    // same exact power-of-two week weights, same epoch-microsecond
    // week bucketing
    "q267_timedecay_attribution" ->
      """WITH convs AS (
        |  SELECT user_id, event_id AS conv_id, ts AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |touches AS (
        |  SELECT user_id, event_type AS touch_kind, ts AS tts
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (
        |  SELECT c.conv_id, t.touch_kind,
        |    (epoch_us(c.cts) - epoch_us(t.tts)) // 604800000000 AS wk
        |  FROM convs c JOIN touches t ON c.user_id = t.user_id
        |  WHERE t.tts <= c.cts AND t.tts > c.cts - INTERVAL 28 DAY),
        |byk AS (
        |  SELECT touch_kind, COUNT(*)::BIGINT AS n_touches,
        |    COUNT(DISTINCT conv_id)::BIGINT AS n_convs,
        |    CAST(SUM(([1048576, 524288, 262144, 131072])[wk + 1])
        |      AS BIGINT) AS weighted_mass
        |  FROM pairs GROUP BY 1),
        |tot AS (SELECT CAST(SUM(weighted_mass) AS BIGINT) AS total_mass
        |  FROM byk)
        |SELECT touch_kind, n_touches, n_convs, weighted_mass,
        |  CAST(weighted_mass AS DOUBLE) / CAST(total_mass AS DOUBLE)
        |    AS share
        |FROM byk, tot ORDER BY touch_kind""".stripMargin
  )
}
