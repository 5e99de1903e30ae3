package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{BloomFilterOps, RangeJoin}
import graft.sources.{Bucketing, Tables}

/** SURVEY.md §2b — the analytics core (bench headliners).
  *
  * Money/measure aggregates go through DECIMAL(12,2): decimal addition is
  * exact and associative, so results are bit-identical under any Spark
  * partitioning AND match DuckDB exactly; the final cast back to DOUBLE
  * keeps the output schema engine-neutral.
  */
object AnalyticsQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(12, 2))

  /** Shared with the streaming twins (stream_window) so the decimal-sum
    * convention can't drift from the oracle generator sqlDecSum.
    */
  private[graft] def decSumDouble(c: Column): Column = sum(dec(c)).cast("double")

  /** SQL fragment mirroring [[decSumDouble]]. */
  private def sqlDecSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(12,2))) AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1: one scan, hash aggregate with map-side partial agg.
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSumDouble(col("l_quantity")).as("sum_qty"),
          decSumDouble(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
            * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3: selective dim filter broadcast into the fact join.
    "q3_join" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-ish: 5-way star join, every dim broadcast, one fact shuffle.
    "q5_join" -> ((s, dir) => {
      val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      val li = Tables.load(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Window top-k: single shuffle on the group key, no global sort.
    "topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),

    // Tumbling-window throughput (batch twin of stream_window).
    "events_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), decSumDouble(col("value")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))),

    // TPC-H Q12 adapted to the test schema (r9): conditional aggregation
    // over a fact-fact join — shipped-in-1996 lines classified by their
    // order's priority, counted per return flag. The year filter pushes
    // to the lineitem scan; both facts shuffle once on the order key;
    // the CASE counts ride partial aggregation.
    "q12_priority_lines" -> ((s, dir) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_returnflag"))
        .join(Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q4 adapted (r9): order counts per priority for orders with
    // at least one RETURNED line — the EXISTS/left-SEMI join shape
    // (orders_anti_join's complement). The semi join never duplicates an
    // order however many lines match, and the probe side carries only
    // the 8-byte order key.
    "q4_priority_orders" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))),

    // TPC-H Q14 adapted (r9): promo revenue share — what fraction of a
    // quarter's revenue came from ECONOMY-type parts. The quarter filter
    // pushes to the lineitem scan; part is a DIMENSION and broadcasts;
    // both conditional sums are decimal-exact, the share is one IEEE
    // division of two exact doubles.
    "q14_promo_share" -> ((s, dir) => {
      val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(Tables.load(s, dir, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "ECONOMY", rev)
            .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"))
        .withColumn("promo_share_pct",
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
    }),

    // Hopping (sliding) windows (r9): Spark's native window() with
    // width 1h / slide 30min — every event lands in exactly width/slide
    // = 2 windows, epoch-aligned starts. The explode-then-aggregate is
    // the standard plan: the ×2 row blowup happens map-side and partial
    // aggregation collapses it before the one exchange, so the shuffle
    // carries (windows × types) rows, not ×2 events.
    "events_window_hopping" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), decSumDouble(col("value")).as("total_value"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy(col("w_start"), col("event_type"))),

    // CUBE aggregation (r9): completes events_rollup's subtotal lattice
    // with the column marginals ROLLUP can't express — all four grouping
    // sets of (event_type, day) in ONE pass. Spark's Expand operator
    // blows each row up ×4 MAP-SIDE and partial aggregation collapses
    // the blowup before the single hash exchange — the shuffle carries
    // at most 4·|grouping keys| rows, never ×4 events. Per-column
    // grouping() flags disambiguate a real NULL key from a subtotal row.
    "events_cube" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")))
        .cube(col("event_type"), col("day"))
        .agg(grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("day")).cast("int").as("g_day"),
          grouping_id(col("event_type"), col("day")).cast("long").as("gid"),
          count(lit(1)).as("n_events"),
          decSumDouble(col("value")).as("total_value"))
        .orderBy(col("gid"), col("event_type"), col("day"))),

    // PIVOT (r9): event types to columns per day. The value list is
    // EXPLICIT — pivot without it runs a whole extra distinct job just
    // to learn the columns, and an unbounded type domain would make the
    // row width data-dependent; with it, the pivot is a plain map-side
    // conditional projection collapsed by ONE partial-aggregated hash
    // exchange on `day` (exactly the conditional-aggregation plan the
    // oracle spells out).
    "events_pivot" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(decSumDouble(col("value")))
        .withColumnsRenamed(Map("click" -> "click_total", "error" -> "error_total",
          "purchase" -> "purchase_total", "signup" -> "signup_total",
          "view" -> "view_total"))
        .orderBy(col("day"))),

    // EXACT distributed percentiles (r9) — the histogram-cumsum plan:
    // nearest-rank p50/p90/p99 per type over integer cents, no global
    // sort, no per-group serialization of raw rows, no sketch error.
    // The first hash aggregate crushes the fact to its distinct
    // (type, cents) grid — bounded by the value domain, NOT the row
    // count — so the rank-selection window runs over grid cells only.
    // cents are exact (decimal(12,2)·100), rank = ceil(p·n/100) in
    // integer arithmetic, so both engines agree bit-for-bit; the
    // events_approx sketch card is the mergeable-but-approximate
    // alternative this one out-does when exactness is required.
    "events_percentiles" -> ((s, dir) => {
      val byType = Window.partitionBy(col("event_type"))
      val hist = Tables.load(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (dec(col("value")) * 100).cast("long").as("c"))
        .groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      hist
        .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("c"))))
        .withColumn("n", sum(col("cnt")).over(byType))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          min(when(col("cum") >= expr("(50*n + 99) DIV 100"), col("c"))).as("p50_cents"),
          min(when(col("cum") >= expr("(90*n + 99) DIV 100"), col("c"))).as("p90_cents"),
          min(when(col("cum") >= expr("(99*n + 99) DIV 100"), col("c"))).as("p99_cents"))
        .orderBy(col("event_type"))
    }),

    // Co-bucketed fact-fact join (r9): the LAYOUT-side answer to the
    // shuffle — both facts written bucketed+sorted by the order key
    // (the one-time cost), then joined with ZERO exchange on either
    // side (BucketingSpec pins the plan under a disabled broadcast
    // threshold; results are layout-invariant by the same spec). The
    // oracle is the plain join — the layout must never change answers.
    "q_join_bucketed" -> ((s, dir) => {
      Bucketing.writeBucketed(Tables.load(s, dir, "orders"), "orders_bq", 8, "o_orderkey")
      Bucketing.writeBucketed(Tables.load(s, dir, "lineitem"), "lineitem_bq", 8, "l_orderkey")
      Bucketing.cobucketedJoin(s, "orders_bq", "lineitem_bq", "o_orderkey", "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Broadcast Bloom runtime-filter card (r9): the join-pruning filter
    // Spark's planner injects invisibly, built EXPLICITLY and measured —
    // urgent-order keys → 61,440-bit / k=2 filter (a constant ~1k-word
    // broadcast dim however many keys), lineitem probed without a
    // shuffle, quality reported as exact counts + the measured FP rate.
    "orders_bloom_prune" -> ((s, dir) => {
      val bkeys = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"))
      val probe = Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      BloomFilterOps.card(probe, bkeys)
    }),

    // The Bloom filter USED (r9): prune lineitem by the urgent-order
    // bloom BEFORE the join — the production runtime-filter shape. The
    // join itself eliminates the ~1% false positives, so the result is
    // EXACTLY the plain join's (the oracle): the filter is a lossless
    // optimization, and at 100 TB the shuffle feeds ~20% of the fact
    // instead of all of it (n_pass/n_probe from orders_bloom_prune).
    "orders_bloom_join" -> ((s, dir) => {
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val bkeys = urgent.select(col("o_orderkey").as("k"))
      val words = BloomFilterOps.wordTable(bkeys, 61440L)
      val probe = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount"))
      BloomFilterOps.probe(probe, words, 61440L)
        .filter(col("pass"))
        .join(urgent.select(col("o_orderkey"), col("o_orderdate")),
          col("k") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy(col("month"))
    }),

    // Inter-arrival gap card (r8): per-user lag window (ONE exchange on
    // user_id) → integer µs gaps → partial-aggregated per-type stats;
    // sums stay BIGINT so both engines are exact, avg derived once.
    "events_gap_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          sum(col("gap_us")).as("sum_gap_us"))
        .withColumn("avg_gap_us", col("sum_gap_us").cast("double") / col("n_gaps"))
        .orderBy(col("event_type"))
    }),

    // Cohort-retention triangle (r8): cohort = day of first event, cell
    // (cohort, k) = distinct users active k days later. first-seen
    // aggregate hash-partitions on user_id and the events join REUSES
    // that partitioning (one new exchange on the events side only);
    // periods are exact integer day diffs.
    "events_retention_cohorts" -> ((s, dir) => {
      val events = Tables.load(s, dir, "events")
      val firstSeen = events.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      events.join(firstSeen, "user_id")
        .withColumn("period", datediff(to_date(col("ts")), to_date(col("cohort_day"))))
        .groupBy(col("cohort_day"), col("period"))
        .agg(countDistinct(col("user_id")).as("n_active"),
          count(lit(1)).as("n_events"))
        .orderBy(col("cohort_day"), col("period"))
    }),

    // TPC-H Q10 shape (r8): returned-item revenue by customer for one
    // quarter — two fact filters reach the scans, facts shuffle once on
    // the join keys, the 25-row nation dim broadcasts, decimal-exact
    // money, top 20 via TakeOrderedAndProject (never a global sort).
    "q10_returned" -> ((s, dir) => {
      val nat = Tables.load(s, dir, "nation")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Per-type z-score outliers (r8): engine-exact two-pass — moments
    // from DECIMAL sums (value and value² both exact in decimal; the
    // square computed decimal×decimal BEFORE summing), derived mean/sd
    // in identical IEEE double ops, tiny stats dim broadcast back over
    // the scan. greatest(·,0) guards float cancellation in the variance.
    "events_anomaly" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").filter(col("value").isNotNull)
      flagAnomalies(ev, typeStats(ev)).orderBy(col("event_id"))
    }),

    // Anti join: orders with no shipped lineitem after a date — LeftAnti
    // plans as a broadcast/shuffled hash anti join, no full materialization.
    "orders_anti_join" -> ((s, dir) => {
      val shipped = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("l_orderkey"))
      Tables.load(s, dir, "orders")
        .join(shipped, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), decSumDouble(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // Hierarchical ROLLUP totals (event_type ⊃ hour) — one shuffle via
    // Expand + hash aggregate; grouping id disambiguates subtotal rows.
    "events_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("hour", date_trunc("hour", col("ts")))
        .rollup(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n_events"), decSumDouble(col("value")).as("total_value"),
          grouping_id(col("event_type"), col("hour")).cast("long").as("level"))
        .orderBy(col("level"), col("event_type"), col("hour"))),

    // TPC-H Q18-ish: large-quantity orders via an aggregated semi-join —
    // the inner aggregate (HAVING) filters before the enrichment joins.
    "q18_large_orders" -> ((s, dir) => {
      val bigOrders = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(decSumDouble(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      ord.join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Sketch-based approximate aggregates: HLL++ distinct + percentile
    // sketch — mergeable partial states, the only viable shape for
    // distincts/quantiles at 100 TB. Engine-specific sketches have no
    // cross-engine VALUE oracle, so the registered row is the VALIDATED
    // card (r15 VERDICT #5): the sketches run distributed exactly as in
    // [[eventsApproxSketch]], and the output carries what IS
    // engine-reproducible — the exact distinct count plus in-plan
    // verdicts that each sketch landed inside its PROVEN bound (HLL++
    // rsd=0.02 within 10 % — 5× margin; each percentile inside the
    // GK N/accuracy rank band vs the exact order statistics, the
    // TextOpsSpec replay-gate formula verbatim). A broken sketch flips
    // a boolean and the DuckDB hash gate goes red — a live full gate,
    // no rows-only footnote. The raw sketch card (the production
    // surface — no exact counterparts at 100 TB) stays pinned by the
    // spec's driver replay: HLL++ bit-exact, percentiles rank-banded.
    "events_approx" -> ((s, dir) =>
      eventsApproxCard(Tables.load(s, dir, "events")).orderBy(col("event_type"))),

    // A/B experiment card (r9): deterministic hash-split arms (user
    // parity — every user is wholly in one arm, the unit of
    // randomization), per-type two-sample comparison with the Welch
    // z statistic. The same decimal two-pass moments as events_anomaly
    // keep every aggregate engine-exact; the derived doubles (means,
    // variances, z) are FIXED IEEE shapes over those exact sums, so
    // both engines produce identical bits. ONE partial-agg'd exchange
    // on (type, arm), then a types-count pivot — nothing scales with
    // rows but the first aggregate.
    "events_abtest" -> ((s, dir) =>
      abtestCard(Tables.load(s, dir, "events")).orderBy(col("event_type"))),

    // Moving-frame window aggregates (r9): running total + trailing
    // 5-event sum per user — the ROWS BETWEEN frame surface (rank/lag/
    // lead/session are covered elsewhere; this is the sliding-frame
    // form). ONE exchange on user_id carries BOTH frames (same window
    // sort); sums are integer cents so any partitioning is bit-exact.
    "events_moving_agg" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .withColumn("running_cents",
          sum(col("cents")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("trail5_cents",
          sum(col("cents")).over(byUser.rowsBetween(-4, 0)))
        .withColumn("n_seen",
          count(lit(1)).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy(col("event_id"))
    }),

    // Fixed-point integer PageRank (r9): co-purchase centrality over the
    // lineitem part graph — 5 power-iteration rounds, every operation an
    // integer div/sum so any partitioning and any engine produce the
    // same bits (float PageRank is neither).
    "parts_pagerank" -> ((s, dir) =>
      graft.operators.Graph.partsPageRank(Tables.load(s, dir, "lineitem"))
        .orderBy(col("rnk"))),

    // Custom Catalyst AGGREGATE (r9): graft_top_k — a mergeable
    // k-bounded min-heap TypedImperativeAggregate. Where a row_number
    // window shuffles and sorts ROWS (WindowGroupLimit caps it at
    // k·tasks but rows still move), this ships k LONGS per partition
    // per group — sum/count economics for "just the top values".
    "events_topk_agg" -> ((s, dir) => {
      graft.functions.NativeHash.register(s)
      Tables.load(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(expr("array_join(graft_top_k(cents, 5), ',')").as("top5_cents"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // EXACT distinct aggregation (r9): per-type distinct users via
    // Spark's two-level rewrite — the dedup runs DISTRIBUTED on the
    // (type, user) key (first aggregate), then collapses to counts per
    // type; no per-type reducer ever sees all of a type's rows and no
    // collect_set ever materializes a set. The exact complement of
    // events_approx's mergeable-but-approximate HLL card.
    "events_distinct_exact" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))),

    // Native session-window operator (30-min gap): one shuffle on user_id,
    // sessions merged by Spark's SessionWindow — the streaming-ready form.
    "events_session_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), decSumDouble(col("value")).as("total_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // Backward as-of join: each purchase picks the user's most recent
    // click at-or-before it. ONE shuffle on user_id + a per-key sort
    // (union + window carry-forward, AsOf.joinAsOf) — no range join, no
    // per-key materialization; DuckDB's native ASOF JOIN is the oracle.
    "events_asof" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.AsOf.joinAsOf(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", tieBreak = Seq("click_id"))
        .orderBy(col("event_id"))
    }),

    // As-of with a tolerance horizon (attribution window): a matched
    // click older than 30 minutes is nulled out, not replaced — pandas
    // merge_asof `tolerance` semantics, mirrored as a post-ASOF CASE in
    // the oracle. Same single-shuffle plan as events_asof.
    "events_asof_tolerance" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.AsOf.joinAsOf(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", tieBreak = Seq("click_id"),
          tolerance = Some((lt, rt) =>
            unix_micros(lt) - unix_micros(rt) <= AsofToleranceUs))
        .orderBy(col("event_id"))
    }),

    // Forward as-of (r8): each purchase picks the user's EARLIEST click
    // at-or-after it — the "next action after conversion" form. Same
    // single-shuffle union+window plan, window frame reversed; smallest
    // (click_ts, click_id) wins (mirror of backward's greatest).
    "events_asof_forward" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.AsOf.joinAsOf(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", tieBreak = Seq("click_id"),
          direction = "forward")
        .orderBy(col("event_id"))
    }),

    // Nearest as-of (r8): whichever of the backward/forward matches is
    // closer in |Δt|, ties to backward — pandas merge_asof
    // direction='nearest'. Both windows share the key partitioning, so
    // the plan still has ONE Exchange (plus a second per-partition sort).
    "events_asof_nearest" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.AsOf.joinAsOf(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", tieBreak = Seq("click_id"),
          direction = "nearest")
        .orderBy(col("event_id"))
    }),

    // Banded range join: clicks within ±30 min of each purchase, same
    // user. Time-banding turns the per-key cross product into an
    // equi-join on (user_id, band) with candidates bounded ×3 — the
    // naive |Δt|<=W theta join is quadratic per hot key (RangeJoin doc).
    "events_range_join" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.RangeJoin.countInWindow(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", widthUs = RangeWidthUs,
          leftId = Some("event_id"))
        .orderBy(col("event_id"))
    }),
    // salted two-sided-skew form (r10): identical counts through
    // (key, band, salt) buckets — the flash-burst mitigation AQE's
    // one-sided skew split cannot provide; shares the plain oracle
    "events_range_join_salted" -> ((s, dir) => {
      val (p, c) = asofSides(s, dir)
      graft.operators.RangeJoin.countInWindowSalted(p, c, key = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts", widthUs = RangeWidthUs,
          leftId = Some("event_id"))
        .orderBy(col("event_id"))
    }),

    // Funnel resolution by CHAINED as-of joins: purchase ← its latest
    // prior click ← THAT click's latest prior view. Two single-shuffle
    // windows; stage 2's left time is stage 1's (nullable) match time,
    // exercising the null-left-never-matches contract for real: a
    // click-less purchase cannot acquire a view. funnel_depth ∈ {1,2,3}.
    "events_funnel" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val s1 = graft.operators.AsOf.joinAsOf(p, c, key = Seq("user_id"),
        leftTime = "ts", rightTime = "click_ts", tieBreak = Seq("click_id"))
      val s2 = graft.operators.AsOf.joinAsOf(s1, v, key = Seq("user_id"),
        leftTime = "click_ts", rightTime = "view_ts", tieBreak = Seq("view_id"))
      s2.withColumn("funnel_depth",
          lit(1L) + col("click_id").isNotNull.cast("long") +
            col("view_id").isNotNull.cast("long"))
        .orderBy(col("event_id"))
    }),

    // Markov transition card (r8): corpus-wide consecutive event-type
    // pair counts + distinct-user support, the journey-analytics number
    // funnels don't give. ONE user_id exchange for the lag window, then
    // a |types|²-keyed aggregate — partial map-side, output bounded by
    // the type-pair vocabulary at any corpus scale. Deterministic order:
    // (ms, event_id) — event_id is unique.
    "events_transitions" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      e.withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("from_type"), col("to_type"))
    }),
    // Gap-based sessionization (30 min) via window lag + running sum.
    "events_sessionize" -> ((s, dir) =>
      sessionFrame(s, dir).orderBy(col("user_id"), col("session_seq"))),

    // Session PATH mining (r9): top navigation paths — each session's
    // first-5 event-type sequence, counted corpus-wide (the funnel-
    // discovery complement of events_funnel's fixed chain). The rn<=5
    // cap bounds the path alphabet AND becomes a map-side
    // WindowGroupLimit; both windows ((user), (user, session)) ride the
    // SAME user_id exchange — hashpartitioning(user_id) satisfies the
    // (user, session) clustering, so sessionizing + ranking is one
    // shuffle. Paths are rebuilt ORDER-DETERMINISTICALLY: the rank rides
    // inside the collected struct and array_sort re-imposes it, so
    // collect_list's partition-order freedom can't leak into the string.
    "events_paths_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("ms", unix_millis(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val w2 = Window.partitionBy(col("user_id"), col("session_seq"))
        .orderBy(col("ms"), col("event_id"))
      val paths = e
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(w2))
        .filter(col("rn") <= 5)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
      val wr = Window.orderBy(col("n_sessions").desc, col("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
        .select(col("path"), col("n_sessions"), row_number().over(wr).as("rnk"))
    }),

    // Interval-OVERLAP join (r9): per session, how many OTHER users'
    // sessions overlap it in time — the classic temporal/concurrency
    // join, via the banded interval plan (RangeJoin.overlapCount).
    "events_session_overlap" -> ((s, dir) =>
      RangeJoin.overlapCount(
        sessionFrame(s, dir)
          .select(col("user_id"), col("session_seq"),
            col("session_start"), col("session_end")),
        Seq("user_id", "session_seq"), "session_start", "session_end",
        "user_id", 3600000L)
        .orderBy(col("user_id"), col("session_seq"))))

  /** The sessionization frame (30-min gap rule, decimal totals) —
    * shared by events_sessionize and the interval-overlap join.
    */
  private def sessionFrame(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ms", unix_millis(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    e.withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        decSumDouble(col("value")).as("total_value"))
  }

  /** Attribution horizon for events_asof_tolerance, micros — computed once
    * and interpolated into BOTH engines (30 minutes).
    */
  private val AsofToleranceUs: Long = 30L * 60 * 1000000

  /** Range-join half-width for events_range_join, micros (30 minutes);
    * shared with the streaming twin's default so the replay-equals-batch
    * contract can't drift on an unlinked copy.
    */
  private[graft] val RangeWidthUs: Long = 30L * 60 * 1000000

  /** Shared left/right projections of the as-of pair: purchases probe the
    * clicks stream. Non-key right columns renamed so the sides stay
    * disjoint (joinAsOf contract).
    */
  private[graft] def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.load(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    (p, c)
  }

  /** Per-type (mean, sd) from engine-exact decimal moments — the square
    * computed decimal×decimal BEFORE summing, derived stats in IEEE
    * double ops, greatest(·,0) against float cancellation. A
    * constant-size dim (one row per event type) at ANY corpus scale.
    */
  private[graft] def typeStats(ev: DataFrame): DataFrame = {
    val d = ev.withColumn("vd", col("value").cast("decimal(12,2)"))
    d.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("vd")).as("sv"),
        sum(col("vd") * col("vd")).as("svv"))
      .withColumn("mean_v", col("sv").cast("double") / col("n"))
      .withColumn("sd", sqrt(greatest(
        col("svv").cast("double") / col("n") - col("mean_v") * col("mean_v"),
        lit(0.0))))
      .select(col("event_type"), col("mean_v"), col("sd"))
  }

  /** A/B experiment card over an events frame — ONE aggregation:
    * per-arm moments as conditional decimal sums inside a single
    * per-type aggregate (the two-level groupBy(type, arm) → pivot form
    * would be a second aggregation — one more exchange in batch and
    * ILLEGAL in a streaming query, where multiple aggregations are
    * unsupported; this form is both cheaper and stream-ready, and the
    * streaming twin rides this exact call). Derived means/variances/z
    * are fixed IEEE shapes over exact decimal sums — engine-identical
    * bits. Arms are user parity: the user is the randomization unit.
    */
  private[graft] def abtestCard(events: DataFrame): DataFrame = {
    val d = events.filter(col("value").isNotNull)
      .withColumn("arm", (col("user_id") % 2).cast("int"))
      .withColumn("vd", dec(col("value")))
    def armAgg(a: Int, e: Column) = sum(when(col("arm") === a, e))
    d.groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        armAgg(0, col("vd")).as("sv_a"), armAgg(1, col("vd")).as("sv_b"),
        armAgg(0, col("vd") * col("vd")).as("svv_a"),
        armAgg(1, col("vd") * col("vd")).as("svv_b"))
      .withColumn("mean_a", col("sv_a").cast("double") / col("n_a"))
      .withColumn("mean_b", col("sv_b").cast("double") / col("n_b"))
      .withColumn("var_a", greatest(
        col("svv_a").cast("double") / col("n_a") - col("mean_a") * col("mean_a"),
        lit(0.0)))
      .withColumn("var_b", greatest(
        col("svv_b").cast("double") / col("n_b") - col("mean_b") * col("mean_b"),
        lit(0.0)))
      .withColumn("diff", col("mean_a") - col("mean_b"))
      .withColumn("z", col("diff") /
        sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
      .select("event_type", "n_a", "n_b", "mean_a", "mean_b", "diff", "z")
  }

  /** Flag rows beyond 3σ of their type against a precomputed stats dim
    * (broadcast: the dim never grows with data). Works identically on a
    * batch frame and a streaming micro-batch — the streaming twin rides
    * this exact call.
    */
  private[graft] def flagAnomalies(ev: DataFrame, stats: DataFrame): DataFrame =
    ev.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mean_v")) > lit(3.0) * col("sd"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean_v"), col("sd"),
        ((col("value") - col("mean_v")) / col("sd")).as("z"))

  /** The RAW sketch card (per event type: HLL++ distinct users +
    * p50/p95 value sketches) — the production surface at 100 TB, where
    * no exact counterpart is affordable. Not registered directly (its
    * values are engine-specific); pinned by TextOpsSpec's driver
    * replay (HLL++ bit-exact, percentiles rank-banded) and validated
    * in-plan by [[eventsApproxCard]], the registered row.
    */
  private[graft] def eventsApproxSketch(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_value"))

  /** The validated card behind the registered `events_approx` row: run
    * the sketches distributed, then verify them IN-PLAN against their
    * proven bounds so every output column is engine-reproducible and
    * the row hash-gates. One pass computes sketches + the exact
    * distinct; a second (broadcast of the ~5-row card) counts the
    * exact ranks of each returned percentile. Booleans are stable even
    * though percentile_approx is merge-order-dependent: ANY valid GK
    * output satisfies its rank-band contract, so the verdicts — not
    * the values — are deterministic.
    */
  private def eventsApproxCard(events: DataFrame): DataFrame = {
    val eps = 1.0 / 10000.0
    // the exact distinct lives in its OWN aggregate: mixing
    // count_distinct with the sketches makes Spark rewrite the agg
    // through an Expand (2 rows per input), and the GK percentile
    // buffers pay it superlinearly — measured 8.8 s vs 0.6 s for the
    // raw card at sf0.1; two 5-row aggregates joined cost the plain
    // two passes
    val sketches = events.groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id"), rsd = 0.02).as("au"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"))
    val exact = events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    val sk = sketches.join(exact, "event_type")
    events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .join(broadcast(sk), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p95"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("le95"),
        first(col("au")).as("au"),
        first(col("exact_users")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("au").cast("double") / col("exact_users").cast("double") - 1.0)
          <= 0.10).as("hll_in_band"),
        (col("lt50").cast("double") <= (lit(0.5) + eps) * col("n") + 1.0 &&
          col("le50").cast("double") >= (lit(0.5) - eps) * col("n") - 1.0)
          .as("p50_in_band"),
        (col("lt95").cast("double") <= (lit(0.95) + eps) * col("n") + 1.0 &&
          col("le95").cast("double") >= (lit(0.95) - eps) * col("n") - 1.0)
          .as("p95_in_band"))
  }

  private val Revenue =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"

  // the salted range join is count-identical to the plain plan by
  // construction (every candidate pair meets in exactly one salt
  // bucket), so it replays the same oracle
  def oracles: Map[String, String] = oracleEntries +
    ("events_range_join_salted" -> oracleEntries("events_range_join"))

  private def oracleEntries: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDecSum("l_quantity")} AS sum_qty,
         |  ${sqlDecSum("l_extendedprice")} AS sum_base_price,
         |  $Revenue AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
         |    * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the validated sketch card: exact distinct reproduces in any
    // engine; the in-band verdicts are TRUE whenever the sketches meet
    // their proven bounds — a broken sketch flips one and the hash gate
    // goes red (the sketch VALUES stay spec-gated by driver replay)
    "events_approx" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_in_band, TRUE AS p50_in_band, TRUE AS p95_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q3_join" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $Revenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
    "q5_join" ->
      s"""SELECT n_name, $Revenue AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "topk_per_group" ->
      """SELECT o_orderpriority, CAST(rnk AS INT) AS rnk, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 5
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "events_window" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
         |  COUNT(*) AS n_events, ${sqlDecSum("\"value\"")} AS total_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY hour, event_type""".stripMargin,
    "q4_priority_orders" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT promo_revenue, total_revenue,
         |  100.0 * promo_revenue / total_revenue AS promo_share_pct
         |FROM (
         |  SELECT
         |    CAST(SUM(CASE WHEN p_type = 'ECONOMY'
         |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
         |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
         |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
         |    $Revenue AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')""".stripMargin,
    "q12_priority_lines" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,
    // hop replay: a µs timestamp t belongs to the two epoch-aligned
    // 30-min starts {floor30(t), floor30(t) − 30min} for a 1h window —
    // Spark's TimeWindow expansion in closed form (positive epoch µs,
    // so the % floor is exact)
    "events_window_hopping" ->
      s"""WITH e AS (
         |  SELECT event_type, "value", epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
         |hops AS (
         |  SELECT event_type, "value",
         |         unnest([tu - tu % 1800000000, tu - tu % 1800000000 - 1800000000]) AS s
         |  FROM e)
         |SELECT make_timestamp(s) AS w_start, event_type,
         |  COUNT(*) AS n_events, ${sqlDecSum("\"value\"")} AS total_value
         |FROM hops GROUP BY 1, 2
         |ORDER BY w_start, event_type""".stripMargin,
    "q10_returned" ->
      s"""SELECT c_custkey, c_name, n_name, $Revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "events_anomaly" ->
      s"""WITH s AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sv,
         |    CAST(SUM(CAST("value" AS DECIMAL(12,2)) *
         |             CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS svv
         |  FROM events WHERE "value" IS NOT NULL GROUP BY event_type),
         |m AS (SELECT event_type, n, sv / n AS mean_v, svv FROM s),
         |st AS (
         |  SELECT event_type, mean_v,
         |    sqrt(greatest(svv / n - mean_v * mean_v, 0)) AS sd
         |  FROM m)
         |SELECT e.event_id, e.event_type, e."value", st.mean_v, st.sd,
         |  (e."value" - st.mean_v) / st.sd AS z
         |FROM events e JOIN st ON e.event_type = st.event_type
         |WHERE e."value" IS NOT NULL
         |  AND abs(e."value" - st.mean_v) > 3.0 * st.sd
         |ORDER BY e.event_id""".stripMargin,
    "events_retention_cohorts" ->
      s"""WITH fs AS (
         |  SELECT user_id, date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort_day
         |  FROM events GROUP BY user_id)
         |SELECT fs.cohort_day,
         |  CAST(date_diff('day', CAST(fs.cohort_day AS DATE),
         |                  CAST(e.ts AS DATE)) AS INT) AS period,
         |  COUNT(DISTINCT e.user_id) AS n_active, COUNT(*) AS n_events
         |FROM events e JOIN fs ON e.user_id = fs.user_id
         |GROUP BY 1, 2 ORDER BY cohort_day, period""".stripMargin,
    "events_gap_stats" ->
      s"""WITH g AS (
         |  SELECT event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
         |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_gaps,
         |  MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
         |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
         |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
         |FROM g WHERE gap_us IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // session_window end = last event ts + gap. Boundary convention BY
    // CONSTRUCTION (round-2 ADVICE): Spark's session window is half-open
    // [ts, ts+gap) over microsecond timestamps, so an event exactly `gap`
    // after its predecessor starts a NEW session — hence epoch_us and >=
    // at the boundary (the previous epoch_ms/strict-> form only agreed
    // because the data never hit the boundary).
    "events_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, "value",
         |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
         |  FROM events),
         |flags AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT *, SUM(new_sess) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
         |  FROM flags)
         |SELECT user_id, MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         |  COUNT(*) AS n_events, ${sqlDecSum("\"value\"")} AS total_value
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, session_start""".stripMargin,
    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${sqlDecSum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${sqlDecSum("l_quantity")} > 150)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 100""".stripMargin,
    "orders_anti_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  ${sqlDecSum("o_totalprice")} AS total
         |FROM orders o
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM lineitem
         |  WHERE l_orderkey = o.o_orderkey
         |    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00')
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "events_rollup" ->
      s"""SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         |  COUNT(*) AS n_events, ${sqlDecSum("\"value\"")} AS total_value,
         |  CAST(GROUPING(event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS level
         |FROM events
         |GROUP BY ROLLUP(event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)))
         |ORDER BY level, event_type, hour""".stripMargin,
    "events_distinct_exact" ->
      s"""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // top-k agg replay: descending top-5 multiset via a rank window
    // (ties are equal VALUES, so any tie order yields the same string);
    // packed as a string for the scalar-only compare
    "events_topk_agg" ->
      s"""WITH cents AS (
         |  SELECT event_type, CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE "value" IS NOT NULL),
         |n AS (SELECT event_type, COUNT(*) AS n_events FROM cents GROUP BY 1),
         |r AS (SELECT event_type, c, row_number() OVER (
         |        PARTITION BY event_type ORDER BY c DESC) AS rn FROM cents),
         |t AS (SELECT event_type,
         |        string_agg(CAST(c AS VARCHAR), ',' ORDER BY rn) AS top5_cents
         |      FROM r WHERE rn <= 5 GROUP BY 1)
         |SELECT t.event_type, t.top5_cents, n.n_events
         |FROM t JOIN n USING (event_type) ORDER BY event_type""".stripMargin,
    // abtest replay: same parity arms, conditional decimal moments in
    // ONE aggregate, same fixed IEEE shapes for mean/variance/z
    "events_abtest" ->
      s"""WITH s AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0
         |      THEN CAST("value" AS DECIMAL(12,2)) END) AS DOUBLE) AS sv_a,
         |    CAST(SUM(CASE WHEN user_id % 2 = 1
         |      THEN CAST("value" AS DECIMAL(12,2)) END) AS DOUBLE) AS sv_b,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0
         |      THEN CAST("value" AS DECIMAL(12,2)) * CAST("value" AS DECIMAL(12,2))
         |      END) AS DOUBLE) AS svv_a,
         |    CAST(SUM(CASE WHEN user_id % 2 = 1
         |      THEN CAST("value" AS DECIMAL(12,2)) * CAST("value" AS DECIMAL(12,2))
         |      END) AS DOUBLE) AS svv_b
         |  FROM events WHERE "value" IS NOT NULL GROUP BY event_type),
         |m AS (
         |  SELECT event_type, n_a, n_b,
         |    sv_a / n_a AS mean_a, sv_b / n_b AS mean_b,
         |    greatest(svv_a / n_a - (sv_a / n_a) * (sv_a / n_a), 0) AS var_a,
         |    greatest(svv_b / n_b - (sv_b / n_b) * (sv_b / n_b), 0) AS var_b
         |  FROM s)
         |SELECT event_type, n_a, n_b, mean_a, mean_b,
         |  mean_a - mean_b AS diff,
         |  (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS z
         |FROM m ORDER BY event_type""".stripMargin,
    "events_moving_agg" ->
      s"""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         |  CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         |  CAST(SUM(CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER (
         |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
         |  CAST(SUM(CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER (
         |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail5_cents,
         |  CAST(COUNT(*) OVER (
         |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_seen
         |FROM events ORDER BY event_id""".stripMargin,
    // pagerank replay: identical integer power iteration, r0..r5 as
    // chained CTEs (generated, like the codebook CTEs)
    "parts_pagerank" -> {
      val S = 1000000000000L
      val rounds = 5
      val head =
        s"""WITH pairs AS (
           |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |edges AS (
           |  SELECT pa AS src, pb AS dst FROM pairs
           |  UNION ALL SELECT pb AS src, pa AS dst FROM pairs),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |deg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY 1),
           |r0 AS (SELECT id, CAST($S AS BIGINT) AS r FROM nodes)""".stripMargin
      val chain = (1 to rounds).map { t =>
        s""",
           |r$t AS (
           |  SELECT n.id,
           |    CAST((15 * $S) // 100 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, SUM(p.r // d.d) AS m
           |    FROM edges e JOIN r${t - 1} p ON p.id = e.src JOIN deg d ON d.id = e.src
           |    GROUP BY e.dst) s ON s.id = n.id)""".stripMargin
      }.mkString
      head + chain +
        s"""
           |SELECT id AS part_id, r AS rank_fp,
           |  CAST(row_number() OVER (ORDER BY r DESC, id) AS INT) AS rnk
           |FROM r$rounds ORDER BY r DESC, id LIMIT 20""".stripMargin
    },
    // the layout must not change answers: the oracle is the PLAIN join
    "q_join_bucketed" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_lines, $Revenue AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the bloom prune is LOSSLESS through the join: oracle = plain join
    "orders_bloom_join" ->
      s"""SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
         |  COUNT(*) AS n_lines, $Revenue AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY 1 ORDER BY month""".stripMargin,
    // bloom replay: same LCG positions, same 60-bit word packing; a
    // missing word reads as 0 on both sides
    "orders_bloom_prune" -> {
      val (m, bpw, p) = (61440L, BloomFilterOps.BitsPerWord, BloomFilterOps.P)
      val Seq((a1, b1), (a2, b2)) = BloomFilterOps.Hashes
      s"""WITH bkeys AS (
         |  SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
         |pos AS (SELECT unnest([((k % $p)*$a1 + $b1) % $p % $m,
         |                       ((k % $p)*$a2 + $b2) % $p % $m]) AS h FROM bkeys),
         |words AS (SELECT h // $bpw AS w,
         |                 bit_or(CAST(1 AS BIGINT) << CAST(h % $bpw AS INT)) AS word
         |          FROM pos GROUP BY 1),
         |probe AS (SELECT l_orderkey AS k,
         |                 ((l_orderkey % $p)*$a1 + $b1) % $p % $m AS h1,
         |                 ((l_orderkey % $p)*$a2 + $b2) % $p % $m AS h2 FROM lineitem),
         |j AS (SELECT p.k,
         |        ((COALESCE(w1.word, 0) >> CAST(p.h1 % $bpw AS INT)) & 1) = 1
         |        AND ((COALESCE(w2.word, 0) >> CAST(p.h2 % $bpw AS INT)) & 1) = 1 AS pass
         |      FROM probe p
         |      LEFT JOIN words w1 ON w1.w = p.h1 // $bpw
         |      LEFT JOIN words w2 ON w2.w = p.h2 // $bpw),
         |truth AS (SELECT COUNT(*) AS n_true FROM lineitem
         |          WHERE l_orderkey IN (SELECT k FROM bkeys))
         |SELECT (SELECT COUNT(*) FROM bkeys) AS n_build_keys,
         |       (SELECT CAST(SUM(bit_count(word)) AS BIGINT) FROM words) AS bits_set,
         |       COUNT(*) AS n_probe,
         |       CAST(COUNT(CASE WHEN pass THEN 1 END) AS BIGINT) AS n_pass,
         |       (SELECT n_true FROM truth) AS n_true,
         |       CAST(COUNT(CASE WHEN pass THEN 1 END) AS BIGINT)
         |         - (SELECT n_true FROM truth) AS n_false_pos,
         |       CAST(CAST(COUNT(CASE WHEN pass THEN 1 END) AS BIGINT)
         |              - (SELECT n_true FROM truth) AS DOUBLE)
         |         / CAST(COUNT(*) - (SELECT n_true FROM truth) AS DOUBLE) AS fp_rate
         |FROM j""".stripMargin
    },
    "events_cube" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         |         "value"
         |  FROM events)
         |SELECT event_type, day,
         |  CAST(GROUPING(event_type) AS INT) AS g_type,
         |  CAST(GROUPING(day) AS INT) AS g_day,
         |  CAST(GROUPING(event_type, day) AS BIGINT) AS gid,
         |  COUNT(*) AS n_events, ${sqlDecSum("\"value\"")} AS total_value
         |FROM e GROUP BY CUBE(event_type, day)
         |ORDER BY gid, event_type, day""".stripMargin,
    "events_pivot" ->
      s"""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         |  ${Seq("click", "error", "purchase", "signup", "view").map(t =>
             s"""CAST(SUM(CASE WHEN event_type = '$t' THEN CAST("value" AS DECIMAL(12,2)) END) AS DOUBLE) AS ${t}_total""")
            .mkString(",\n  ")}
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "events_percentiles" ->
      s"""WITH cents AS (
         |  SELECT event_type, CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
         |  FROM events WHERE "value" IS NOT NULL),
         |hist AS (
         |  SELECT event_type, c, COUNT(*) AS cnt FROM cents GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, c,
         |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
         |         SUM(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM hist)
         |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
         |  MIN(CASE WHEN cum >= (50*n + 99) // 100 THEN c END) AS p50_cents,
         |  MIN(CASE WHEN cum >= (90*n + 99) // 100 THEN c END) AS p90_cents,
         |  MIN(CASE WHEN cum >= (99*n + 99) // 100 THEN c END) AS p99_cents
         |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_asof" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts,
         |         "value" AS click_value
         |  FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, p.ts, p."value",
         |       c.click_id, c.click_ts, c.click_value
         |FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
         |ORDER BY p.event_id""".stripMargin,
    "events_asof_tolerance" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts,
         |         "value" AS click_value
         |  FROM events WHERE event_type = 'click'),
         |j AS (
         |  SELECT p.event_id, p.user_id, p.ts, p."value",
         |         c.click_id, c.click_ts, c.click_value,
         |         epoch_us(p.ts) - epoch_us(c.click_ts) <= ${AsofToleranceUs} AS ok
         |  FROM p ASOF LEFT JOIN c
         |    ON p.user_id = c.user_id AND p.ts >= c.click_ts)
         |SELECT event_id, user_id, ts, "value",
         |       CASE WHEN ok THEN click_id END AS click_id,
         |       CASE WHEN ok THEN click_ts END AS click_ts,
         |       CASE WHEN ok THEN click_value END AS click_value
         |FROM j ORDER BY event_id""".stripMargin,
    // DuckDB's ASOF accepts <= (forward) but gives no tie-break control,
    // so both direction variants replay as the rank pattern instead: all
    // in-direction candidates ranked by (click_ts, click_id) and the
    // rank-1 row joined back — prototyped equal to native ASOF on the
    // backward direction (tools/proto_pipeline.py pattern).
    "events_asof_forward" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts,
         |         "value" AS click_value
         |  FROM events WHERE event_type = 'click'),
         |cand AS (
         |  SELECT p.event_id, c.click_id, c.click_ts, c.click_value,
         |         row_number() OVER (PARTITION BY p.event_id
         |           ORDER BY c.click_ts ASC, c.click_id ASC) AS rk
         |  FROM p JOIN c ON p.user_id = c.user_id AND c.click_ts >= p.ts)
         |SELECT p.event_id, p.user_id, p.ts, p."value",
         |       cand.click_id, cand.click_ts, cand.click_value
         |FROM p LEFT JOIN cand ON cand.event_id = p.event_id AND cand.rk = 1
         |ORDER BY p.event_id""".stripMargin,
    // nearest = the closer of the backward/forward rank-1 candidates;
    // forward candidates use STRICT > so an exactly-simultaneous click is
    // the backward candidate alone (distance 0 makes backward win the tie
    // in both engines either way)
    "events_asof_nearest" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts,
         |         "value" AS click_value
         |  FROM events WHERE event_type = 'click'),
         |b AS (
         |  SELECT p.event_id, c.click_id, c.click_ts, c.click_value,
         |         row_number() OVER (PARTITION BY p.event_id
         |           ORDER BY c.click_ts DESC, c.click_id DESC) AS rk
         |  FROM p JOIN c ON p.user_id = c.user_id AND c.click_ts <= p.ts),
         |f AS (
         |  SELECT p.event_id, c.click_id, c.click_ts, c.click_value,
         |         row_number() OVER (PARTITION BY p.event_id
         |           ORDER BY c.click_ts ASC, c.click_id ASC) AS rk
         |  FROM p JOIN c ON p.user_id = c.user_id AND c.click_ts > p.ts)
         |SELECT p.event_id, p.user_id, p.ts, p."value",
         |  CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL
         |         OR epoch_us(p.ts) - epoch_us(b.click_ts) <= epoch_us(f.click_ts) - epoch_us(p.ts))
         |       THEN b.click_id ELSE f.click_id END AS click_id,
         |  CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL
         |         OR epoch_us(p.ts) - epoch_us(b.click_ts) <= epoch_us(f.click_ts) - epoch_us(p.ts))
         |       THEN b.click_ts ELSE f.click_ts END AS click_ts,
         |  CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL
         |         OR epoch_us(p.ts) - epoch_us(b.click_ts) <= epoch_us(f.click_ts) - epoch_us(p.ts))
         |       THEN b.click_value ELSE f.click_value END AS click_value
         |FROM p LEFT JOIN b ON b.event_id = p.event_id AND b.rk = 1
         |       LEFT JOIN f ON f.event_id = p.event_id AND f.rk = 1
         |ORDER BY p.event_id""".stripMargin,
    "events_range_join" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts
         |  FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id, p.ts, p."value",
         |       CAST(COUNT(c.click_ts) AS BIGINT) AS n_in_window
         |FROM p LEFT JOIN c
         |  ON p.user_id = c.user_id
         | AND abs(epoch_us(p.ts) - epoch_us(c.click_ts)) <= ${RangeWidthUs}
         |GROUP BY p.event_id, p.user_id, p.ts, p."value"
         |ORDER BY p.event_id""".stripMargin,

    // NOTE: DuckDB 1.0's ASOF matches a NULL probe time to the greatest
    // right row (nulls sort high); graft's contract — mirrored from
    // pandas merge_asof, which rejects null keys outright — is that a
    // null time never matches, so the view columns are explicitly nulled
    // for click-less rows.
    "events_funnel" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "value"
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
         |  FROM events WHERE event_type = 'click'),
         |v AS (
         |  SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
         |  FROM events WHERE event_type = 'view'),
         |s1 AS (
         |  SELECT p.event_id, p.user_id, p.ts, p."value", c.click_id, c.click_ts
         |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts),
         |s2 AS (
         |  SELECT s1.*,
         |         CASE WHEN s1.click_id IS NOT NULL THEN v.view_id END AS view_id,
         |         CASE WHEN s1.click_id IS NOT NULL THEN v.view_ts END AS view_ts
         |  FROM s1 ASOF LEFT JOIN v
         |    ON s1.user_id = v.user_id AND s1.click_ts >= v.view_ts)
         |SELECT *,
         |  CAST(1 + CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END
         |         + CASE WHEN view_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_depth
         |FROM s2 ORDER BY event_id""".stripMargin,

    // lag over the identical (ms, event_id) order; pair counts +
    // distinct-user support are pure integers
    "events_transitions" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type,
         |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
         |  FROM events),
         |t AS (
         |  SELECT user_id, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS from_type
         |  FROM e)
         |SELECT from_type, event_type AS to_type,
         |       CAST(COUNT(*) AS BIGINT) AS n_transitions,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM t WHERE from_type IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // overlap replay: the sessionize CTEs + the naive theta join the
    // banded plan replaces; comparisons on epoch_ms both engines (the
    // operator bands/verifies on unix_millis — ms floor matches)
    "events_session_overlap" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
         |  FROM events),
         |flags AS (
         |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
         |                   OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (
         |    PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flags),
         |agg AS (
         |  SELECT user_id, session_seq, MIN(ms) AS s_ms, MAX(ms) AS e_ms
         |  FROM sess GROUP BY user_id, session_seq)
         |SELECT a.user_id, a.session_seq, CAST(COUNT(b.user_id) AS BIGINT) AS n_overlap
         |FROM agg a LEFT JOIN agg b
         |  ON a.user_id <> b.user_id AND a.s_ms <= b.e_ms AND b.s_ms <= a.e_ms
         |GROUP BY a.user_id, a.session_seq
         |ORDER BY a.user_id, a.session_seq""".stripMargin,
    // path replay: same gap rule, same (ms, event_id) total order inside
    // the session, string_agg with an explicit ORDER BY
    "events_paths_topk" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type,
         |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
         |  FROM events),
         |flags AS (
         |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
         |                   OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sess AS (
         |  SELECT *, SUM(new_sess) OVER (
         |    PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)
         |      AS session_seq
         |  FROM flags),
         |rn AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id, session_seq ORDER BY ms, event_id) AS rn
         |  FROM sess),
         |paths AS (
         |  SELECT user_id, session_seq, string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM rn WHERE rn <= 5 GROUP BY 1, 2),
         |agg AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY 1)
         |SELECT path, n_sessions,
         |  CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT) AS rnk
         |FROM agg ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "events_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, "value",
         |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
         |  FROM events),
         |flags AS (
         |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
         |                   OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (
         |    PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flags)
         |SELECT user_id, session_seq, COUNT(*) AS n_events,
         |  MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  ${sqlDecSum("\"value\"")} AS total_value
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin)
}
