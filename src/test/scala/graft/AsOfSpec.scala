package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.queries.AnalyticsQueries

/** Backward as-of join (AsOf.joinAsOf): match semantics, null-time
  * handling, tie-breaks, tolerance gating, and the single-shuffle plan
  * shape (union + window — never a range join).
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades/quotes micro-fixture: the classic as-of shape
  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:10"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:01"), 50.0),
      (4L, "C", ts("2024-01-01 10:00:30"), 75.0) // no quotes for C at all
    ).toDF("trade_id", "sym", "t_ts", "t_px")
  }

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, "A", ts("2024-01-01 10:00:00"), 99.5),
      (11L, "A", ts("2024-01-01 10:00:10"), 100.5), // exactly at trade 2 → matches (>=)
      (12L, "A", ts("2024-01-01 10:00:20"), 101.5), // after every trade → never matches
      (13L, "B", ts("2024-01-01 10:00:02"), 49.5) // after B's only trade
    ).toDF("quote_id", "sym", "q_ts", "q_px")
  }

  private def asof(l: DataFrame, r: DataFrame) =
    AsOf.joinAsOf(l, r, key = Seq("sym"), leftTime = "t_ts", rightTime = "q_ts",
      tieBreak = Seq("quote_id"))

  test("backward match: latest quote at-or-before each trade; unmatched trades survive with nulls") {
    val got = asof(trades, quotes).orderBy("trade_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq(1L -> 10L, 2L -> 11L, 3L -> -1L, 4L -> -1L))
  }

  test("null right times are ignored, not carried into every left row") {
    // a null-time quote sorts FIRST under a naive ascending window — the
    // round-6 ADVICE bug would make it the match for trade 3 (sym B has
    // no at-or-before quote); DuckDB ASOF drops null times, so must we
    val nullQuote = quotes.unionByName(
      quotes.limit(1).select(lit(99L).as("quote_id"), lit("B").as("sym"),
        lit(null).cast("timestamp").as("q_ts"), lit(0.0).as("q_px")))
    val got = asof(trades, nullQuote).orderBy("trade_id").collect()
    assert(got.forall(r => !(r.getAs[Any]("quote_id") == 99L)))
    assert(got(2).isNullAt(got(2).fieldIndex("quote_id"))) // trade 3 still unmatched
  }

  test("null right times are ignored in forward and nearest directions too") {
    // round-8 ADVICE worried a null-time right row could win the backward
    // frame inside `nearest` (null distB ⇒ null <= comparison ⇒ silent
    // fall-through). The rightTime.isNotNull pre-filter (AsOf.scala)
    // excludes it from EVERY direction before the union — pin all three.
    val nullQuote = quotes.unionByName(
      quotes.limit(1).select(lit(99L).as("quote_id"), lit("B").as("sym"),
        lit(null).cast("timestamp").as("q_ts"), lit(0.0).as("q_px")))
    for (dir <- Seq("forward", "nearest")) {
      val got = AsOf.joinAsOf(trades, nullQuote, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = dir).collect()
      assert(got.forall(r => !(r.getAs[Any]("quote_id") == 99L)),
        s"direction=$dir surfaced the null-time right row")
    }
  }

  test("null LEFT time survives unmatched (comparison with null never matches)") {
    val nullTrade = trades.unionByName(
      trades.limit(1).select(lit(9L).as("trade_id"), lit("A").as("sym"),
        lit(null).cast("timestamp").as("t_ts"), lit(0.0).as("t_px")))
    val row = asof(nullTrade, quotes).filter(col("trade_id") === 9L).head()
    assert(row.isNullAt(row.fieldIndex("quote_id")))
  }

  test("equal-(key,time) right rows: greatest tieBreak tuple wins deterministically") {
    val dup = quotes.unionByName(
      quotes.limit(1).select(lit(14L).as("quote_id"), lit("A").as("sym"),
        lit(ts("2024-01-01 10:00:00")).as("q_ts"), lit(98.0).as("q_px")))
    // trade 1 sees quotes {10, 14} at the same ts → max quote_id (14) wins
    val row = asof(trades, dup).filter(col("trade_id") === 1L).head()
    assert(row.getLong(row.fieldIndex("quote_id")) === 14L)
  }

  test("tolerance nulls out a too-old match instead of falling back") {
    val got = AsOf.joinAsOf(trades, quotes, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        tolerance = Some((lt, rt) => unix_micros(lt) - unix_micros(rt) <= 2000000L))
      .orderBy("trade_id").collect()
    // trade 1: quote 10 is 5s old > 2s → nulled (NOT replaced by anything)
    assert(got(0).isNullAt(got(0).fieldIndex("quote_id")))
    // trade 2: quote 11 is 0s old → kept
    assert(got(1).getLong(got(1).fieldIndex("quote_id")) === 11L)
  }

  test("forward match: earliest quote at-or-after each trade; equal-time quote counts; " +
      "smallest tieBreak wins; unmatched trades survive with nulls") {
    val got = AsOf.joinAsOf(trades, quotes, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 1 → quote 11 (next A quote), trade 2 → quote 11 (exactly at,
    // >= includes), trade 3 → quote 13 (B's later quote), trade 4 → none
    assert(got.toSeq === Seq(1L -> 11L, 2L -> 11L, 3L -> 13L, 4L -> -1L))
    // equal-(key,time) duplicate: SMALLEST id wins for forward (mirror of
    // backward's greatest — each direction prefers its nearest-in-sort row)
    val dup = quotes.unionByName(
      quotes.limit(1).select(lit(7L).as("quote_id"), lit("A").as("sym"),
        lit(ts("2024-01-01 10:00:10")).as("q_ts"), lit(98.0).as("q_px")))
    val row = AsOf.joinAsOf(trades, dup, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = "forward")
      .filter(col("trade_id") === 2L).head()
    assert(row.getLong(row.fieldIndex("quote_id")) === 7L)
  }

  test("forward: a null LEFT time never matches (ascending sort puts nulls first — " +
      "the following frame holds real quotes and must be gated)") {
    val nullTrade = trades.unionByName(
      trades.limit(1).select(lit(9L).as("trade_id"), lit("A").as("sym"),
        lit(null).cast("timestamp").as("t_ts"), lit(0.0).as("t_px")))
    val row = AsOf.joinAsOf(nullTrade, quotes, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = "forward")
      .filter(col("trade_id") === 9L).head()
    assert(row.isNullAt(row.fieldIndex("quote_id")))
  }

  test("nearest picks the closer side; exact tie in |Δt| prefers the backward match") {
    import spark.implicits._
    val l = Seq(
      (1L, "A", ts("2024-01-01 10:00:10")), // 4s to quote 20, 2s to quote 21 → forward
      (2L, "A", ts("2024-01-01 10:00:07")), // 1s back, 5s forward → backward
      (3L, "A", ts("2024-01-01 10:00:09")), // exact 3s tie → backward (quote 20)
      (4L, "B", ts("2024-01-01 10:00:00")) // no B quotes → null
    ).toDF("trade_id", "sym", "t_ts")
    val r = Seq(
      (20L, "A", ts("2024-01-01 10:00:06"), 1.0),
      (21L, "A", ts("2024-01-01 10:00:12"), 2.0)
    ).toDF("quote_id", "sym", "q_ts", "q_px")
    val got = AsOf.joinAsOf(l, r, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = "nearest")
      .orderBy("trade_id")
      .select("trade_id", "quote_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
    assert(got.toSeq === Seq(1L -> 21L, 2L -> 20L, 3L -> 20L, 4L -> -1L))
  }

  test("nearest plan shape: still ONE hash Exchange (second direction re-sorts, " +
      "never re-shuffles) and no join operator") {
    val plan = AsOf.joinAsOf(trades, quotes, key = Seq("sym"),
        leftTime = "t_ts", rightTime = "q_ts", tieBreak = Seq("quote_id"),
        direction = "nearest")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan as a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one hash Exchange, got $exchanges:\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).size >= 2, s"expected both direction sorts:\n$plan")
  }

  test("colliding non-key columns are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(trades, quotes.withColumnRenamed("q_px", "t_px"),
        key = Seq("sym"), leftTime = "t_ts", rightTime = "q_ts")
    }
  }

  test("plan shape: one hash Exchange on the key, a window, and NO join operator") {
    val plan = asof(trades, quotes).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan as a join:\n$plan")
    assert(plan.contains("Window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one hash Exchange, got $exchanges:\n$plan")
  }

  test("stream_asof: multi-batch replay equals batch events_asof; the bucketed click " +
      "history never exchanges") {
    import graft.streaming.{AsOfStream, TopicStream}
    import graft.sources.Tables
    val dir = "target/stream-scratch/asof-split"
    Tables.load(spark, sf, "events").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (out, ckpt) = TopicStream.scratchDirs("spec_asof_stream", dir)
    val got = AsOfStream.asofStream(spark, dir, out, ckpt, maxFilesPerTrigger = Some(1))
    val plan = TopicStream.lastBatchPlan
    assert(plan.contains("graft_asof_clicks"), s"bucketed click-history scan missing:\n$plan")
    // 1 = the micro-batch side of the history join; the static click
    // history itself plans with NO Exchange (the per-purchase reduction
    // is a batch-local foreachBatch aggregate, outside this plan)
    val cut = plan.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) plan.substring(0, cut) else plan
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex === 1, s"as-of probe must shuffle only the micro-batch (1 Exchange):\n$plan")
    val want = AnalyticsQueries.queries("events_asof")(spark, sf)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    assert(got.count() > 0)
  }

  test("funnel: chained as-of keeps stage order (view <= click <= purchase) and a " +
      "click-less purchase never acquires a view (null-left contract, unlike raw DuckDB ASOF)") {
    val f = AnalyticsQueries.queries("events_funnel")(spark, sf).cache()
    assert(f.filter(col("click_id").isNull && col("view_id").isNotNull).count() === 0)
    assert(f.filter(col("view_ts") > col("click_ts") || col("click_ts") > col("ts"))
      .count() === 0)
    // depth column is derived, not independent
    assert(f.filter(col("funnel_depth") =!=
      (lit(1) + col("click_id").isNotNull.cast("long") + col("view_id").isNotNull.cast("long")))
      .count() === 0)
    assert(f.count() > 0)
    f.unpersist()
  }

  test("stream_funnel: multi-batch replay equals batch events_funnel; both bucketed " +
      "histories probe with zero static Exchange") {
    import graft.streaming.{AsOfStream, TopicStream}
    import graft.sources.Tables
    val dir = "target/stream-scratch/funnel-split"
    Tables.load(spark, sf, "events").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (out, ckpt) = TopicStream.scratchDirs("spec_funnel_stream", dir)
    val got = AsOfStream.funnelStream(spark, dir, out, ckpt, maxFilesPerTrigger = Some(1))
    // stage 1 (streaming plan): bucketed click history, batch-only shuffle
    val plan = TopicStream.lastBatchPlan
    assert(plan.contains("graft_funnel_clicks"), s"bucketed click scan missing:\n$plan")
    val cut = plan.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) plan.substring(0, cut) else plan
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"funnel stage 1 must shuffle only the micro-batch:\n$plan")
    // stage 2 (per-batch plan): pin it directly — the views table reads
    // bucketed with no Exchange; the batch side shuffles for join + agg
    val s1 = AnalyticsQueries.queries("events_asof")(spark, sf)
      .select("event_id", "user_id", "ts", "value", "click_id", "click_ts")
    val probePlan = graft.streaming.AsOfStream
      .resolveViews(s1, spark.table("graft_funnel_views"))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("graft_funnel_views"), probePlan)
    assert(!probePlan.contains("BroadcastExchange"),
      s"the views history must not broadcast:\n$probePlan")
    val want = AnalyticsQueries.queries("events_funnel")(spark, sf)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    assert(got.filter(col("funnel_depth") === 3).count() > 0)
  }

  test("events_asof matches a window-free reference computed per row") {
    // independent in-test oracle at sf0.001 (the DuckDB ASOF gate runs at
    // sf0.01 in Verify): per purchase, max_by over the filtered clicks
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val ref = p.join(c, Seq("user_id"), "left_outer")
      .withColumn("ok", col("click_ts").isNotNull && col("click_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(max(when(col("ok"), struct(col("click_ts"), col("click_id")))).as("m"))
      .select(col("event_id"), col("m.click_id").as("ref_click_id"))
    val got = AnalyticsQueries.queries("events_asof")(spark, sf)
      .select("event_id", "click_id")
    val diff = got.join(ref, Seq("event_id"))
      .filter(!(col("click_id") <=> col("ref_click_id")))
    assert(diff.count() === 0)
    assert(got.count() > 0)
  }
}
