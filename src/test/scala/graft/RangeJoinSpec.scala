package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.queries.AnalyticsQueries

/** Banded range join: losslessness vs the naive theta join, boundary
  * inclusivity, and the candidate-bounded equi-join plan shape.
  */
class RangeJoinSpec extends SparkSpec {

  private val W = 30L * 60 * 1000000 // 30 min in micros

  test("banding is lossless: counts equal the naive |Δt|<=W theta join on real events") {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val banded = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W)
      .select("event_id", "n_in_window")
    val naive = p.as("p").join(c.as("c"),
        col("p.user_id") === col("c.user_id") &&
          abs(unix_micros(col("p.ts")) - unix_micros(col("c.click_ts"))) <= W,
        "left_outer")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(count(col("c.click_ts")).as("n_in_window"))
    assert(banded.exceptAll(naive).count() === 0 && naive.exceptAll(banded).count() === 0)
    assert(banded.filter(col("n_in_window") > 0).count() > 0, "fixture must exercise matches")
  }

  test("interval overlap: hand fixture covers multi-band spans and inclusive " +
      "boundaries; banded count equals the naive theta join on real sessions") {
    import spark.implicits._
    val iv = Seq(
      ("a", 1L, 0L, 7200000L), // 2h — spans three 1h bands
      ("b", 1L, 3600000L, 5400000L), // inside a1
      ("b", 2L, 9000000L, 9600000L), // disjoint from everything
      ("c", 1L, 7200000L, 7300000L), // touches a1 exactly at its end
      ("a", 2L, 20000000L, 21000000L)) // overlaps nothing
      .toDF("g", "iid", "sms", "ems")
      .withColumn("s", timestamp_millis(col("sms")))
      .withColumn("e", timestamp_millis(col("ems")))
    val out = RangeJoin.overlapCount(iv, Seq("g", "iid"), "s", "e", "g", 3600000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", 1L) -> 2L, ("b", 1L) -> 1L, ("b", 2L) -> 0L,
      ("c", 1L) -> 1L, ("a", 2L) -> 0L))
    // real sessions: banded result == the naive cross-filter join
    val sess = AnalyticsQueries.queries("events_sessionize")(spark, sf)
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end")).cache()
    val banded = RangeJoin.overlapCount(sess, Seq("user_id", "session_seq"),
      "session_start", "session_end", "user_id", 3600000L)
    val a = sess.select(col("user_id").as("au"), col("session_seq").as("as_"),
      unix_millis(col("session_start")).as("asm"), unix_millis(col("session_end")).as("aem"))
    val b = sess.select(col("user_id").as("bu"),
      unix_millis(col("session_start")).as("bsm"), unix_millis(col("session_end")).as("bem"))
    val naive = a.crossJoin(b)
      .filter(col("au") =!= col("bu") && col("asm") <= col("bem") && col("bsm") <= col("aem"))
      .groupBy(col("au").as("user_id"), col("as_").as("session_seq"))
      .agg(count(lit(1)).as("nn"))
    val joined = banded.join(naive, Seq("user_id", "session_seq"), "left_outer")
      .withColumn("nn0", coalesce(col("nn"), lit(0L)))
    assert(banded.count() === sess.count(), "every interval must surface")
    assert(joined.filter(col("n_overlap") =!= col("nn0")).count() === 0)
    sess.unpersist()
  }

  test("window boundary is inclusive at exactly W and exclusive one microsecond past") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val l = Seq((1L, 7L, t0)).toDF("event_id", "k", "lt")
    val r = Seq(
      (7L, new Timestamp(t0.getTime - W / 1000)), // exactly W before → counts
      (7L, new Timestamp(t0.getTime + W / 1000)), // exactly W after → counts
      (7L, new Timestamp(t0.getTime + W / 1000 + 1)) // 1 ms past → excluded
    ).toDF("k", "rt")
    val got = RangeJoin.countInWindow(l, r, Seq("k"), "lt", "rt", W).head()
    assert(got.getLong(got.fieldIndex("n_in_window")) === 2L)
  }

  test("stream_range_join: multi-batch replay equals the batch banded join; the bucketed " +
      "click index never exchanges") {
    import graft.streaming.{RangeJoinStream, TopicStream}
    import graft.sources.Tables
    val dir = "target/stream-scratch/range-split"
    Tables.load(spark, sf, "events").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (out, ckpt) = TopicStream.scratchDirs("spec_range_stream", dir)
    val got = RangeJoinStream.rangeCountStream(spark, dir, out, ckpt,
      maxFilesPerTrigger = Some(1))
    val plan = TopicStream.lastBatchPlan
    assert(plan.contains("graft_range_clicks"), s"bucketed click index scan missing:\n$plan")
    val cut = plan.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) plan.substring(0, cut) else plan
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex === 1, s"range probe must shuffle only the micro-batch (1 Exchange):\n$plan")
    val want = AnalyticsQueries.queries("events_range_join")(spark, sf)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    assert(got.filter(col("n_in_window") > 0).count() > 0)
    assert(got.filter(col("n_in_window") === 0).count() > 0,
      "fixture must exercise the zero-match carrier path")
  }

  test("duplicate left rows each keep their own count (id-keyed regroup, round-7 ADVICE)") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // two IDENTICAL left rows: the all-columns regroup collapsed them and
    // handed each copy the summed 2m count
    val l = Seq((7L, t0), (7L, t0)).toDF("k", "lt")
    val r = Seq((7L, t0), (7L, new Timestamp(t0.getTime + 1000))).toDF("k", "rt")
    val got = RangeJoin.countInWindow(l, r, Seq("k"), "lt", "rt", W)
      .select("n_in_window").as[Long].collect().toSeq
    assert(got === Seq(2L, 2L), s"each duplicate must count its own matches, got $got")
  }

  test("regroup/rejoin shuffles on the narrow left id, never the payload columns") {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val plan = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W,
        leftId = Some("event_id"))
      .queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
    assert(parts.exists(_.contains("event_id")),
      s"count aggregate must key on the unique id:\n$plan")
    assert(!parts.exists(_.contains("value#")),
      s"payload column leaked into a shuffle key (wide regroup is back):\n$plan")
  }

  test("BandedRangeJoinRule rewrites the naive |Δt|<=W theta join to the banded " +
      "equi-join; results match the oracle-gated banded operator") {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    def naive = p.join(c,
      p("user_id") === c("user_id") &&
        abs(unix_micros(p("ts")) - unix_micros(c("click_ts"))) <= W)
    // without the rule the band key is absent (per-key cross product)
    assert(!naive.queryExecution.executedPlan.toString.contains("__graft_band"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandedRangeJoinRule
    try {
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"), s"rule did not fire:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewritten join must stay hash-joinable:\n$plan")
      // lossless + duplicate-free: per-purchase match counts equal the
      // independently oracle-checked banded operator (inner join drops
      // zero-match purchases)
      val got = naive.groupBy(p("event_id")).count()
      val want = AnalyticsQueries.queries("events_range_join")(spark, sf)
        .filter(col("n_in_window") > 0)
        .select(col("event_id"), col("n_in_window").as("count"))
      assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
      assert(got.count() > 0)
      // a key-free pure range join also rewrites (the BNLJ case)
      val keyFree = p.limit(50).join(c.limit(50),
        abs(unix_micros(p("ts")) - unix_micros(c("click_ts"))) <= W)
      val kfPlan = keyFree.queryExecution.executedPlan.toString
      assert(kfPlan.contains("__graft_band") && !kfPlan.contains("BroadcastNestedLoopJoin"),
        s"key-free range join must band instead of nested-loop:\n$kfPlan")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.BandedRangeJoinRule)
  }

  test("banding is exact at extreme long magnitudes (integer floor-div, round-8 ADVICE)") {
    // x near 2^62 with a small window: the old double banding
    // floor(cast(x as double)/w) rounds the cast by up to 512 (2^62 has
    // 10 sub-ulp bits at double precision), so two values 3 apart could
    // land ≥2 bands apart and the in-window pair silently vanished. The
    // integer floor-div banding must find every pair, including across
    // zero (negative operands exercise the remainder<0 branch).
    import spark.implicits._
    val xs = Seq(
      (1L, (1L << 62) + 1000001L), (2L, (1L << 62) + 1000004L), // Δ=3, huge magnitude
      (3L, -5L), (4L, 2L), // Δ=7 across zero
      (5L, Long.MaxValue - 2), (6L, Long.MaxValue - 9)) // Δ=7 at the top
    val df = xs.toDF("id", "x")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandedRangeJoinRule
    try {
      val l = df.select($"id".as("lid"), $"x".as("lx"))
      val r = df.select($"id".as("rid"), $"x".as("rx"))
      val pairs = l.join(r, abs($"lx" - $"rx") <= 10L && $"lid" < $"rid")
      assert(pairs.queryExecution.executedPlan.toString.contains("__graft_band"))
      assert(pairs.select("lid", "rid").collect().map(row => (row.getLong(0), row.getLong(1)))
        .toSet === Set((1L, 2L), (3L, 4L), (5L, 6L)))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.BandedRangeJoinRule)
  }

  test("plan shape: equi-join on (key, band) — no nested-loop, no cartesian") {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val plan = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("__band"), s"band key missing from the join:\n$plan")
  }

  test("salted variant equals the plain banded plan row-for-row (every " +
      "candidate pair meets in exactly one salt bucket) and its join keys " +
      "carry the salt") {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val plain = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id")).select("event_id", "n_in_window")
    val salted = RangeJoin.countInWindowSalted(p, c, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id"), saltBuckets = 8).select("event_id", "n_in_window")
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
    assert(salted.filter(col("n_in_window") > 0).count() > 0, "fixture must exercise matches")
    // the physical join must key on the salt — that IS the skew split
    val joined = salted.queryExecution.executedPlan.toString
    assert(joined.contains("__salt"), "salted plan lost its salt key")
    // the DERIVED salt count (default) is another S — counts stay equal
    val derived = RangeJoin.countInWindowSalted(p, c, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id")).select("event_id", "n_in_window")
    assert(derived.exceptAll(plain).count() === 0 && plain.exceptAll(derived).count() === 0)
  }

  test("sizedSaltBuckets: one doubling per data decade from the measured " +
      "sf0.1 knee (20k index rows -> 8), clamped to [2, 64]") {
    assert(RangeJoin.sizedSaltBuckets(0L) === 2)
    assert(RangeJoin.sizedSaltBuckets(1250L) === 2)
    assert(RangeJoin.sizedSaltBuckets(1251L) === 4)
    assert(RangeJoin.sizedSaltBuckets(12500L) === 4)
    assert(RangeJoin.sizedSaltBuckets(20000L) === 8)
    assert(RangeJoin.sizedSaltBuckets(125000L) === 8)
    assert(RangeJoin.sizedSaltBuckets(1000000L) === 16)
    assert(RangeJoin.sizedSaltBuckets(Long.MaxValue) === 64)
  }
}
