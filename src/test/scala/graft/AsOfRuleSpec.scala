package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.plans.AsOfJoinRule
import graft.queries.AnalyticsQueries

/** AsOfJoinRule: the naive "latest prior row" aggregate-over-theta-join
  * rewrites to the union + window as-of plan (round-9 VERDICT #8).
  * Ground truth for every rewrite test is the SAME query with the rule
  * off — Spark's own theta-join semantics — so null/tie edges are pinned
  * against the engine, and the events fixture additionally ties the
  * rewritten plan to the oracle-gated AsOf.joinAsOf results.
  */
class AsOfRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AsOfJoinRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AsOfJoinRule)
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  /** clicks deduplicated to unique (user_id, click_ts) so max_by is
    * deterministic in BOTH plans (ties are nondeterministic in both —
    * that is the operator contract, not a rewrite artifact).
    */
  private def sides = {
    val (p, c) = AnalyticsQueries.asofSides(spark, sf)
    val c2 = c.groupBy(col("user_id"), col("click_ts"))
      .agg(max(col("click_id")).as("click_id"), max(col("click_value")).as("click_value"))
    (p, c2)
  }

  private def naive(p: DataFrame, c2: DataFrame) =
    p.join(c2, p("user_id") === c2("user_id") && c2("click_ts") <= p("ts"))
      .groupBy(p("event_id"), p("user_id"), p("ts"))
      .agg(max(c2("click_ts")).as("latest_click"),
        max_by(c2("click_id"), c2("click_ts")).as("click_id"))

  test("rewrite fires on the events fixture, drops the join for one window, " +
      "and matches both the rule-off plan and the oracle-gated as-of operator") {
    val (p, c2) = sides
    val want = naive(p, c2).collect()
    val (got, plan) = withRule {
      val df = naive(p, c2)
      (df.collect(), df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("Window"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Join"), s"join survived the rewrite:\n$plan")
    assert(got.toSet === want.toSet)
    assert(got.nonEmpty)
    // the same matches AsOf.joinAsOf computes (events_asof's oracle-gated
    // plan, restricted to matched rows = the inner join's groups)
    val asof = AsOf.joinAsOf(p, c2, key = Seq("user_id"),
        leftTime = "ts", rightTime = "click_ts")
      .filter(col("click_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_ts").as("latest_click"), col("click_id"))
    withRule(assertSame(naive(p, c2), asof))
  }

  test("null keys, null times, equal-time ties and the strict < variant " +
      "all match the rule-off theta join") {
    import spark.implicits._
    val l = Seq(
      (1L, Option("k"), Option(10L)), (2L, Option("k"), Option(20L)),
      (3L, Option("k"), Option.empty[Long]), (4L, Option.empty[String], Option(10L)),
      (5L, Option("x"), Option(30L)))
      .toDF("id", "k", "t")
    val r = Seq(
      (Option("k"), Option(10L), 100L), (Option("k"), Option(15L), 101L),
      (Option("k"), Option.empty[Long], 102L), (Option.empty[String], Option(5L), 103L))
      .toDF("k", "rt", "rv")
    def q(strict: Boolean) = {
      val cond = if (strict) l("k") === r("k") && r("rt") < l("t")
        else l("k") === r("k") && r("rt") <= l("t")
      l.join(r, cond).groupBy(l("id"), l("k"))
        .agg(max(r("rt")).as("mrt"), max_by(r("rv"), r("rt")).as("mrv"))
    }
    for (strict <- Seq(false, true)) {
      val want = q(strict).collect().toSet
      val (got, plan) = withRule {
        val df = q(strict)
        (df.collect().toSet, df.queryExecution.optimizedPlan.toString)
      }
      assert(plan.contains("Window") && !plan.contains("Join"),
        s"strict=$strict rule did not fire:\n$plan")
      assert(got === want, s"strict=$strict")
    }
    // pinned semantics: <= admits the simultaneous right row, < excludes
    // it; null-time/null-key rows on either side and the matchless "x"
    // key are all dropped, exactly as the inner theta join drops them
    val le = withRule(q(strict = false).collect())
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(le === Map(1L -> (10L, 100L), 2L -> (15L, 101L)))
    val lt = withRule(q(strict = true).collect())
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(lt === Map(2L -> (15L, 101L)))
  }

  test("non-rewritable shapes keep their join: count/sum aggregates, outer " +
      "joins, a second cross-side inequality; and the rewrite is idempotent") {
    val (p, c2) = sides
    withRule {
      val counted = p.join(c2, p("user_id") === c2("user_id") && c2("click_ts") <= p("ts"))
        .groupBy(p("event_id")).agg(max(c2("click_ts")), count(lit(1)))
      assert(counted.queryExecution.optimizedPlan.toString.contains("Join"))
      val summed = p.join(c2, p("user_id") === c2("user_id") && c2("click_ts") <= p("ts"))
        .groupBy(p("event_id")).agg(sum(c2("click_value")))
      assert(summed.queryExecution.optimizedPlan.toString.contains("Join"))
      val outer = p.join(c2, p("user_id") === c2("user_id") && c2("click_ts") <= p("ts"),
          "left_outer")
        .groupBy(p("event_id")).agg(max(c2("click_ts")))
      assert(outer.queryExecution.optimizedPlan.toString.contains("Join"))
      val twoIneq = p.join(c2, p("user_id") === c2("user_id") &&
          c2("click_ts") <= p("ts") && c2("click_value") <= p("value"))
        .groupBy(p("event_id")).agg(max(c2("click_ts")))
      assert(twoIneq.queryExecution.optimizedPlan.toString.contains("Join"))
      val opt = naive(p, c2).queryExecution.optimizedPlan
      assert(AsOfJoinRule(opt).fastEquals(opt), "rewrite must be idempotent")
    }
  }
}
