package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, TopicOps}
import graft.sources.Topics

/** Hot-key stress for compaction and the banded range join (round-9
  * VERDICT #6): remaps 10% of the events topic onto ONE key and measures
  * the plain vs salted compaction aggregates and the banded join with
  * AQE skew handling, printing one JSON line for SURVEY §5's skew table.
  *
  * The interesting (and honest) expectation: compact's `max_by` is a
  * declarative aggregate with map-side partial combine, so a hot KEY
  * collapses to one row per map task before the shuffle and the salted
  * two-phase variant buys nothing — salting pays only when partial
  * aggregation cannot combine (collect-style payloads). The banded join
  * is different: candidates multiply per hot (key, band) bucket, which
  * is where AQE's skew split earns its keep. Whatever the numbers say
  * goes in SURVEY verbatim. Dev tool, not part of the engine surface.
  *
  * Usage: runMain graft.SkewBench <sfDir> [reps]
  */
object SkewBench {

  private def minOf(reps: Int)(f: => Unit): Double =
    (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one key takes ~10% of the whole topic (every 10th record)
    val topic = Topics.events(spark, dir)
      .withColumn("key",
        when(pmod(col("offset"), lit(10)) === 0, lit("hot")).otherwise(col("key")))
      .localCheckpoint(true)
    val hotShare = topic.filter(col("key") === "hot").count().toDouble / topic.count()

    def run(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    val plain = minOf(reps)(run(TopicOps.compact(topic)))
    val salted = minOf(reps)(run(TopicOps.compactSalted(topic)))

    // banded range join under the same hot key: purchases×clicks with
    // user_id remapped so the hot user holds 10% of both sides
    val (p0, c0) = graft.queries.AnalyticsQueries.asofSides(spark, dir)
    val p = p0.withColumn("user_id",
      when(pmod(col("event_id"), lit(10)) === 0, lit(-1L)).otherwise(col("user_id")))
      .localCheckpoint(true)
    val c = c0.withColumn("user_id",
      when(pmod(col("click_id"), lit(10)) === 0, lit(-1L)).otherwise(col("user_id")))
      .localCheckpoint(true)
    val W = 3600000000L // 1h in µs
    def banded = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id"))
    val skewOn = minOf(reps)(run(banded))
    val skewPlan = {
      val df = banded
      run(df) // AQE finalizes the plan only after execution
      df.queryExecution.executedPlan.toString
    }
    val aqeSplit = skewPlan.contains("skew=true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val skewOff = minOf(reps)(run(banded))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def s3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(
      s"""{"dir":"$dir","hot_share":${s3(hotShare)},"reps":$reps,""" +
      s""""compact_sec":${s3(plain)},"compact_salted_sec":${s3(salted)},""" +
      s""""banded_join_skewsplit_sec":${s3(skewOn)},"banded_join_noskewsplit_sec":${s3(skewOff)},""" +
      s""""aqe_skew_split_fired":$aqeSplit}""")
    spark.stop()
  }
}
