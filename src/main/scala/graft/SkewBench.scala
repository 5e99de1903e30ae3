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

    // banded range join under a genuinely hot PARTITION: the join key is
    // (user_id, band), so a user hot ACROSS time is already spread over
    // many band partitions — the banded rewrite de-skews that case by
    // construction. The adversarial fixture is a flash burst: 10% of
    // both sides remapped to one user AND compressed into one 30-minute
    // window, landing the whole hot mass in one (key, band) bucket.
    // ONE-sided skew: 10% of clicks burst onto one (user, 30-min window)
    // — the build side of that (key, band) partition is hot — while only
    // 1% of purchases probe it (probe side normal). Spark's skew split
    // replicates the normal side against the split hot side, so it only
    // fires on one-sided skew; a both-sides-hot partition is skipped by
    // OptimizeSkewedJoin (verified here: with 10% on both sides the rule
    // never fires) and is the case for salting/band-refinement instead.
    val (p0, c0) = graft.queries.AnalyticsQueries.asofSides(spark, dir)
    val burst = "TIMESTAMP'1995-06-01 12:00:00'"
    def burstTs(idCol: String) =
      expr(s"timestampadd(SECOND, CAST(pmod($idCol, 1800) AS INT), $burst)")
    // repartition(32) BEFORE the checkpoint: skew split divides a hot
    // reduce partition at MAPPER boundaries, so a single-partition toy
    // input (one map task) makes every partition indivisible and the
    // rule reports 0 splittable skews — real inputs have thousands of
    // mappers, so map-side parallelism is part of the emulation
    val p = p0.withColumn("user_id",
      when(pmod(col("event_id"), lit(100)) === 0, lit(-1L)).otherwise(col("user_id")))
      .withColumn("ts",
        when(col("user_id") === -1L, burstTs("event_id")).otherwise(col("ts")))
      .repartition(32)
      .localCheckpoint(true)
    val c = c0.withColumn("user_id",
      when(pmod(col("click_id"), lit(2)) === 0, lit(-1L)).otherwise(col("user_id")))
      .withColumn("click_ts",
        when(col("user_id") === -1L, burstTs("click_id")).otherwise(col("click_ts")))
      .repartition(32)
      .localCheckpoint(true)
    val W = 3600000000L // 1h in µs
    // Emulate the 100-TB join shape at test scale: the production banded
    // join is fact-fact (both sides too big to broadcast) and AQE's skew
    // thresholds are sized for 100+ MB partitions — at sf0.1 the hot
    // partition is ~100 KB and the split would never trigger. Forcing
    // sort-merge and scaling the thresholds to the test data keeps the
    // MECHANISM measurable: split fired?, result unchanged, wall delta.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024")
    if (sys.env.contains("SKEW_DEBUG"))
      System.err.println("DEBUG confs: " + Seq(
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .map(k => s"$k=${spark.conf.get(k)}").mkString(", "))
    // the banded join feeds a per-id aggregate, so splitting the skewed
    // partition inserts an extra shuffle — AQE declines that trade unless
    // forced; at real scale the skewed partition dwarfs the extra
    // exchange and the force flag is the documented deployment setting
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    if (sys.env.contains("SKEW_DEBUG")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive", org.apache.logging.log4j.Level.DEBUG)
      System.err.println(s"DEBUG hot clicks: ${c.filter(col("user_id") === -1L).count()} / ${c.count()}")
      System.err.println("DEBUG hot bands: " + c.filter(col("user_id") === -1L)
        .select(expr("unix_micros(click_ts) div 3600000000").as("b"))
        .groupBy("b").count().collect().mkString(", "))
    }
    def banded = RangeJoin.countInWindow(p, c, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id"))
    val skewOn = minOf(reps)(run(banded))
    val skewPlan = {
      val df = banded
      // collect() runs THIS Dataset's own queryExecution (a write or
      // foreachPartition executes a clone/wrapper and leaves df's AQE
      // plan isFinalPlan=false); result is one row per purchase — small
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val aqeSplit = skewPlan.contains("skew=true")
    val smj = skewPlan.contains("SortMergeJoin")
    if (sys.env.contains("SKEW_DEBUG")) {
      System.err.println("PLAN>>>\n" + skewPlan)
      val df = banded
      df.collect()
      val inner = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.finalPhysicalPlan
        case other => other
      }
      def allStages(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec] =
        p.collect {
          case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
            s +: allStages(s.plan)
        }.flatten
      val stages = allStages(inner)
      System.err.println(s"DEBUG found ${stages.length} shuffle stages in ${inner.getClass.getSimpleName}")
      stages.foreach { s =>
        s.mapStats match {
          case Some(ms) =>
            val sz = ms.bytesByPartitionId
            System.err.println(s"DEBUG stage ${s.id} shuffle ${ms.shuffleId}: " +
              s"n=${sz.length} max=${sz.max} median=${sz.sorted.apply(sz.length / 2)} sum=${sz.sum}")
          case None => System.err.println(s"DEBUG stage ${s.id}: no mapStats")
        }
      }
    }
    val sumOn = banded.agg(sum("n_in_window")).collect()(0).getLong(0)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val skewOff = minOf(reps)(run(banded))
    val sumOff = banded.agg(sum("n_in_window")).collect()(0).getLong(0)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // TWO-SIDED flash burst (round-10 VERDICT #5): 10% of BOTH sides on
    // one key AND one window — the partition hot on both sides that
    // OptimizeSkewedJoin skips entirely (one-sided only, §5). The salted
    // variant is the mitigation: per-bucket candidate mass drops ~S×
    // while counts stay identical.
    val p2 = p0.withColumn("user_id",
      when(pmod(col("event_id"), lit(10)) === 0, lit(-1L)).otherwise(col("user_id")))
      .withColumn("ts",
        when(col("user_id") === -1L, burstTs("event_id")).otherwise(col("ts")))
      .repartition(32)
      .localCheckpoint(true)
    val c2 = c0.withColumn("user_id",
      when(pmod(col("click_id"), lit(10)) === 0, lit(-1L)).otherwise(col("user_id")))
      .withColumn("click_ts",
        when(col("user_id") === -1L, burstTs("click_id")).otherwise(col("click_ts")))
      .repartition(32)
      .localCheckpoint(true)
    def plain2 = RangeJoin.countInWindow(p2, c2, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id"))
    // S now derives from the replicated side (sizedSaltBuckets) — the
    // measured mass curve below shows where the derived value lands
    val saltDerived = RangeJoin.sizedSaltBuckets(c2.count())
    def salted2 = RangeJoin.countInWindowSalted(p2, c2, Seq("user_id"), "ts", "click_ts", W,
      leftId = Some("event_id"))
    val twoPlainSec = minOf(reps)(run(plain2))
    val twoSaltedSec = minOf(reps)(run(salted2))
    val twoFired = {
      val df = plain2
      df.collect()
      df.queryExecution.executedPlan.toString.contains("skew=true")
    }
    val sumP2 = plain2.agg(sum("n_in_window")).collect()(0).getLong(0)
    val sumS2 = salted2.agg(sum("n_in_window")).collect()(0).getLong(0)
    // the straggler, measured as in-bucket candidate mass (what one task
    // pays at scale): max over join buckets of |probe rows|·|index rows|,
    // plain (key, band) vs salted (key, band, salt) — same band formula
    // as the operator (floorDiv in exact long arithmetic)
    def bandCol(t: String) = {
      val x = unix_micros(col(t))
      val q = call_function("div", x, lit(W))
      when(x % W < 0, q - 1).otherwise(q)
    }
    def probes2At(salts: Int) = p2.select(col("user_id"), col("ts"))
      .withColumn("__band", explode(array(bandCol("ts") - 1, bandCol("ts"), bandCol("ts") + 1)))
      .withColumn("__salt", pmod(hash(col("user_id"), col("ts")), lit(salts)))
    val index2 = c2.select(col("user_id"), bandCol("click_ts").as("__band"))
    // each salted bucket sees np/S probe rows against a FULL index copy
    // (the index replicates across salts), so per-bucket mass is np·ni
    // grouped by the bucket key of each plan
    def maxBucket(salts: Int, keys: Seq[String]): Long = {
      val pc = probes2At(salts).groupBy(keys.map(col): _*).agg(count(lit(1)).as("np"))
      val ic = index2.groupBy(col("user_id"), col("__band")).agg(count(lit(1)).as("ni"))
      pc.join(ic, Seq("user_id", "__band"))
        .agg(max(col("np") * col("ni"))).collect()(0).getLong(0)
    }
    val plainMaxBucket = maxBucket(8, Seq("user_id", "__band"))
    val saltedMaxBucket = maxBucket(saltDerived, Seq("user_id", "__band", "__salt"))
    // the knee curve: per-bucket mass by salt count — where the derived
    // S lands relative to diminishing returns goes to SURVEY §5 verbatim
    val massBySalt = Seq(2, 4, 8, 16, 32).map { sc =>
      sc -> maxBucket(sc, Seq("user_id", "__band", "__salt"))
    }

    def s3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(
      s"""{"dir":"$dir","hot_share":${s3(hotShare)},"reps":$reps,""" +
      s""""compact_sec":${s3(plain)},"compact_salted_sec":${s3(salted)},""" +
      s""""banded_join_skewsplit_sec":${s3(skewOn)},"banded_join_noskewsplit_sec":${s3(skewOff)},""" +
      s""""aqe_skew_split_fired":$aqeSplit,"smj":$smj,"results_equal":${sumOn == sumOff},""" +
      s""""twosided_plain_sec":${s3(twoPlainSec)},"twosided_salted_sec":${s3(twoSaltedSec)},""" +
      s""""twosided_aqe_fired":$twoFired,"twosided_equal":${sumP2 == sumS2},""" +
      s""""twosided_max_bucket_plain":$plainMaxBucket,"twosided_max_bucket_salted":$saltedMaxBucket,""" +
      s""""salt_derived":$saltDerived,"mass_by_salt":{""" +
      massBySalt.map { case (sc, m) => s""""$sc":$m""" }.mkString(",") + "}}")
    spark.stop()
  }
}
