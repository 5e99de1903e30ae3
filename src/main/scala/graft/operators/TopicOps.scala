package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Topics

/** The reference's record-routing operators (merge-all / purge-all / ask /
  * print / DLQ), re-expressed as declarative DataFrame combinators.
  *
  * Design notes for 100 TB:
  *   - Every producer-side operator ("what records get written where") is a
  *     single-pass narrow projection: one parquet/Kafka scan, zero shuffle.
  *     A record that fans out to several produced records (merge = copy to
  *     destination + tombstone to source, reference MergeAll.kt:34) is
  *     expressed as explode(array(...)) so Catalyst plans ONE scan instead
  *     of a union of two scans over the same source.
  *   - Compaction is the only shuffling operator: one aggregate keyed
  *     (topic, partition, key) with map-side partial aggregation
  *     (max_by(struct, offset) — sort-based since the buffer is a struct),
  *     not a row_number window (which would sort entire shuffle
  *     partitions). AQE handles hot keys. Asserted in PlanSpec.
  *
  * Produced-record schema: (topic, partition, key, value, src_offset, kind)
  * where kind ∈ {merge, purge}. Offsets are assigned by the log on write,
  * so produced records carry provenance (src_offset) instead.
  */
object TopicOps {

  import Topics.isTombstone

  /** merge-all (reference commands/MergeAll.kt:34): every live source record
    * is produced to `dest` and tombstoned in its source topic+partition.
    * Tombstones are skipped unless `mergeTombstones` (MergeAll.kt:40), and
    * are never re-purged (Pipeline.kt:95).
    */
  def mergeAll(src: DataFrame, dest: String, mergeTombstones: Boolean = false): DataFrame =
    produced(src,
      mergeRow = when(!isTombstone(col("value")) || lit(mergeTombstones),
        producedRecord(lit(dest), col("value"), "merge")),
      purgeRow = when(!isTombstone(col("value")), tombstone))

  /** purge-all (reference commands/PurgeAll.kt:24): a tombstone for every
    * live record, written back to the record's own topic+partition.
    */
  def purgeAll(src: DataFrame): DataFrame =
    produced(src,
      mergeRow = when(lit(false), tombstone),
      purgeRow = when(!isTombstone(col("value")), tombstone))

  /** ask (reference commands/Ask.kt:44): per-record 3-way routing. The
    * reference's interactive ActionSource becomes a deterministic `action`
    * Column evaluating to 'merge' | 'purge' | 'skip' — at scale the decision
    * is a rule, not a human. Tombstones skip the decision entirely unless
    * `mergeTombstones` (Ask.kt:47).
    */
  def route(src: DataFrame, action: Column, dest: String,
            mergeTombstones: Boolean = false): DataFrame = {
    val live = !isTombstone(col("value")) || lit(mergeTombstones)
    produced(src,
      mergeRow = when(live && action === "merge",
        producedRecord(lit(dest), col("value"), "merge")),
      purgeRow = when(!isTombstone(col("value")) && (action === "merge" || action === "purge"),
        tombstone))
  }

  /** ask with an EXTERNAL action source (ActionSource.kt:9 — per-record
    * decisions produced elsewhere): decisions arrive as a table keyed
    * (topic, partition, offset) with an `action` column evaluating to
    * 'merge' | 'purge' | 'skip'. Records without a decision row are
    * skipped (an ActionSource that yields nothing routes nothing).
    * The decision table is broadcast by default (human/service verdicts
    * are small); pass broadcastDecisions=false to let Catalyst plan a
    * shuffle join when decisions are fact-sized.
    */
  def routeWithDecisions(src: DataFrame, decisions: DataFrame, dest: String,
                         mergeTombstones: Boolean = false,
                         broadcastDecisions: Boolean = true): DataFrame = {
    // the reference's ActionSource yields exactly ONE decision per record;
    // an amended/duplicated decision row must not fan the record out into
    // two produced sets, so conflicting rows resolve deterministically to
    // the strongest action (merge < purge < skip, conveniently alphabetical)
    val oneDecision = decisions
      .groupBy(col("topic"), col("partition"), col("offset"))
      .agg(min(col("action")).as("action"))
    val d = if (broadcastDecisions) broadcast(oneDecision) else oneDecision
    // spreadScan on the record side BEFORE the broadcast join (r17): the
    // decision probe + produce explosion is per-record map work that a
    // one-split scan would serialize. ONLY in the broadcast form — the
    // co-bucketed form's whole point is the zero-exchange bucket join,
    // which a repartition would destroy (BucketingSpec pins it).
    val srcSide =
      if (broadcastDecisions) graft.sources.Tables.spreadScan(src, "offset") else src
    val withAction = srcSide.join(d, Seq("topic", "partition", "offset"), "left")
    route(withAction, coalesce(col("action"), lit("skip")), dest, mergeTombstones)
  }

  /** Materializes a topic frame and its decisions log as co-bucketed
    * tables on the FULL ask join key (topic, partition, offset) — the
    * one-time layout cost that makes every subsequent
    * [[routeWithDecisionsCobucketed]] run shuffle-free.
    */
  def writeAskTables(src: DataFrame, decisions: DataFrame,
                     srcTable: String, decisionsTable: String,
                     numBuckets: Int = 8): Unit = {
    graft.sources.Bucketing.writeBucketed(src, srcTable, numBuckets,
      "topic", "partition", "offset")
    graft.sources.Bucketing.writeBucketed(decisions, decisionsTable, numBuckets,
      "topic", "partition", "offset")
  }

  /** Co-bucketed ask — the 100-TB form of [[routeWithDecisions]] for a
    * FACT-scale decisions side (a full decisions log as big as the topic,
    * where the default broadcast is impossible). Both tables live
    * bucketed+sorted by the complete join key (topic, partition, offset)
    * via [[writeAskTables]], so the decision-dedup aggregate rides the
    * bucket partitioning and the record⋈decision join plans with ZERO
    * Exchange on either side (proof in BucketingSpec) — the dominant
    * repeated per-run shuffle becomes a one-time layout cost.
    */
  def routeWithDecisionsCobucketed(spark: SparkSession, srcTable: String,
                                   decisionsTable: String, dest: String,
                                   mergeTombstones: Boolean = false): DataFrame =
    routeWithDecisions(spark.table(srcTable), spark.table(decisionsTable), dest,
      mergeTombstones, broadcastDecisions = false)

  /** The reference's end-of-run counters (Ask.kt:85: "N merged, N purged,
    * N skipped") as an aggregate over the same action rule.
    */
  def routeStats(src: DataFrame, action: Column): DataFrame =
    src.filter(!isTombstone(col("value")))
      .groupBy(action.as("action")).agg(count(lit(1)).as("records"))

  /** Log-compaction read view (the query semantics the reference's tombstone
    * contract exists for, Pipeline.kt:93): latest record per key wins; a
    * latest-record tombstone deletes the key.
    */
  def compact(src: DataFrame): DataFrame =
    src.groupBy(col("topic"), col("partition"), col("key"))
      .agg(max(col("offset")).as("offset"),
        max_by(struct(col("value"), col("ts")), col("offset")).as("latest"))
      .select(col("topic"), col("partition"), col("key"), col("offset"),
        col("latest.value").as("value"), col("latest.ts").as("ts"))
      .filter(!isTombstone(col("value")))

  /** Replays a compaction changelog
    * ([[graft.streaming.TopicStream.compactUpdates]]) to its final state:
    * per key the LAST emitted update wins and `live = false` deletes the
    * key — exactly how a downstream consumer of the upsert/delete feed
    * materializes its table. Emit offsets strictly advance per key (the
    * changelog only fires when the latest offset moves forward), so
    * max-offset-per-key selects the last update without needing batch
    * ordering; the result is schema-identical to [[compact]] and is gated
    * against the same DuckDB oracle.
    *
    * Scale shape: one hash aggregate on the key — the same map-side
    * combinable `max_by` plan as [[compact]], no window sort; at 100 TB
    * the changelog is far smaller than the log it summarizes (one row per
    * key-advance, not per record).
    */
  def reconcileChangelog(changelog: DataFrame): DataFrame =
    changelog.groupBy(col("topic"), col("partition"), col("key"))
      .agg(max_by(struct(col("value"), col("ts"), col("live")), col("offset")).as("last"),
        max(col("offset")).as("offset"))
      .filter(col("last.live"))
      .select(col("topic"), col("partition"), col("key"), col("offset"),
        col("last.value").as("value"), col("last.ts").as("ts"))

  /** Bounded-depth retention: keep the newest `n` records per
    * (topic, partition, key) — the "compact with history" read view
    * between the reference's full log (print, Pipeline.kt:83) and
    * [[compact]]'s latest-only view. Tombstones are retained as records:
    * a delete marker must outlive the older versions it shadows, exactly
    * as Kafka's compactor keeps the marker until the shadowed segments
    * are gone. `version` is 1 for the newest record.
    *
    * Scale shape: the `row_number <= n` filter triggers Spark's
    * InferWindowGroupLimit rewrite, which inserts a PARTIAL
    * WindowGroupLimit below the exchange — each map task prunes to `n`
    * rows per key before shuffling, so shuffle volume is bounded by
    * keys×n, not by records (plan-asserted in TopicOpsSpec). That is why
    * this window is acceptable where [[compact]] deliberately avoids one:
    * the group limit never sorts whole shuffle partitions.
    */
  def retain(src: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, s"retain: depth must be >= 1, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("topic"), col("partition"), col("key"))
      .orderBy(col("offset").desc)
    src.withColumn("version", row_number().over(w))
      .filter(col("version") <= n)
      .select(col("topic"), col("partition"), col("key"), col("offset"),
        col("value"), col("ts"), col("version"))
  }

  /** Type-2 slowly-changing-dimension HISTORY of the record log — the
    * time-travel view between the full log (print) and [[compact]]'s
    * latest-only state: every non-tombstone record becomes a version row
    * with a validity interval [valid_from, valid_to), closed by the key's
    * NEXT record of any kind. A tombstone emits no row of its own but
    * closes the version it deletes — so a purged key's history survives
    * with every interval closed (`is_current = false` throughout), which
    * is exactly what the reference's merge-purge tombstones mean for a
    * warehouse consumer (Pipeline.kt:93). `seq` numbers ALL records of
    * the key (tombstones included), so version ids are stable under
    * later purges.
    *
    * Scale shape: ONE exchange on (topic, partition, key); both the
    * `lead` bounds and `seq` ride the SAME window frame — one sort, one
    * Window operator (plan-asserted in TopicOpsSpec). Per-key state is
    * the key's own history length; there is no cross-key ordering
    * anywhere, so hot partitions split freely.
    */
  def scd2(src: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("topic"), col("partition"), col("key"))
      .orderBy(col("offset"))
    src
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .withColumn("valid_to_offset", lead(col("offset"), 1).over(w))
      .withColumn("seq", row_number().over(w))
      .filter(!isTombstone(col("value")))
      .select(col("topic"), col("partition"), col("key"), col("value"),
        col("seq"), col("offset").as("valid_from_offset"), col("valid_to_offset"),
        col("ts").as("valid_from_ts"), col("valid_to_ts"),
        col("valid_to_offset").isNull.as("is_current"))
  }

  /** Skew-hardened compaction: when a handful of keys dominate (the
    * log-compaction hot-key case AQE's skew handling doesn't cover —
    * aggregation, not join), salt the first aggregate so a hot key spreads
    * over `saltBuckets` reducers, then reduce the per-salt winners.
    * max_by is associative, so the two-phase result is identical to
    * [[compact]] (asserted in TopicOpsSpec).
    */
  def compactSalted(src: DataFrame, saltBuckets: Int = 16): DataFrame =
    src.withColumn("salt", pmod(col("offset"), lit(saltBuckets)))
      .groupBy(col("topic"), col("partition"), col("key"), col("salt"))
      .agg(max(col("offset")).as("offset"),
        max_by(struct(col("value"), col("ts")), col("offset")).as("latest"))
      .groupBy(col("topic"), col("partition"), col("key"))
      .agg(max(col("offset")).as("offset"),
        max_by(col("latest"), col("offset")).as("latest"))
      .select(col("topic"), col("partition"), col("key"), col("offset"),
        col("latest.value").as("value"), col("latest.ts").as("ts"))
      .filter(!isTombstone(col("value")))

  /** Decode-failure / validation routing — the DLQ workflow the reference is
    * built for (README overview; decode failure in MixedValue.kt:30 aborts
    * the reference pipeline, here it routes). `error` evaluates to a reason
    * string or null for valid records; tombstones are pass-through valid.
    */
  def dlqSplit(src: DataFrame, error: Column): DataFrame =
    dlqSplit(src, error, lit(null).cast("string"))

  /** DLQ routing with a key-side decode check (Serdes.KeySerde.error):
    * unlike value errors, a key error applies to tombstones too — the
    * key must decode for every record (routing and compaction are keyed),
    * while a null VALUE is a legitimate tombstone. Key errors win when
    * both sides are corrupt (the reference fails on the key first:
    * ConsumerRecord deserializes key before value).
    */
  def dlqSplit(src: DataFrame, error: Column, keyError: Column): DataFrame =
    src.withColumn("error",
      coalesce(keyError,
        when(isTombstone(col("value")), lit(null).cast("string")).otherwise(error)))
      .withColumn("sink", when(col("error").isNotNull, lit("dlq")).otherwise(lit("clean")))

  /** The reference's DEFAULT decode contract: a deserialization failure
    * ABORTS the whole pipeline (MixedValue.kt:30's exception propagates
    * out of the poll loop) — [[dlqSplit]] is the routing alternative.
    * assert_true evaluates per row inside the filter, so the job fails
    * fast on the first bad record of any partition.
    */
  def strictDecode(src: DataFrame, error: Column): DataFrame =
    strictDecode(src, error, lit(null).cast("string"))

  /** Strict decode with the key-side check: a corrupt key aborts even on
    * a tombstone (same precedence as [[dlqSplit]]).
    */
  def strictDecode(src: DataFrame, error: Column, keyError: Column): DataFrame =
    src.filter(assert_true(
      keyError.isNull && (isTombstone(col("value")) || error.isNull),
      concat(lit("decode failure at offset "), col("offset"), lit(": "),
        coalesce(keyError, error))).isNull)

  /** MixedValue dual view (MixedValue.kt:13): raw untouched bytes + decoded
    * fields side by side. `decoded` maps the value column to decoded cols.
    */
  def serdeView(src: DataFrame, decoded: Map[String, Column]): DataFrame =
    decoded.foldLeft(src) { case (df, (name, c)) => df.withColumn(name, c) }

  /** Per-batch offset bookkeeping (Pipeline.kt:44: highest polled offset per
    * TopicPartition is what gets committed).
    */
  def committedOffsets(src: DataFrame, group: String): DataFrame =
    src.groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("committed_offset"), count(lit(1)).as("records"))
      .withColumn("group", lit(group))

  /** Consumer-lag card — THE Kafka operational metric, against the
    * decisions log as the consumer: per (topic, partition), the log-end
    * offset, the last decided offset, and how many records sit beyond
    * it awaiting a decision (a partition with no decisions at all lags
    * by its full record count).
    *
    * Scale shape: the per-partition decision maxima are a
    * partition-count-sized dim and BROADCAST; ONE aggregate pass over
    * the log computes end offset, record count and the conditional lag
    * count together (map-side partial combine — never two scans).
    */
  def lag(src: DataFrame, decisions: DataFrame): DataFrame = {
    val dec = decisions.groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("last_decided_offset"))
    src.join(broadcast(dec), Seq("topic", "partition"), "left_outer")
      .groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("log_end_offset"),
        count(lit(1)).as("records"),
        max(col("last_decided_offset")).as("last_decided_offset"),
        count(when(col("offset") >
          coalesce(col("last_decided_offset"), lit(-1L)), 1)).as("lag_records"))
  }

  /** Topic scan statistics (Print.kt counters generalized). */
  def stats(src: DataFrame): DataFrame =
    src.groupBy(col("topic"), col("partition")).agg(
      count(lit(1)).as("records"),
      count(when(isTombstone(col("value")), 1)).as("tombstones"),
      min(col("offset")).as("min_offset"),
      max(col("offset")).as("max_offset"),
      countDistinct(col("key")).as("distinct_keys"))

  // ---- internals ------------------------------------------------------

  private def tombstone: Column =
    producedRecord(col("topic"), lit(null).cast("string"), "purge")

  /** Note on `partition`: the reference's merge-produce omits the
    * destination partition (MergeAll.kt:41 — Kafka assigns by key at
    * write); purge-produce pins the SOURCE partition (Pipeline.kt:97).
    * Produced records here carry the source partition as provenance for
    * both kinds; a Kafka sink partitions by key, matching the reference.
    *
    * Headers: merge copies round-trip the consumed record's headers
    * untouched (Kafka DLQ convention; the reference's consume side is
    * headers-aware, MixedValue.kt:41); purge tombstones are bare records
    * with no headers, exactly the ProducerRecord(topic, partition, key,
    * null) of Pipeline.kt:97.
    */
  private def producedRecord(destTopic: Column, value: Column, kind: String): Column =
    struct(
      destTopic.as("topic"), col("partition").as("partition"),
      col("key").as("key"), value.as("value"),
      col("offset").as("src_offset"), lit(kind).as("kind"),
      (if (kind == "merge") col("headers") else Topics.emptyHeaders).as("headers"))

  /** One scan, zero shuffle: each source record explodes into 0..2 produced
    * records.
    */
  private def produced(src: DataFrame, mergeRow: Column, purgeRow: Column): DataFrame =
    // spreadScan (r17, guide §2.5): the per-record produce explosion
    // (struct build + header arrays, then usually a serde or display
    // projection above) is the map-heavy half of the producer verbs —
    // a single-row-group topic file must not serialize it on one scan
    // task. No-op on multi-split layouts; the window/aggregate verbs
    // (compact/retain/scd2) deliberately do NOT spread — their map
    // side is light and the repair exchange measured as pure cost
    // there (+0.4 s at sf0.1).
    graft.sources.Tables.spreadScan(src, "offset")
      .select(explode(filter(array(mergeRow, purgeRow), _.isNotNull)).as("rec"))
      .select(col("rec.*"))
}
