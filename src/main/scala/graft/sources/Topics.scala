package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's data model re-expressed for Spark.
  *
  * A Kafka topic at rest is a keyed record log; the canonical record view is
  *   (topic, partition, offset, ts, key, value, raw)
  * mirroring the reference's `ConsumerRecord<MixedValue?, MixedValue?>`
  * (reference: src/main/kotlin/com/flyeralarm/kafkamp/MixedValue.kt:13).
  * `value == null` is a tombstone (reference: Pipeline.kt:93); `raw` is the
  * untouched byte payload the reference always writes back
  * (MixedValue.kt:88 — decode is for display/routing only).
  *
  * The `events` test table maps to topic "events" deterministically
  * (SURVEY.md §3): key = user_id, partition = user_id % 8,
  * offset = event_id, value = props JSON, and records with
  * event_type = 'error' carry a null value (tombstones).
  */
object Topics {
  val NumPartitions = 8

  /** Batch view of the `events` table as a topic record log.
    *
    * NOT spread here (r17, measured): the producer verbs spread inside
    * TopicOps.produced (their per-record explosion is map-heavy —
    * merge_all 1.95→1.07 s at sf0.1), but a blanket spread at the view
    * regressed the window/aggregate verbs whose map side is light
    * (topic_compact +0.41 s, topic_scd2 +0.38 s).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    asTopic(Tables.load(spark, dir, "events"))

  /** Pure projection (no shuffle) — applies identically to a streaming df.
    *
    * `headers` models Kafka's ordered, repeatable record headers
    * (ConsumerRecord.headers(); the reference's deserializer is
    * headers-aware, MixedValue.kt:41) as array<struct<k,v:binary>> —
    * derived deterministically from the event so every oracle can replay
    * them: [("src", bytes(event_type)), ("seq", bytes(event_id))].
    *
    * Keys are MixedValue too (the reference wires a key deserializer
    * distinct from the value's, Factory.kt:96-99), so the view carries
    * the untouched key bytes (`key_raw`) next to the decoded `key` —
    * the same dual raw/decoded shape `raw` gives values. Key serdes
    * (Serdes.KeySerde) decode key_raw; corrupt key bytes abort or route
    * exactly like value decode failures.
    */
  def asTopic(events: DataFrame): DataFrame =
    events.select(
      lit("events").as("topic"),
      (col("user_id") % NumPartitions).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts"),
      col("user_id").cast("string").as("key"),
      encode(col("user_id").cast("string"), "UTF-8").as("key_raw"),
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(col("props")).as("value"),
      array(
        struct(lit("src").as("k"), encode(col("event_type"), "UTF-8").as("v")),
        struct(lit("seq").as("k"), encode(col("event_id").cast("string"), "UTF-8").as("v")))
        .as("headers"))
      .withColumn("raw", encode(col("value"), "UTF-8"))

  /** Header list schema / the no-headers value (tombstones produced by
    * purge are bare records, reference Pipeline.kt:97).
    */
  val HeadersType = "array<struct<k:string,v:binary>>"
  def emptyHeaders: Column = array().cast(HeadersType)

  /** Canonical display form "k1=HEX;k2=HEX" — order-preserving, so equal
    * strings ⇔ equal header lists. The oracle-visible projection of the
    * nested column (the driver's compare can't sort nested types).
    */
  def headersStr(h: Column): Column =
    concat_ws(";", transform(h,
      x => concat(x.getField("k"), lit("="), hex(x.getField("v")))))

  /** Tombstone predicate (Pipeline.kt:93: `record.value() == null`). */
  def isTombstone(value: Column): Column = value.isNull
}
