package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TopicOps
import graft.sources.{Formats, Serdes, Tables, Topics}

/** SURVEY.md §2a — the reference's own operator surface, bound to the
  * `events` topic view with deterministic rules, plus the DuckDB oracle SQL
  * for each. The topic-view mapping (SURVEY.md §3) is mirrored exactly in
  * the `TopicCte` used by every oracle.
  */
object TopicQueries {

  /** Decoded payload field (reference MixedValue decode step): props is
    * `{"k": <int>}`; extraction via regexp keeps both engines identical.
    * try_cast, not cast: regexp_extract yields "" on no-match, and an ANSI
    * cast of "" would crash the decode path instead of yielding the null
    * that routes to 'decode_failure' (mirrors the oracle's TRY_CAST).
    */
  private def kField: Column =
    regexp_extract(col("value"), "\"k\": (\\d+)", 1).try_cast("int")

  private[queries] val KFieldSql =
    """TRY_CAST(regexp_extract("value", '"k": (\d+)', 1) AS INT)"""

  /** Ask-command action rule (stand-in for the interactive ActionSource):
    * merge small-k records, purge large-k, skip the middle band.
    */
  private def actionRule: Column =
    when(kField < 30, "merge").when(kField >= 70, "purge").otherwise("skip")

  private val ActionRuleSql =
    s"""CASE WHEN $KFieldSql < 30 THEN 'merge'
       |     WHEN $KFieldSql >= 70 THEN 'purge'
       |     ELSE 'skip' END""".stripMargin

  /** DLQ validation rule: decoded k must exist and be <= 90. */
  private[queries] def dlqError: Column =
    when(kField.isNull, "decode_failure").when(kField > 90, "out_of_range")

  /** The SURVEY.md §3 events→topic mapping as a DuckDB CTE. headers_str is
    * the canonical "k=HEX;k=HEX" rendering of the record headers
    * [("src", bytes(event_type)), ("seq", bytes(event_id))] — the nested
    * list itself can't ride through the driver's sorted-row compare.
    */
  val TopicCte: String =
    """WITH topic AS (
      |  SELECT 'events' AS topic,
      |         CAST(user_id % 8 AS INT) AS "partition",
      |         event_id AS "offset",
      |         CAST(ts AS TIMESTAMP) AS ts,
      |         CAST(user_id AS VARCHAR) AS "key",
      |         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS "value",
      |         'src=' || upper(hex(encode(event_type))) ||
      |           ';seq=' || upper(hex(encode(CAST(event_id AS VARCHAR)))) AS headers_str
      |  FROM events
      |)""".stripMargin

  private val ProducedCols =
    """topic, "partition", "key", "value", "offset" AS src_offset"""

  /** Produced-record output with headers canonicalized for the compare:
    * merge copies round-trip the source headers; purge tombstones are bare
    * (empty header list renders as '').
    */
  private def producedOut(df: DataFrame): DataFrame =
    df.select(col("topic"), col("partition"), col("key"), col("value"),
      col("src_offset"), col("kind"),
      Topics.headersStr(col("headers")).as("headers_str"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topic_print" -> ((s, dir) =>
      Topics.events(s, dir)
        .select(col("partition"), col("offset"), col("ts"), col("key"), col("value"),
          Topics.headersStr(col("headers")).as("headers_str"))
        .orderBy(col("offset"))),
    "topic_stats" -> ((s, dir) =>
      TopicOps.stats(Topics.events(s, dir)).orderBy(col("partition"))),
    // the JSONL ingress seam: events round-trip parquet → JSONL → topic
    // view; byte-identical to topic_print (its oracle verbatim) proves
    // the schema-first reader and µs-precision timestamp handling
    "topic_print_jsonl" -> ((s, dir) => {
      val events = Tables.load(s, dir, "events")
      val path = "target/format-scratch/events-jsonl-" +
        java.lang.Integer.toHexString(dir.hashCode)
      Formats.writeJsonl(events, path)
      Topics.asTopic(Formats.readJsonl(s, path, events.schema))
        .select(col("partition"), col("offset"), col("ts"), col("key"), col("value"),
          Topics.headersStr(col("headers")).as("headers_str"))
        .orderBy(col("offset"))
    }),
    "topic_merge_all" -> ((s, dir) =>
      producedOut(TopicOps.mergeAll(Topics.events(s, dir), "events.v2"))
        .orderBy(col("src_offset"), col("kind"))),
    "topic_merge_tombstones" -> ((s, dir) =>
      producedOut(TopicOps.mergeAll(Topics.events(s, dir), "events.v2", mergeTombstones = true))
        .orderBy(col("src_offset"), col("kind"))),
    "topic_purge_all" -> ((s, dir) =>
      producedOut(TopicOps.purgeAll(Topics.events(s, dir))).orderBy(col("src_offset"))),
    "topic_ask_route" -> ((s, dir) =>
      producedOut(TopicOps.route(Topics.events(s, dir), actionRule, "events.v2"))
        .orderBy(col("src_offset"), col("kind"))),
    "topic_route_stats" -> ((s, dir) =>
      TopicOps.routeStats(Topics.events(s, dir), actionRule).orderBy(col("action"))),
    // ask with decisions computed elsewhere (ActionSource.kt:9): a
    // decision table keyed (topic, partition, offset) joins onto the
    // records; undecided records are skipped.
    "topic_ask_table" -> ((s, dir) => {
      val t = Topics.events(s, dir)
      val decisions = t.filter(col("offset") % 3 === 0)
        .select(col("topic"), col("partition"), col("offset"),
          when(col("offset") % 2 === 0, "merge").otherwise("purge").as("action"))
      producedOut(TopicOps.routeWithDecisions(t, decisions, "events.v2"))
        .orderBy(col("src_offset"), col("kind"))
    }),
    "topic_compact" -> ((s, dir) =>
      TopicOps.compact(Topics.events(s, dir))
        .orderBy(col("partition"), col("key"))),
    "topic_compact_salted" -> ((s, dir) =>
      TopicOps.compactSalted(Topics.events(s, dir))
        .orderBy(col("partition"), col("key"))),
    // compact-with-history: newest 3 records per key, tombstones retained
    // as delete markers (r8; map-side WindowGroupLimit bounds the shuffle)
    "topic_retention" -> ((s, dir) =>
      TopicOps.retain(Topics.events(s, dir))
        .orderBy(col("partition"), col("key"), col("version"))),
    "topic_dlq" -> ((s, dir) =>
      TopicOps.dlqSplit(Topics.events(s, dir), dlqError)
        .select(col("sink"), col("error"), col("partition"), col("offset"),
          col("key"), col("value"))
        .orderBy(col("offset"))),
    // strict decode over the known-clean subset (the reference's DEFAULT
    // abort-on-decode-failure contract, MixedValue.kt:30): every record
    // must pass the per-row assert or the job dies — the oracle checks the
    // pass-through projection; the abort case stays in TopicOpsSpec.
    "topic_strict_decode" -> ((s, dir) => {
      val clean = Topics.events(s, dir)
        .filter(Topics.isTombstone(col("value")) || dlqError.isNull)
      TopicOps.strictDecode(clean, dlqError)
        .select(col("partition"), col("offset"), col("key"), col("value"),
          kField.as("k_decoded"))
        .orderBy(col("offset"))
    }),
    "topic_serde" -> ((s, dir) =>
      TopicOps.serdeView(Topics.events(s, dir),
        Map("k_decoded" -> kField, "raw_len" -> octet_length(col("raw")),
          "raw_hex" -> hex(col("raw"))))
        .select(col("offset"), col("key"), col("value"), col("raw_hex"),
          col("k_decoded"), col("raw_len"),
          Topics.headersStr(col("headers")).as("headers_str"))
        .orderBy(col("offset"))),
    // Key-side decode (Factory.kt:96-99 — keys get their OWN pluggable
    // deserializer): the dual raw/decoded key view plus DLQ routing on
    // key decode failure. Two deterministic corruption arms: offset%83
    // gets GENUINELY non-UTF-8 bytes (0xFFFE — exercises the lenient
    // cast + is_valid_utf8 path end-to-end, round-3 VERDICT #3), offset
    // %89 gets valid-UTF-8-but-non-numeric text. Corrupt keys route to
    // the DLQ even on tombstones (the key must decode for every record),
    // and key errors outrank value errors. The strict (abort) twin lives
    // in TopicOpsSpec.
    "topic_key_serde" -> ((s, dir) => {
      val t = Topics.events(s, dir)
        .withColumn("key_raw",
          when(col("offset") % 83 === 0, unhex(lit("FFFE")))
            .when(col("offset") % 89 === 0, encode(lit("x"), "UTF-8"))
            .otherwise(col("key_raw")))
      TopicOps.dlqSplit(t, dlqError, Serdes.Utf8LongKeySerde.error(col("key_raw")))
        .select(col("sink"), col("error"), col("partition"), col("offset"),
          hex(col("key_raw")).as("key_raw_hex"),
          Serdes.Utf8LongKeySerde.keyDec(col("key_raw")).as("key_dec"),
          col("value"))
        .orderBy(col("offset"))
    }),
    // Avro KEY serde behind the registry seam (Factory.kt:59-61 — the
    // `-A` avroKeyDeserializer wiring, the last reference serde combo):
    // keys ride the 5-byte envelope around an Avro long datum. Two
    // deterministic corruption arms: offset%83 ships the BARE datum (no
    // envelope — bad magic must fail framing even though the bytes are a
    // byte-valid long), offset%89 ships a framed-but-truncated varint
    // (0xFF continuation with no terminator — framing passes, datum
    // decode must fail). Corrupt keys route to the DLQ even on
    // tombstones, and key errors outrank value errors (the existing
    // dlqSplit key contract, same as topic_key_serde).
    "topic_key_serde_avro" -> ((s, dir) => {
      graft.functions.NativeHash.register(s)
      val serde = Serdes.registryAvroKeySerde()
      val datum = call_function("graft_avro_encode_key", col("key").cast("bigint"))
      val t = Topics.events(s, dir)
        .withColumn("key_raw",
          when(col("offset") % 83 === 0, datum)
            .when(col("offset") % 89 === 0, serde.frame(unhex(lit("FF"))))
            .otherwise(serde.frame(datum)))
      TopicOps.dlqSplit(t, dlqError, serde.error(col("key_raw")))
        .select(col("sink"), col("error"), col("partition"), col("offset"),
          serde.keyDec(col("key_raw")).as("key_dec"), col("value"))
        .orderBy(col("offset"))
    }),
    "topic_offsets" -> ((s, dir) =>
      TopicOps.committedOffsets(Topics.events(s, dir), "graft")
        .orderBy(col("partition"))),
    // consumer-lag card (r9): log end vs last decided offset per
    // partition, records still awaiting a decision (the Kafka ops
    // metric, with the decisions log as the consumer)
    "topic_lag" -> ((s, dir) => {
      val t = Topics.events(s, dir)
      val decisions = t.filter(col("offset") % 3 === 0)
        .select(col("topic"), col("partition"), col("offset"))
      TopicOps.lag(t, decisions).orderBy(col("partition"))
    }),
    // SCD2 history (r9): every non-tombstone record versioned with a
    // validity interval closed by the key's next record; tombstones
    // close intervals without emitting rows.
    "topic_scd2" -> ((s, dir) =>
      TopicOps.scd2(Topics.events(s, dir))
        .orderBy(col("key"), col("seq"))),
    // POINT-IN-TIME lookup (r9) — what SCD2 exists FOR: each decision
    // enriched with the version valid AT its offset. A backward as-of
    // join picks the latest version started at-or-before the decision;
    // a version already CLOSED by then can only mean the key was
    // tombstoned (a later live version would have been picked instead),
    // so the payload nulls — dead keys enrich with nothing, they are
    // not silently given stale values. Rides AsOf.joinAsOf: one union +
    // one window, no interval explode needed because SCD2 intervals
    // are disjoint and contiguous per key by construction.
    "topic_pit_lookup" -> ((s, dir) => {
      val t = Topics.events(s, dir)
      val hist = TopicOps.scd2(t)
        .select(col("key"), col("value"), col("seq"),
          col("valid_from_offset"), col("valid_to_offset"))
      val dec = t.filter(col("offset") % 3 === 0).select(col("key"), col("offset"))
      val live = !(col("valid_to_offset").isNotNull &&
        col("valid_to_offset") <= col("offset"))
      graft.operators.AsOf.joinAsOf(dec, hist, Seq("key"),
          "offset", "valid_from_offset")
        .select(col("key"), col("offset"),
          when(live, col("value")).as("value_at"),
          when(live, col("seq")).as("version"),
          when(live, col("valid_from_offset")).as("since_offset"))
        .orderBy(col("key"), col("offset"))
    }),
    // Avro value serde (MixedValue.kt:30 delegate; Factory.kt:103 Avro
    // wiring): encode→decode round-trip over the events payload — the
    // decoded columns must equal the source columns the datum was built
    // from, which is exactly what the oracle selects.
    "topic_serde_avro" -> ((s, dir) => {
      val t = Serdes.avroTopic(Tables.load(s, dir, "events"))
      TopicOps.serdeView(t, Serdes.AvroEventSerde.decoded(col("raw")))
        .select(col("offset"), col("key"),
          col("event_type_dec"), col("k_dec"), col("user_id_dec"))
        .orderBy(col("offset"))
    }),
    // Schema-registry wire format (Factory.kt:103-110): every datum rides
    // behind the 5-byte envelope (magic 0x00 + int32 schema id); decode
    // resolves the subject's id through the registry client and validates
    // the frame. A deterministic subset is framed with an id the registry
    // does NOT know (99) — a structurally valid datum that must still
    // route to the DLQ, proving the id check is real.
    "topic_serde_avro_registry" -> ((s, dir) => {
      val serde = Serdes.registryAvroSerde()
      val t = Serdes.avroTopic(Tables.load(s, dir, "events"))
        .withColumn("raw",
          when(col("offset") % 97 === 0, Serdes.SchemaRegistry.frame(99, col("raw")))
            .otherwise(serde.frame(col("raw"))))
      TopicOps.dlqSplit(t, serde.error(col("raw")))
        .select(col("sink"), col("error"), col("partition"), col("offset"), col("key"),
          serde.struct(col("raw")).getField("event_type").as("event_type_dec"),
          serde.struct(col("raw")).getField("k").as("k_dec"),
          serde.struct(col("raw")).getField("user_id").as("user_id_dec"))
        .orderBy(col("offset"))
    }),
    // Avro decode failure → DLQ routing: a deterministic subset of datums
    // is truncated to one byte (never a valid GraftEvent), and the serde's
    // error column routes them — the reference's abort-by-default twin
    // (strict case in AvroSerdeSpec).
    "topic_dlq_avro" -> ((s, dir) => {
      val t = Serdes.avroTopic(Tables.load(s, dir, "events"))
        .withColumn("raw", when(col("offset") % 97 === 0,
          substring(col("raw"), 1, 1)).otherwise(col("raw")))
      TopicOps.dlqSplit(t, Serdes.AvroEventSerde.error(col("raw")))
        .select(col("sink"), col("error"), col("partition"), col("offset"), col("key"),
          Serdes.AvroEventSerde.struct(col("raw")).getField("k").as("k_dec"))
        .orderBy(col("offset"))
    }))

  def oracles: Map[String, String] = {
    val base = oraclesBase
    // compactSalted is compact by construction — one oracle, one gate;
    // the JSONL round-trip must reproduce topic_print byte-for-byte
    base +
      ("topic_compact_salted" -> base("topic_compact")) +
      ("topic_print_jsonl" -> base("topic_print"))
  }

  private def oraclesBase: Map[String, String] = Map(
    "topic_print" ->
      s"""$TopicCte
         |SELECT "partition", "offset", ts, "key", "value", headers_str
         |FROM topic ORDER BY "offset"""".stripMargin,
    "topic_stats" ->
      s"""$TopicCte
         |SELECT topic, "partition", COUNT(*) AS records,
         |       COUNT(*) FILTER ("value" IS NULL) AS tombstones,
         |       MIN("offset") AS min_offset, MAX("offset") AS max_offset,
         |       COUNT(DISTINCT "key") AS distinct_keys
         |FROM topic GROUP BY topic, "partition" ORDER BY "partition"""".stripMargin,
    "topic_merge_all" ->
      s"""$TopicCte, live AS (SELECT * FROM topic WHERE "value" IS NOT NULL)
         |SELECT * FROM (
         |  SELECT 'events.v2' AS $ProducedCols, 'merge' AS kind, headers_str FROM live
         |  UNION ALL
         |  SELECT topic, "partition", "key", NULL AS "value", "offset", 'purge', '' FROM live
         |) ORDER BY src_offset, kind""".stripMargin,
    "topic_merge_tombstones" ->
      s"""$TopicCte
         |SELECT * FROM (
         |  SELECT 'events.v2' AS $ProducedCols, 'merge' AS kind, headers_str FROM topic
         |  UNION ALL
         |  SELECT topic, "partition", "key", NULL AS "value", "offset", 'purge', ''
         |  FROM topic WHERE "value" IS NOT NULL
         |) ORDER BY src_offset, kind""".stripMargin,
    "topic_purge_all" ->
      s"""$TopicCte
         |SELECT topic, "partition", "key", CAST(NULL AS VARCHAR) AS "value",
         |       "offset" AS src_offset, 'purge' AS kind, '' AS headers_str
         |FROM topic WHERE "value" IS NOT NULL ORDER BY src_offset""".stripMargin,
    "topic_ask_route" ->
      s"""$TopicCte, live AS (
         |  SELECT *, $ActionRuleSql AS action FROM topic WHERE "value" IS NOT NULL)
         |SELECT * FROM (
         |  SELECT 'events.v2' AS $ProducedCols, 'merge' AS kind, headers_str
         |  FROM live WHERE action = 'merge'
         |  UNION ALL
         |  SELECT topic, "partition", "key", NULL AS "value", "offset", 'purge', ''
         |  FROM live WHERE action IN ('merge', 'purge')
         |) ORDER BY src_offset, kind""".stripMargin,
    "topic_route_stats" ->
      s"""$TopicCte
         |SELECT $ActionRuleSql AS action, COUNT(*) AS records
         |FROM topic WHERE "value" IS NOT NULL
         |GROUP BY 1 ORDER BY action""".stripMargin,
    "topic_compact" ->
      s"""$TopicCte
         |SELECT topic, "partition", "key", "offset", "value", ts FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY topic, "partition", "key" ORDER BY "offset" DESC) AS rn
         |  FROM topic)
         |WHERE rn = 1 AND "value" IS NOT NULL
         |ORDER BY "partition", "key"""".stripMargin,
    "topic_retention" ->
      s"""$TopicCte
         |SELECT topic, "partition", "key", "offset", "value", ts,
         |       CAST(rn AS INT) AS version FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY topic, "partition", "key" ORDER BY "offset" DESC) AS rn
         |  FROM topic)
         |WHERE rn <= 3
         |ORDER BY "partition", "key", version""".stripMargin,
    "topic_dlq" ->
      s"""$TopicCte, decoded AS (
         |  SELECT *, CASE WHEN "value" IS NULL THEN NULL
         |                 WHEN $KFieldSql IS NULL THEN 'decode_failure'
         |                 WHEN $KFieldSql > 90 THEN 'out_of_range' END AS error
         |  FROM topic)
         |SELECT CASE WHEN error IS NOT NULL THEN 'dlq' ELSE 'clean' END AS sink,
         |       error, "partition", "offset", "key", "value"
         |FROM decoded ORDER BY "offset"""".stripMargin,
    "topic_ask_table" ->
      s"""$TopicCte, decisions AS (
         |  SELECT topic, "partition", "offset",
         |         CASE WHEN "offset" % 2 = 0 THEN 'merge' ELSE 'purge' END AS action
         |  FROM topic WHERE "offset" % 3 = 0),
         |live AS (
         |  SELECT t.*, COALESCE(d.action, 'skip') AS action
         |  FROM topic t LEFT JOIN decisions d
         |    USING (topic, "partition", "offset")
         |  WHERE t."value" IS NOT NULL)
         |SELECT * FROM (
         |  SELECT 'events.v2' AS $ProducedCols, 'merge' AS kind, headers_str
         |  FROM live WHERE action = 'merge'
         |  UNION ALL
         |  SELECT topic, "partition", "key", NULL AS "value", "offset", 'purge', ''
         |  FROM live WHERE action IN ('merge', 'purge')
         |) ORDER BY src_offset, kind""".stripMargin,
    "topic_strict_decode" ->
      s"""$TopicCte
         |SELECT "partition", "offset", "key", "value", $KFieldSql AS k_decoded
         |FROM topic
         |WHERE "value" IS NULL OR ($KFieldSql IS NOT NULL AND $KFieldSql <= 90)
         |ORDER BY "offset"""".stripMargin,
    "topic_serde" ->
      s"""$TopicCte
         |SELECT "offset", "key", "value", upper(hex(encode("value"))) AS raw_hex,
         |       $KFieldSql AS k_decoded,
         |       octet_length(encode("value")) AS raw_len, headers_str
         |FROM topic ORDER BY "offset"""".stripMargin,
    // key_raw_hex renders the corruption arms directly: DuckDB can't hold
    // invalid-UTF-8 bytes in a VARCHAR, so the 0xFFFE arm is spelled as
    // its hex — exactly what the Spark side's hex(key_raw) yields.
    "topic_key_serde" ->
      s"""$TopicCte, keyed AS (
         |  SELECT *, CASE WHEN "offset" % 83 = 0 THEN 'FFFE'
         |                 WHEN "offset" % 89 = 0 THEN upper(hex(encode('x')))
         |                 ELSE upper(hex(encode("key"))) END AS key_raw_hex,
         |         CASE WHEN "offset" % 83 = 0 OR "offset" % 89 = 0 THEN NULL
         |              ELSE CAST("key" AS BIGINT) END AS key_dec
         |  FROM topic),
         |dec AS (
         |  SELECT *, CASE WHEN key_dec IS NULL THEN 'key_decode_failure'
         |                 WHEN "value" IS NULL THEN NULL
         |                 WHEN $KFieldSql IS NULL THEN 'decode_failure'
         |                 WHEN $KFieldSql > 90 THEN 'out_of_range' END AS error
         |  FROM keyed)
         |SELECT CASE WHEN error IS NOT NULL THEN 'dlq' ELSE 'clean' END AS sink,
         |       error, "partition", "offset", key_raw_hex, key_dec, "value"
         |FROM dec ORDER BY "offset"""".stripMargin,
    // The registry framing + varint decode are invisible to the oracle:
    // a clean key decodes back to exactly the bigint it encoded (the
    // round-trip identity), and both corruption arms — bare datum, framed
    // truncated varint — null the decode. Key errors outrank value
    // errors and hit tombstones too, mirroring topic_key_serde's shape.
    "topic_key_serde_avro" ->
      s"""$TopicCte, keyed AS (
         |  SELECT *, CASE WHEN "offset" % 83 = 0 OR "offset" % 89 = 0 THEN NULL
         |                 ELSE CAST("key" AS BIGINT) END AS key_dec
         |  FROM topic),
         |dec AS (
         |  SELECT *, CASE WHEN key_dec IS NULL THEN 'key_decode_failure'
         |                 WHEN "value" IS NULL THEN NULL
         |                 WHEN $KFieldSql IS NULL THEN 'decode_failure'
         |                 WHEN $KFieldSql > 90 THEN 'out_of_range' END AS error
         |  FROM keyed)
         |SELECT CASE WHEN error IS NOT NULL THEN 'dlq' ELSE 'clean' END AS sink,
         |       error, "partition", "offset", key_dec, "value"
         |FROM dec ORDER BY "offset"""".stripMargin,
    "topic_offsets" ->
      s"""$TopicCte
         |SELECT topic, "partition", MAX("offset") AS committed_offset,
         |       COUNT(*) AS records, 'graft' AS "group"
         |FROM topic GROUP BY topic, "partition" ORDER BY "partition"""".stripMargin,
    // lag replay: per-partition decision maxima + one conditional count
    "topic_lag" ->
      s"""$TopicCte, dec AS (
         |  SELECT topic, "partition", MAX("offset") AS last_decided_offset
         |  FROM topic WHERE "offset" % 3 = 0 GROUP BY topic, "partition")
         |SELECT t.topic, t."partition", MAX(t."offset") AS log_end_offset,
         |  COUNT(*) AS records, MAX(d.last_decided_offset) AS last_decided_offset,
         |  CAST(COUNT(CASE WHEN t."offset" > COALESCE(d.last_decided_offset, -1)
         |             THEN 1 END) AS BIGINT) AS lag_records
         |FROM topic t LEFT JOIN dec d USING (topic, "partition")
         |GROUP BY t.topic, t."partition"
         |ORDER BY t."partition"""".stripMargin,
    // scd2 replay: lead bounds + row_number over the SAME per-key window;
    // tombstones participate in the window (closing intervals, keeping
    // seq stable) but emit no rows
    "topic_scd2" ->
      s"""$TopicCte, h AS (
         |  SELECT topic, "partition", "key", "value", ts, "offset",
         |         lead(ts) OVER w AS valid_to_ts,
         |         lead("offset") OVER w AS valid_to_offset,
         |         CAST(row_number() OVER w AS INT) AS seq
         |  FROM topic
         |  WINDOW w AS (PARTITION BY topic, "partition", "key" ORDER BY "offset"))
         |SELECT topic, "partition", "key", "value", seq,
         |       "offset" AS valid_from_offset, valid_to_offset,
         |       ts AS valid_from_ts, valid_to_ts,
         |       valid_to_offset IS NULL AS is_current
         |FROM h WHERE "value" IS NOT NULL
         |ORDER BY "key", seq""".stripMargin,
    // pit replay: SCD2 intervals are disjoint per key, so the lookup is
    // a plain interval LEFT join — at most one version contains d_off
    "topic_pit_lookup" ->
      s"""$TopicCte, h AS (
         |  SELECT topic, "partition", "key", "value", ts, "offset",
         |         lead("offset") OVER w AS valid_to_offset,
         |         CAST(row_number() OVER w AS INT) AS seq
         |  FROM topic
         |  WINDOW w AS (PARTITION BY topic, "partition", "key" ORDER BY "offset")),
         |versions AS (
         |  SELECT "key", "value", seq, "offset" AS valid_from_offset, valid_to_offset
         |  FROM h WHERE "value" IS NOT NULL),
         |dec AS (SELECT "key", "offset" FROM topic WHERE "offset" % 3 = 0)
         |SELECT d."key", d."offset",
         |       v."value" AS value_at, v.seq AS version,
         |       v.valid_from_offset AS since_offset
         |FROM dec d LEFT JOIN versions v
         |  ON v."key" = d."key" AND v.valid_from_offset <= d."offset"
         |  AND (v.valid_to_offset IS NULL OR v.valid_to_offset > d."offset")
         |ORDER BY d."key", d."offset"""".stripMargin,
    // Round-trip identity: decoded Avro columns == the source columns the
    // datum was encoded from.
    "topic_serde_avro" ->
      """SELECT event_id AS "offset", CAST(user_id AS VARCHAR) AS "key",
        |       event_type AS event_type_dec,
        |       TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k_dec,
        |       user_id AS user_id_dec
        |FROM events ORDER BY "offset"""".stripMargin,
    // Framing is invisible in the decoded output — the registry check IS
    // what the unknown-id arm exercises: those records decode to NULL
    // despite carrying a byte-valid datum.
    "topic_serde_avro_registry" ->
      """SELECT CASE WHEN event_id % 97 = 0 THEN 'dlq' ELSE 'clean' END AS sink,
        |       CASE WHEN event_id % 97 = 0 THEN 'avro_decode_failure' END AS error,
        |       CAST(user_id % 8 AS INT) AS "partition",
        |       event_id AS "offset", CAST(user_id AS VARCHAR) AS "key",
        |       CASE WHEN event_id % 97 <> 0 THEN event_type END AS event_type_dec,
        |       CASE WHEN event_id % 97 <> 0
        |            THEN TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) END AS k_dec,
        |       CASE WHEN event_id % 97 <> 0 THEN user_id END AS user_id_dec
        |FROM events ORDER BY "offset"""".stripMargin,
    "topic_dlq_avro" ->
      """SELECT CASE WHEN event_id % 97 = 0 THEN 'dlq' ELSE 'clean' END AS sink,
        |       CASE WHEN event_id % 97 = 0 THEN 'avro_decode_failure' END AS error,
        |       CAST(user_id % 8 AS INT) AS "partition",
        |       event_id AS "offset", CAST(user_id AS VARCHAR) AS "key",
        |       CASE WHEN event_id % 97 <> 0
        |            THEN TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) END AS k_dec
        |FROM events ORDER BY "offset"""".stripMargin)
}
