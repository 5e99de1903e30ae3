package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable value serdes for the topic record model — the Spark face of
  * the reference's delegate-deserializer seam (MixedValue.kt:30 wraps a
  * pluggable Deserializer; Factory.kt:96-110 selects String vs Avro per
  * CLI flag). A serde maps the raw bytes column to decoded view columns
  * plus a decode-error column (null = decodable); the strict
  * (TopicOps.strictDecode) and DLQ (TopicOps.dlqSplit) paths consume the
  * error column, so every serde plugs into both failure modes unchanged.
  */
object Serdes {

  trait ValueSerde {
    /** Decoded display/routing columns derived from `raw`. */
    def decoded(raw: Column): Map[String, Column]

    /** null when the bytes decode; a reason string otherwise. */
    def error(raw: Column): Column
  }

  /** Binary→string via CAST, which wraps the bytes unvalidated
    * (UTF8String.fromBytes) — unlike decode(_, 'UTF-8'), which in Spark 4
    * (spark.sql.legacy.codingErrorAction=false) THROWS
    * MALFORMED_CHARACTER_CODING on genuinely non-UTF-8 bytes, crashing the
    * very DLQ path that exists to route them. Serdes must never throw on
    * bad bytes: validity is checked explicitly with is_valid_utf8 so
    * corrupt payloads become a routable error value.
    */
  private def utf8Lenient(bytes: Column): Column = bytes.cast("string")

  /** Default serde (the reference's StringDeserializer): UTF-8 text whose
    * payload carries a `"k": <int>` field. Non-UTF-8 bytes and payloads
    * without a well-formed k are both 'decode_failure' (the try_cast keeps
    * the no-match empty string from throwing under ANSI).
    */
  object Utf8JsonSerde extends ValueSerde {
    private def text(raw: Column): Column = utf8Lenient(raw)

    private def kOf(raw: Column): Column =
      when(is_valid_utf8(text(raw)),
        regexp_extract(text(raw), "\"k\": (\\d+)", 1)).try_cast("int")

    override def decoded(raw: Column): Map[String, Column] =
      Map("value_decoded" -> when(is_valid_utf8(text(raw)), text(raw)),
        "k_decoded" -> kOf(raw))

    override def error(raw: Column): Column =
      when(kOf(raw).isNull, "decode_failure")
  }

  /** Key-side serde — the reference deserializes keys through their OWN
    * pluggable delegate (Factory.kt:96-99 wires a key deserializer
    * separate from the value's; both are MixedValue). Shape mirrors
    * [[ValueSerde]] over the `key_raw` bytes; a null key (tombstone-style
    * keyless record) is valid — only non-null bytes that fail to decode
    * are errors, and a key error applies to EVERY record, tombstones
    * included (routing/compaction need the key even when the value is
    * null).
    */
  trait KeySerde {
    def decoded(keyRaw: Column): Map[String, Column]

    /** null when the key bytes decode (or are absent); a reason otherwise. */
    def error(keyRaw: Column): Column
  }

  /** Default key serde (the reference's LongDeserializer analog): UTF-8
    * digits decoding to a bigint user id. The rlike guard keeps the cast
    * ANSI-safe — Spark 4 would throw on a bare cast of corrupt bytes —
    * and is length-bounded to 18 digits (always inside Long range): a
    * 20-digit numeric key would pass an unbounded digit regex and then
    * OVERFLOW the ANSI cast, crashing the very DLQ path that exists to
    * route bad keys. Longer numerics are decode failures.
    */
  object Utf8LongKeySerde extends KeySerde {
    private def text(keyRaw: Column): Column = utf8Lenient(keyRaw)

    def keyDec(keyRaw: Column): Column =
      when(is_valid_utf8(text(keyRaw)) && text(keyRaw).rlike("^-?\\d{1,18}$"),
        text(keyRaw).cast("bigint"))

    override def decoded(keyRaw: Column): Map[String, Column] =
      Map("key_dec" -> keyDec(keyRaw))

    override def error(keyRaw: Column): Column =
      when(keyRaw.isNotNull && keyDec(keyRaw).isNull, "key_decode_failure")
  }

  /** Avro serde (the reference's KafkaAvroDeserializer seam): raw bytes
    * are a GraftEvent binary datum; decode failure (truncated/corrupt
    * payload) yields null → abort under strictDecode, route under
    * dlqSplit — exactly the DLQ workflow the reference README leads with.
    */
  object AvroEventSerde extends ValueSerde {
    /** Resolves against the session-registered graft_avro_decode (callers
      * go through a df whose source called NativeHash.register).
      */
    def struct(raw: Column): Column = call_function("graft_avro_decode", raw)

    override def decoded(raw: Column): Map[String, Column] = {
      val s = struct(raw)
      Map("event_type_dec" -> s.getField("event_type"),
        "k_dec" -> s.getField("k"),
        "user_id_dec" -> s.getField("user_id"))
    }

    override def error(raw: Column): Column =
      when(struct(raw).isNull, "avro_decode_failure")
  }

  /** Schema-registry seam (Factory.kt:103-110: the reference wires
    * KafkaAvroDeserializer against a registry URL; the registry protocol
    * puts a 5-byte envelope — magic byte 0x00 + big-endian 4-byte schema
    * id — in front of every Avro datum). The trait is the pluggable
    * surface a deployment implements against its HTTP registry; the
    * container has no registry service, so the fixture-backed in-memory
    * client stands in, exercising the REAL wire concerns: framing,
    * subject→id lookup, and unknown-id/bad-magic/short-payload rejection.
    */
  object SchemaRegistry {
    trait SchemaRegistryClient {
      /** Latest schema id registered under a subject, if any. */
      def idFor(subject: String): Option[Int]

      /** Schema JSON by id, if the id is known to the registry. */
      def schemaById(id: Int): Option[String]
    }

    /** Fixture-backed fake: a fixed subject→(id, schema) table. */
    final class InMemoryRegistry(entries: Map[String, (Int, String)])
        extends SchemaRegistryClient {
      private val byId = entries.values.toMap
      override def idFor(subject: String): Option[Int] = entries.get(subject).map(_._1)
      override def schemaById(id: Int): Option[String] = byId.get(id)
    }

    /** The test fixture: the GraftEvent schema registered under the
      * topic's value subject (Kafka convention: `<topic>-value`) as id 7,
      * and the Avro long KEY schema under the key subject
      * (`<topic>-key`) as id 8 — keys and values resolve their ids
      * independently, exactly like the reference's separate key/value
      * deserializer wiring (Factory.kt:59-61).
      */
    val EventsSubject = "events.avro-value"
    val EventsKeySubject = "events.avro-key"
    val Fixture: SchemaRegistryClient = new InMemoryRegistry(
      Map(EventsSubject -> (7, graft.functions.AvroEventImpl.SchemaJson),
        EventsKeySubject -> (8, graft.functions.AvroLongImpl.SchemaJson)))

    /** 5-byte envelope for a schema id: 0x00 magic + int32 big-endian. */
    def header(id: Int): Array[Byte] =
      Array(0x00.toByte, (id >> 24).toByte, (id >> 16).toByte, (id >> 8).toByte, id.toByte)

    /** Wrap a datum column in the id's wire envelope. */
    def frame(id: Int, datum: Column): Column = concat(lit(header(id)), datum)
  }

  /** Avro serde behind the registry seam: encodes/decodes the 5-byte wire
    * envelope around the plain [[AvroEventSerde]] datum. Decode validates
    * the frame — too-short payload, wrong magic byte, or a schema id the
    * registry doesn't know all become the routable 'avro_decode_failure'
    * (never a throw), exactly like datum corruption.
    */
  final class RegistryAvroEventSerde(client: SchemaRegistry.SchemaRegistryClient,
                                     subject: String) extends ValueSerde {
    private val id: Int = client.idFor(subject).getOrElse(
      throw new IllegalArgumentException(s"subject not in registry: $subject"))
    // the writer schema the id resolves to must be the GraftEvent schema
    // the fixed-codec kernel reads (a full deployment would build the
    // datum reader from this JSON instead)
    require(client.schemaById(id).contains(graft.functions.AvroEventImpl.SchemaJson),
      s"registry schema $id does not match the GraftEvent codec")

    private val head = lit(SchemaRegistry.header(id))

    private def validFrame(raw: Column): Column =
      octet_length(raw) > 5 && raw.substr(lit(1), lit(5)) === head

    /** The datum behind the envelope; null unless the frame validates. */
    def payload(raw: Column): Column =
      when(validFrame(raw), raw.substr(lit(6), octet_length(raw) - 5))

    def struct(raw: Column): Column =
      call_function("graft_avro_decode", payload(raw))

    /** Encode-side framing for produced records. */
    def frame(datum: Column): Column = SchemaRegistry.frame(id, datum)

    override def decoded(raw: Column): Map[String, Column] = {
      val s = struct(raw)
      Map("event_type_dec" -> s.getField("event_type"),
        "k_dec" -> s.getField("k"),
        "user_id_dec" -> s.getField("user_id"))
    }

    override def error(raw: Column): Column =
      when(struct(raw).isNull, "avro_decode_failure")
  }

  /** The fixture-registry serde for the events.avro topic. */
  def registryAvroSerde(): RegistryAvroEventSerde =
    new RegistryAvroEventSerde(SchemaRegistry.Fixture, SchemaRegistry.EventsSubject)

  /** Avro KEY serde behind the registry seam — the last reference serde
    * combination (Factory.kt:59-61: `-A` wires avroKeyDeserializer; keys
    * decode through the same pluggable registry path as values, with
    * their own subject/id). Key bytes are the 5-byte envelope around an
    * Avro `long` datum. A null key stays valid (keyless record); any
    * non-null key that fails framing (bad magic, unknown id, short
    * payload) or datum decode (truncated varint, trailing bytes) is the
    * routable 'key_decode_failure' — which outranks value errors and
    * applies to tombstones too (the key must decode for EVERY record:
    * routing/compaction need it even when the value is null —
    * TopicOps.dlqSplit's existing key-error contract).
    */
  final class RegistryAvroKeySerde(client: SchemaRegistry.SchemaRegistryClient,
                                   subject: String) extends KeySerde {
    private val id: Int = client.idFor(subject).getOrElse(
      throw new IllegalArgumentException(s"subject not in registry: $subject"))
    require(client.schemaById(id).contains(graft.functions.AvroLongImpl.SchemaJson),
      s"registry schema $id does not match the Avro long key codec")

    private val head = lit(SchemaRegistry.header(id))

    private def validFrame(raw: Column): Column =
      octet_length(raw) > 5 && raw.substr(lit(1), lit(5)) === head

    /** The datum behind the envelope; null unless the frame validates. */
    def payload(keyRaw: Column): Column =
      when(validFrame(keyRaw), keyRaw.substr(lit(6), octet_length(keyRaw) - 5))

    /** Decoded bigint key; null when absent or undecodable. */
    def keyDec(keyRaw: Column): Column =
      call_function("graft_avro_decode_key", payload(keyRaw))

    /** Encode-side framing for produced keys. */
    def frame(datum: Column): Column = SchemaRegistry.frame(id, datum)

    override def decoded(keyRaw: Column): Map[String, Column] =
      Map("key_dec" -> keyDec(keyRaw))

    override def error(keyRaw: Column): Column =
      when(keyRaw.isNotNull && keyDec(keyRaw).isNull, "key_decode_failure")
  }

  /** The fixture-registry KEY serde for the events.avro topic. */
  def registryAvroKeySerde(): RegistryAvroKeySerde =
    new RegistryAvroKeySerde(SchemaRegistry.Fixture, SchemaRegistry.EventsKeySubject)

  /** The events table as a topic whose VALUE serde is Avro: raw bytes are
    * the Avro-encoded (event_type, k, user_id) datum. `value` keeps the
    * props string view (never null here — this topic models a schema'd
    * payload stream, not the tombstone view), so dlqSplit/strictDecode
    * compose unchanged.
    */
  def avroTopic(events: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(events.sparkSession)
    events.select(
      lit("events.avro").as("topic"),
      (col("user_id") % Topics.NumPartitions).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts"),
      col("user_id").cast("string").as("key"),
      encode(col("user_id").cast("string"), "UTF-8").as("key_raw"),
      col("props").as("value"),
      call_function("graft_avro_encode",
        col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"),
        col("user_id")).as("raw"))
  }
}
