package graft

import org.apache.spark.sql.functions._

import graft.functions.{AvroEventImpl, NativeHash}
import graft.sources.{Serdes, Tables}

/** The Avro value-serde seam (reference MixedValue.kt:30 delegate
  * deserializer, Factory.kt:103 Avro wiring): encode/decode round-trip,
  * union-null handling, decode-failure routing and the strict abort.
  */
class AvroSerdeSpec extends SparkSpec {

  private def events = Tables.load(spark, sf, "events")

  test("encode∘decode is the identity on every event, including a null union branch") {
    NativeHash.register(spark)
    val t = Serdes.avroTopic(events)
    val dec = Serdes.AvroEventSerde.struct(col("raw"))
    val bad = t.filter(dec.isNull)
    assert(bad.count() === 0)
    // JVM-level: null k rides the union null branch and comes back null
    val bytes = AvroEventImpl.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString("click"), null, 42L)
    val row = AvroEventImpl.decode(bytes)
    assert(row.getUTF8String(0).toString === "click")
    assert(row.isNullAt(1))
    assert(row.getLong(2) === 42L)
  }

  test("registry wire format: framed datums round-trip; bad magic, unknown id, " +
      "and short frames are routable errors; unknown subject refuses to build") {
    NativeHash.register(spark)
    val serde = Serdes.registryAvroSerde()
    val t = Serdes.avroTopic(events).withColumn("framed", serde.frame(col("raw"))).cache()
    // envelope: exactly 5 bytes of (0x00, int32 id) in front of the datum
    assert(t.filter(octet_length(col("framed")) =!= octet_length(col("raw")) + 5)
      .count() === 0)
    assert(t.filter(serde.struct(col("framed")).isNull).count() === 0)
    assert(t.filter(serde.struct(col("framed")).getField("user_id") =!=
      col("key").cast("bigint")).count() === 0)
    // corruption arms: wrong magic byte, unknown schema id (valid datum!),
    // and a frame shorter than the envelope — all route, none throw
    val cases = t.limit(1).select(
      serde.error(concat(unhex(lit("01")), expr("substring(framed, 2)"))).as("bad_magic"),
      serde.error(Serdes.SchemaRegistry.frame(99, col("raw"))).as("unknown_id"),
      serde.error(unhex(lit("0000000007"))).as("short_frame"),
      serde.error(col("framed")).as("ok")).head()
    assert(cases.getString(0) === "avro_decode_failure")
    assert(cases.getString(1) === "avro_decode_failure")
    assert(cases.getString(2) === "avro_decode_failure")
    assert(cases.isNullAt(3))
    t.unpersist()
    // subject → id lookup is real: an unregistered subject fails fast
    assertThrows[IllegalArgumentException](
      new Serdes.RegistryAvroEventSerde(Serdes.SchemaRegistry.Fixture, "nope-value"))
  }

  test("truncated datums decode to null and route to the DLQ; clean rows decode") {
    NativeHash.register(spark)
    val t = Serdes.avroTopic(events)
      .withColumn("raw", when(col("offset") % 97 === 0,
        substring(col("raw"), 1, 1)).otherwise(col("raw")))
    val split = graft.operators.TopicOps
      .dlqSplit(t, Serdes.AvroEventSerde.error(col("raw"))).cache()
    val dlq = split.filter(col("sink") === "dlq")
    assert(dlq.count() === split.filter(col("offset") % 97 === 0).count())
    assert(dlq.filter(col("error") =!= "avro_decode_failure").count() === 0)
    val clean = split.filter(col("sink") === "clean")
    assert(clean.filter(Serdes.AvroEventSerde.struct(col("raw")).isNull).count() === 0)
    split.unpersist()
  }

  test("strict decode ABORTS on the first corrupt datum (reference default contract)") {
    NativeHash.register(spark)
    val t = Serdes.avroTopic(events)
      .withColumn("raw", when(col("offset") % 97 === 0,
        substring(col("raw"), 1, 1)).otherwise(col("raw")))
    val strict = graft.operators.TopicOps
      .strictDecode(t, Serdes.AvroEventSerde.error(col("raw")))
    assertThrows[Exception](strict.count())
  }

  test("avro KEY serde: framed long keys round-trip; bad magic / truncated varint / " +
      "trailing bytes are routable key errors; key errors outrank value errors and hit tombstones") {
    NativeHash.register(spark)
    val serde = Serdes.registryAvroKeySerde()
    val datum = call_function("graft_avro_encode_key", col("key").cast("bigint"))
    val t = graft.sources.Topics.events(spark, sf)
      .withColumn("key_raw", serde.frame(datum)).cache()
    // round-trip identity over every record, tombstones included
    assert(t.filter(serde.keyDec(col("key_raw")) =!= col("key").cast("bigint")).count() === 0)
    assert(t.filter(serde.error(col("key_raw")).isNotNull).count() === 0)
    // corruption arms: bare datum (bad magic), framed truncated varint,
    // framed datum with trailing junk — all routable, none throw
    val cases = t.limit(1).select(
      serde.error(datum).as("bare_datum"),
      serde.error(serde.frame(unhex(lit("FF")))).as("truncated_varint"),
      serde.error(serde.frame(concat(datum, unhex(lit("00"))))).as("trailing_bytes"),
      serde.error(col("key_raw")).as("ok")).head()
    assert(cases.getString(0) === "key_decode_failure")
    assert(cases.getString(1) === "key_decode_failure")
    assert(cases.getString(2) === "key_decode_failure")
    assert(cases.isNullAt(3))
    // every key corrupted (bare datum): records whose value ALSO errors
    // must still report the KEY error (outranks), and tombstones — which
    // have no value error at all — must route on the key error alone
    val allCorrupt = t.withColumn("key_raw", datum)
    val split = graft.operators.TopicOps.dlqSplit(
      allCorrupt,
      when(col("value").isNotNull, "value_error"),
      serde.error(col("key_raw"))).cache()
    assert(split.filter(col("value").isNull).count() > 0)
    assert(split.filter(col("sink") =!= "dlq").count() === 0)
    assert(split.filter(col("error") =!= "key_decode_failure").count() === 0,
      "key errors must outrank value errors and apply to tombstones")
    split.unpersist(); t.unpersist()
    // subject → id lookup is real here too
    assertThrows[IllegalArgumentException](
      new Serdes.RegistryAvroKeySerde(Serdes.SchemaRegistry.Fixture, "nope-key"))
  }

  test("avro datum bytes are schema-stable: re-decoding with a fresh reader agrees") {
    // guards against accidental per-session encoder state: the same value
    // always encodes to the same bytes (deterministic layout)
    val a = AvroEventImpl.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString("view"),
      java.lang.Integer.valueOf(7), 99L)
    val b = AvroEventImpl.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString("view"),
      java.lang.Integer.valueOf(7), 99L)
    assert(java.util.Arrays.equals(a, b))
  }
}
