package graft.functions

import java.io.ByteArrayOutputStream

import scala.util.control.NonFatal

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro value serde for the topic record model — the pluggable-serde
  * surface of the reference (MixedValue.kt:30's delegate Deserializer;
  * Factory.kt:103-110 wires KafkaAvroDeserializer behind CLI flags, and
  * the README positions Avro DLQ work as the primary use).
  *
  * The container has no schema registry and no spark-avro module, so the
  * codec is built directly on avro-core (on the classpath): a fixed
  * writer-schema `GraftEvent` record, raw binary datum encoding (what a
  * registry-backed deployment would carry after the 5-byte envelope).
  * Both directions are single-JVM-call expressions; decode failure yields
  * NULL so it can feed the strict (assert) or DLQ (route) paths exactly
  * like the string serde's decode-error column.
  */
object AvroEventImpl {
  val SchemaJson: String =
    """{"type":"record","name":"GraftEvent","namespace":"graft","fields":[
      |{"name":"event_type","type":"string"},
      |{"name":"k","type":["null","int"],"default":null},
      |{"name":"user_id","type":"long"}]}""".stripMargin

  lazy val schema: Schema = new Schema.Parser().parse(SchemaJson)

  val sparkType: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = false),
    StructField("k", IntegerType, nullable = true),
    StructField("user_id", LongType, nullable = false)))

  private val writer = ThreadLocal.withInitial[GenericDatumWriter[GenericRecord]](
    () => new GenericDatumWriter[GenericRecord](schema))
  private val reader = ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](
    () => new GenericDatumReader[GenericRecord](schema))

  def encode(eventType: UTF8String, k: Any, userId: Long): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("event_type", eventType.toString)
    rec.put("k", if (k == null) null else k.asInstanceOf[java.lang.Integer])
    rec.put("user_id", java.lang.Long.valueOf(userId))
    val out = new ByteArrayOutputStream(32)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    writer.get().write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** null ⇔ the bytes do not decode as a GraftEvent (truncated/corrupt) —
    * the condition that aborts the reference pipeline by default and
    * routes to the DLQ in the routing variant.
    */
  def decode(bytes: Array[Byte]): InternalRow =
    try {
      val dec = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, null)
      val rec = reader.get().read(null, dec)
      val k = rec.get("k")
      InternalRow(
        UTF8String.fromString(rec.get("event_type").toString),
        if (k == null) null else k.asInstanceOf[java.lang.Integer],
        rec.get("user_id").asInstanceOf[java.lang.Long])
    } catch { case NonFatal(_) => null }
}

/** Avro KEY codec — the key-side delegate of the reference's serde seam
  * (Factory.kt:59-61: keys ride their OWN Avro deserializer, wired by the
  * `-A`/avroKeyDeserializer flag, separate from the value's). The key
  * datum is a plain Avro `long` (zigzag varint) — the natural key schema
  * for the numeric user-id keys of the events topic. Decode rejects a
  * truncated varint AND trailing bytes (a key datum is exactly one long;
  * leftover bytes mean the payload was never a long key), yielding null —
  * the routable key_decode_failure, never a throw.
  */
object AvroLongImpl {
  /** Schema JSON as a registry entry ("long" primitive). */
  val SchemaJson: String = "\"long\""

  def encode(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(10)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    enc.writeLong(v)
    enc.flush()
    out.toByteArray
  }

  /** null ⇔ not exactly one well-formed varint long. */
  def decode(bytes: Array[Byte]): java.lang.Long =
    try {
      val dec = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, null)
      val v = dec.readLong()
      if (dec.isEnd) java.lang.Long.valueOf(v) else null
    } catch { case NonFatal(_) => null }
}

/** bigint key → Avro long binary datum (null key stays null — a keyless
  * record is valid; the serde's error column only fires on non-null
  * bytes that fail to decode).
  */
case class AvroEncodeLong(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_encode_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avro_encode_key expects a bigint key, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AvroLongImpl.encode(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): AvroEncodeLong =
    copy(child = newChild)
}

/** Avro long binary datum → bigint, null on decode failure (truncated
  * varint, >10-byte varint, or trailing bytes). Note Avro's readLong
  * ACCEPTS non-canonical zigzag encodings up to 10 bytes (0x80 0x00
  * decodes to 0) — only genuinely unreadable payloads null out
  * (round-6 ADVICE: don't overpromise rejection of overlong forms).
  */
case class AvroDecodeLong(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_decode_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avro_decode_key expects a binary datum, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AvroLongImpl.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeLong =
    copy(child = newChild)
}

/** (event_type, k, user_id) → Avro binary datum. k is the nullable union
  * branch, so null k encodes (it is data), while a null event_type/user_id
  * nulls the result (they are required fields).
  */
case class AvroEncodeEvent(children: Seq[Expression])
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_encode"

  /** Clean analysis-time errors: wrong arity would otherwise die with
    * IndexOutOfBoundsException and a mistyped k with a per-row
    * ClassCastException on the executor.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 3)
      TypeCheckResult.TypeCheckFailure(
        s"graft_avro_encode expects (event_type string, k int, user_id bigint); got ${children.length} arguments")
    else if (children(0).dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"event_type must be string, got ${children(0).dataType.sql}")
    else if (children(1).dataType != IntegerType && children(1).dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"k must be int (nullable union branch), got ${children(1).dataType.sql}")
    else if (children(2).dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"user_id must be bigint, got ${children(2).dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val et = children(0).eval(input)
    val uid = children(2).eval(input)
    if (et == null || uid == null) return null
    AvroEventImpl.encode(et.asInstanceOf[UTF8String],
      children(1).eval(input), uid.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AvroEncodeEvent =
    copy(children = newChildren)
}

/** Avro binary datum → struct<event_type,k,user_id>, null on decode
  * failure. Deterministic, so whole-stage codegen's common-subexpression
  * elimination folds the per-field GetStructField references into one
  * decode call per row.
  */
case class AvroDecodeEvent(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = AvroEventImpl.sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avro_decode expects a binary datum, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AvroEventImpl.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeEvent =
    copy(child = newChild)
}
