package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native WAV/RIFF container support — the one media format trivial
  * enough to build AND parse byte-exactly with no codec library, which
  * turns the multimodal decode path from a stub into a real, integer-
  * exact, oracle-checkable stage (round-7 VERDICT task #8):
  *
  *   - `graft_wav_wrap(data, rate, ch, bits)` emits a canonical 44-byte
  *     RIFF/WAVE header (fmt + data chunks, little-endian) around a
  *     payload — a genuine playable container, asserted byte-for-byte
  *     against an independent ByteBuffer reader in MultimodalSpec;
  *   - `graft_wav_meta(blob)` walks the chunk list like a real reader
  *     (arbitrary chunk order, unknown chunks skipped via their declared
  *     size, RIFF even-byte padding honored) and returns the header
  *     fields, or NULL for anything malformed — never a throw, so a
  *     corrupt blob degrades like a bad Avro datum (strict-decode DLQ
  *     pattern), not a job failure.
  *
  * Both are codegen'd single JVM calls (CodegenFallback would break the
  * surrounding whole-stage pipeline). All fields are integers, so the
  * wrap→parse round trip is bit-identical to the DuckDB oracle's formula
  * replay (PipelineQueries `mm_decode` / `mm_wav_meta`).
  */
object WavImpl {

  /** Parsed-header field order — the shared contract of `graft_wav_meta`,
    * the mm_wav_meta oracle SQL, and MultimodalSpec:
    * [riff_size, fmt_size, audio_format, channels, sample_rate,
    *  byte_rate, block_align, bits_per_sample, data_len, n_frames].
    */
  val Fields = 10

  def wrap(data: Array[Byte], rate: Long, ch: Long, bits: Long): Array[Byte] = {
    require(rate > 0 && ch > 0 && bits > 0 && bits % 8 == 0,
      s"graft_wav_wrap: invalid format params rate=$rate ch=$ch bits=$bits")
    // Upper bounds mirror BmpImpl/AviImpl.wrap: every field must fit its
    // header slot, or toInt/toShort silently truncate and emit a
    // structurally valid but corrupt header (rate = 2^32 + 8000 would
    // round-trip as 8000; round-8 ADVICE). byte_rate is the binding u32.
    require(ch <= Short.MaxValue && bits <= Short.MaxValue &&
      rate <= Int.MaxValue && rate * ch * bits / 8 <= Int.MaxValue &&
      ch * bits / 8 <= Short.MaxValue,
      s"graft_wav_wrap: format params overflow header fields rate=$rate ch=$ch bits=$bits")
    val out = new Array[Byte](44 + data.length)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + data.length) // chunk sizes exclude the 8-byte chunk header
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16) // PCM fmt chunk body
    bb.putShort(1) // audio_format = PCM
    bb.putShort(ch.toShort)
    bb.putInt(rate.toInt)
    bb.putInt((rate * ch * bits / 8).toInt) // byte_rate
    bb.putShort((ch * bits / 8).toShort) // block_align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(data.length)
    bb.put(data)
    out
  }

  private def u16(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Chunk-walking parse; null (not an exception) on anything malformed. */
  def parse(blob: Array[Byte]): ArrayData = {
    if (blob == null || blob.length < 12) return null
    if (tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE") return null
    val riffSize = u32(blob, 4)
    var pos = 12
    var fmtSize = -1L
    var audioFormat = 0L
    var channels = 0L
    var rate = 0L
    var byteRate = 0L
    var blockAlign = 0L
    var bits = 0L
    var dataLen = -1L
    while (pos + 8 <= blob.length) {
      val id = tag(blob, pos)
      val size = u32(blob, pos + 4)
      val body = pos + 8
      // EVERY declared size is bounds-checked BEFORE the walk advances:
      // an unknown chunk claiming size >= 2^31 would otherwise truncate
      // to a negative step and loop the walk forever (hung executor, not
      // even a throw)
      if (body + size > blob.length) return null
      if (id == "fmt ") {
        if (size < 16) return null
        fmtSize = size
        audioFormat = u16(blob, body)
        channels = u16(blob, body + 2)
        rate = u32(blob, body + 4)
        byteRate = u32(blob, body + 8)
        blockAlign = u16(blob, body + 12)
        bits = u16(blob, body + 14)
      } else if (id == "data") {
        dataLen = size
      }
      // unknown chunks are skipped by declared size; RIFF pads chunk
      // bodies to even byte counts
      pos = body + size.toInt + (size & 1L).toInt
    }
    if (fmtSize < 0 || dataLen < 0 || blockAlign <= 0) return null
    new GenericArrayData(Array[Long](
      riffSize, fmtSize, audioFormat, channels, rate,
      byteRate, blockAlign, bits, dataLen, dataLen / blockAlign))
  }
}

/** See [[WavImpl]]. */
object WavPayload {
  /** Extracts the data-chunk bytes (the "samples") by the same chunk
    * walk as [[WavImpl.parse]]; null when malformed. JVM-side decode
    * companion for the batched mapPartitions path.
    */
  def payload(blob: Array[Byte]): Array[Byte] = {
    if (blob == null || blob.length < 12) return null
    if (new String(blob, 0, 4, "US-ASCII") != "RIFF" ||
        new String(blob, 8, 4, "US-ASCII") != "WAVE") return null
    var pos = 12
    while (pos + 8 <= blob.length) {
      val id = new String(blob, pos, 4, "US-ASCII")
      val size = ((blob(pos + 4) & 0xffL) | ((blob(pos + 5) & 0xffL) << 8) |
        ((blob(pos + 6) & 0xffL) << 16) | ((blob(pos + 7) & 0xffL) << 24))
      val body = pos + 8
      // bounds-check every declared size before advancing (see parse)
      if (body + size > blob.length) return null
      if (id == "data")
        return java.util.Arrays.copyOfRange(blob, body, body + size.toInt)
      pos = body + size.toInt + (size & 1L).toInt
    }
    null
  }
}

/** (data binary, sample_rate, channels, bits_per_sample) → WAV bytes. */
case class WavWrap(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_wrap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType &&
        Seq(second, third, fourth).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_wav_wrap expects (binary, bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(data: Any, rate: Any, ch: Any, bits: Any): Any =
    WavImpl.wrap(data.asInstanceOf[Array[Byte]], rate.asInstanceOf[Long],
      ch.asInstanceOf[Long], bits.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, r, c, b) =>
      s"graft.functions.WavImpl.wrap($d, $r, $c, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): WavWrap =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** WAV bytes → header field array (see [[WavImpl.Fields]]); null when the
  * container is malformed.
  */
case class WavMeta(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_meta expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WavImpl.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavImpl.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

/** blob → [rate_out, channels, bits_per_sample, block_align,
  * n_frames_in, n_frames_out, sample_hash] — integer DECIMATION of a
  * genuine WAV by factor d (the audio analogue of mm_resize's
  * nearest-neighbor pick and mm_framesample's frame stride): every d-th
  * sample FRAME (block_align bytes) of the decoded data chunk survives,
  * the hash folds the picked bytes in order, and the declared rate
  * divides by d. Header and payload come through the SAME bounds-checked
  * chunk walks as graft_wav_meta; malformed → null, never a throw.
  */
case class WavResample(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_resample"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_resample expects (binary, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))

  override protected def nullSafeEval(blob: Any, d: Any): Any =
    WavResampleImpl.compute(blob.asInstanceOf[Array[Byte]], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, d) => s"""
      ${ev.value} = graft.functions.WavResampleImpl.compute($b, $d);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavResample =
    copy(left = newLeft, right = newRight)
}

object WavResampleImpl {
  /** [rate_out, channels, bits_per_sample, block_align, n_frames_in,
    * n_frames_out, sample_hash]
    */
  val Fields = 7
  private val M = TextFunctions.HashMod

  def compute(blob: Array[Byte], d: Long): ArrayData = {
    if (d <= 0 || d > 1000000) return null
    val hdr = WavImpl.parse(blob)
    if (hdr == null) return null
    val data = WavPayload.payload(blob)
    if (data == null) return null
    val ch = hdr.getLong(3)
    val rate = hdr.getLong(4)
    val bits = hdr.getLong(7)
    val ba = hdr.getLong(6).toInt
    if (rate < d) return null // decimating below 1 Hz is a caller bug
    val nIn = data.length / ba
    var hash = 0L
    var f = 0L
    var out = 0L
    while (f < nIn) {
      val base = (f * ba).toInt
      var k = 0
      while (k < ba) {
        hash = (hash * 31L + (data(base + k) & 0xffL)) % M
        k += 1
      }
      out += 1
      f += d
    }
    new GenericArrayData(Array[Long](rate / d, ch, bits, ba, nIn, out, hash))
  }
}

/** blob → [sample_rate, n_frames, window_frames, fingerprint, energy_total]
  * — 15-bit ENERGY-DELTA audio fingerprint (the Shazam-style sign-of-
  * derivative idea in its integer skeleton): the decoded data chunk is
  * cut into 16 equal windows of n_frames div 16 frames (the ragged tail
  * is ignored so windows stay equal), each window's energy is the
  * integer sum of its unsigned sample bytes, and bit i (MSB-first) is
  * 1 iff energy(i+1) > energy(i). Comparisons survive any monotone
  * per-byte amplitude map — a constant gain/offset shifts every equal-
  * size window's energy identically, so the fingerprint is level-
  * invariant the way aHash is brightness-invariant. 15 bits ⇒ always
  * non-negative (sign-free grouping/banding). Null when malformed or
  * too short to window (n_frames < 16); never a throw.
  */
case class WavFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_fingerprint expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WavFingerprintImpl.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavFingerprintImpl.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavFingerprint =
    copy(child = newChild)
}

object WavFingerprintImpl {
  /** [sample_rate, n_frames, window_frames, fingerprint, energy_total] */
  val Fields = 5
  val Windows = 16

  def compute(blob: Array[Byte]): ArrayData = {
    val hdr = WavImpl.parse(blob)
    if (hdr == null) return null
    val data = WavPayload.payload(blob)
    if (data == null) return null
    val ba = hdr.getLong(6).toInt
    val rate = hdr.getLong(4)
    val nFrames = data.length / ba
    if (nFrames < Windows) return null
    val wf = nFrames / Windows
    val energies = new Array[Long](Windows)
    var total = 0L
    var wi = 0
    while (wi < Windows) {
      var e = 0L
      var b = wi * wf * ba
      val end = (wi + 1) * wf * ba
      while (b < end) { e += (data(b) & 0xffL); b += 1 }
      energies(wi) = e
      total += e
      wi += 1
    }
    var fp = 0L
    var i = 0
    while (i < Windows - 1) {
      fp = fp * 2 + (if (energies(i + 1) > energies(i)) 1L else 0L)
      i += 1
    }
    new GenericArrayData(Array[Long](rate, nFrames, wf, fp, total))
  }
}

/** blob → [channels, bits_per_sample, n_samples, ulaw_hash, decoded_hash,
  * max_abs_err] — G.711 μ-law companding ROUNDTRIP of a genuine WAV's
  * sample stream: every linear sample is encoded to its 8-bit μ-law code
  * (ITU-T G.711: sign + 3-bit segment + 4-bit mantissa over a biased
  * logarithmic ladder) and decoded back; the op emits the encoded-byte
  * hash, the reconstructed-sample hash, and the worst reconstruction
  * error. The audio-CODEC data point of the decode-seam family
  * (mm_decode_png lossless / mm_decode_jpeg lossy-opaque / this one
  * LOSSY-BUT-CLOSED-FORM — G.711 is a published integer formula, so
  * unlike JPEG the full roundtrip is oracle-replayable, encoded bytes
  * included). 8-bit sources promote u8 → s16 ((b−128)·256, the standard
  * lift); 16-bit sources read little-endian signed; a ragged trailing
  * byte under 16-bit is ignored (floor). Header/payload ride the same
  * bounds-checked chunk walks as graft_wav_meta: malformed → null,
  * never a throw. MultimodalSpec cross-checks the encoder byte-for-byte
  * against the JDK's own G.711 converter (javax.sound.sampled ULAW)
  * and pins the companding fixed point dec∘enc∘dec∘enc = dec∘enc.
  */
case class WavUlaw(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_ulaw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_ulaw expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WavUlawImpl.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavUlawImpl.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavUlaw =
    copy(child = newChild)
}

object WavUlawImpl {
  /** [channels, bits_per_sample, n_samples, ulaw_hash, decoded_hash,
    * max_abs_err]
    */
  val Fields = 6
  private val M = TextFunctions.HashMod
  private val Bias = 0x84
  private val Clip = 32635

  /** s16 linear → 8-bit μ-law code (G.711). Segment = position of the
    * highest set bit of the biased magnitude within bits 7..14 — the
    * classic 256-entry LUT is exactly bitlength((mag+BIAS) >> 7) − 1,
    * which is how the DuckDB oracle replays it (length(bin(x)) − 1).
    */
  def encode(pcm: Int): Int = {
    var x = pcm
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > Clip) x = Clip
    x += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  /** 8-bit μ-law code → s16 linear (G.711 segment midpoint ladder). */
  def decode(u: Int): Int = {
    val v = (~u) & 0xff
    val exp = (v >> 4) & 0x07
    val mant = v & 0x0f
    val t = (((mant << 3) + Bias) << exp) - Bias
    if ((v & 0x80) != 0) -t else t
  }

  def compute(blob: Array[Byte]): ArrayData = {
    val hdr = WavImpl.parse(blob)
    if (hdr == null) return null
    val data = WavPayload.payload(blob)
    if (data == null) return null
    val ch = hdr.getLong(3)
    val bits = hdr.getLong(7)
    if (bits != 8 && bits != 16) return null
    val step = (bits / 8).toInt
    val n = data.length / step
    var uHash = 0L
    var dHash = 0L
    var maxErr = 0L
    var i = 0
    while (i < n) {
      val lin =
        if (step == 1) ((data(i) & 0xff) - 128) << 8
        else ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)) // sign via byte
      val u = encode(lin)
      val dec = decode(u)
      uHash = (uHash * 31L + u) % M
      dHash = (dHash * 31L + (dec & 0xffff)) % M
      val err = math.abs(dec.toLong - lin.toLong)
      if (err > maxErr) maxErr = err
      i += 1
    }
    new GenericArrayData(Array[Long](ch, bits, n, uHash, dHash, maxErr))
  }
}
