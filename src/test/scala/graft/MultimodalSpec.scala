package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.functions.{WavImpl, WavPayload}
import graft.operators.Multimodal
import graft.sources.Tables

/** WAV/RIFF container support: byte-level validity of the builder
  * (independent ByteBuffer reader), chunk-walk robustness of the parser
  * (reordering, unknown chunks, padding, truncation), and agreement
  * between the expression face (wavMeta) and the mapPartitions decode.
  */
class MultimodalSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("wrap emits a byte-valid canonical PCM container (independent reader)") {
    val data = "hello wav payload".getBytes("UTF-8")
    val wav = WavImpl.wrap(data, rate = 16000, ch = 2, bits = 16)
    assert(wav.length === 44 + data.length)
    val bb = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    def tag4() = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    assert(tag4() === "RIFF")
    assert(bb.getInt === 36 + data.length)
    assert(tag4() === "WAVE")
    assert(tag4() === "fmt ")
    assert(bb.getInt === 16)
    assert(bb.getShort === 1) // PCM
    assert(bb.getShort === 2) // channels
    assert(bb.getInt === 16000)
    assert(bb.getInt === 16000 * 2 * 16 / 8) // byte_rate
    assert(bb.getShort === (2 * 16 / 8).toShort) // block_align
    assert(bb.getShort === 16)
    assert(tag4() === "data")
    assert(bb.getInt === data.length)
    val body = new Array[Byte](data.length)
    bb.get(body)
    assert(body.toSeq === data.toSeq)
  }

  test("parse round-trips the wrap and survives a chunk walk with unknown chunks, " +
      "odd-size padding, and reordered data") {
    val data = "abc".getBytes("UTF-8")
    val hdr = WavImpl.parse(WavImpl.wrap(data, 8000, 1, 8))
    assert(hdr != null)
    assert(hdr.toLongArray().toSeq ===
      Seq(36L + 3, 16L, 1L, 1L, 8000L, 8000L, 1L, 8L, 3L, 3L))

    // hand-build: RIFF [ LIST(5, odd → 1 pad byte) | data | fmt ] —
    // reordered chunks and an unknown odd-length chunk the walker must
    // skip via declared size + padding
    val list = Array[Byte]('x', 'y', 'z', 'w', 'v')
    val out = ByteBuffer.allocate(12 + (8 + 6) + (8 + 3 + 1) + (8 + 16))
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(out.capacity - 8)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("LIST".getBytes("US-ASCII")).putInt(5).put(list).put(0.toByte)
    out.put("data".getBytes("US-ASCII")).putInt(3).put(data).put(0.toByte)
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    val reordered = WavImpl.parse(out.array())
    assert(reordered != null, "chunk-walking parser must handle any chunk order")
    assert(reordered.toLongArray().toSeq.drop(1) ===
      Seq(16L, 1L, 1L, 8000L, 8000L, 1L, 8L, 3L, 3L))
    assert(WavPayload.payload(out.array()).toSeq === data.toSeq)
  }

  test("malformed containers parse to null, never throw: garbage, truncation, " +
      "missing chunks, zero block_align") {
    assert(WavImpl.parse(null) === null)
    assert(WavImpl.parse(Array[Byte](1, 2, 3)) === null)
    assert(WavImpl.parse("not a riff file at all........".getBytes) === null)
    val good = WavImpl.wrap("payload".getBytes, 8000, 1, 8)
    assert(WavImpl.parse(good) != null)
    // truncate mid-data: declared size overruns the blob
    assert(WavImpl.parse(java.util.Arrays.copyOfRange(good, 0, good.length - 3)) === null)
    // no fmt/data chunks at all
    val bare = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    bare.put("RIFF".getBytes("US-ASCII")).putInt(4).put("WAVE".getBytes("US-ASCII"))
    assert(WavImpl.parse(bare.array()) === null)
    // zero block_align (division guard)
    val zba = good.clone()
    zba(32) = 0; zba(33) = 0
    assert(WavImpl.parse(zba) === null)
    assert(WavPayload.payload(Array[Byte](1)) === null)
  }

  test("wavMeta expression face agrees with the mapPartitions decode on every " +
      "shared field (one container semantics, two surfaces)") {
    val viaExpr = Multimodal.wavMeta(docs)
      .select("doc_id", "channels", "sample_rate", "bits_per_sample",
        "data_len", "n_frames")
    val viaDecode = Multimodal.decodeFeatures(spark, Multimodal.asBlobs(docs)).toDF()
      .filter(col("format") === "audio")
      .select("doc_id", "channels", "sample_rate", "bits_per_sample",
        "data_len", "n_frames")
    assert(viaExpr.except(viaDecode).count() === 0)
    assert(viaDecode.except(viaExpr).count() === 0)
    assert(viaExpr.count() > 0)
  }

  test("wavMeta recovers the generation parameters exactly (wrap→parse round trip) " +
      "and the parser sees the real 44-byte layout") {
    val got = Multimodal.wavMeta(docs).cache()
    assert(got.filter(col("audio_format") =!= 1L || col("fmt_size") =!= 16L).count() === 0)
    assert(got.filter(col("wav_bytes") =!= col("data_len") + 44).count() === 0)
    assert(got.filter(col("riff_size") =!= col("data_len") + 36).count() === 0)
    assert(got.filter(col("byte_rate") =!=
      col("sample_rate") * col("channels") * col("bits_per_sample") / 8).count() === 0)
    assert(got.filter(!col("sample_rate").isin(8000L, 16000L, 24000L, 32000L)).count() === 0)
    // both channel counts and both bit depths occur in the fixture
    assert(got.select("channels").distinct().count() === 2)
    assert(got.select("bits_per_sample").distinct().count() === 2)
    got.unpersist()
  }
}
