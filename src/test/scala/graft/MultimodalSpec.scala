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
    // an UNKNOWN chunk declaring size >= 2^31: the unsigned size would
    // truncate to a negative step and hang the walk forever if it
    // weren't bounds-checked before advancing (r8 hardening)
    val huge = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    huge.put("RIFF".getBytes("US-ASCII")).putInt(16).put("WAVE".getBytes("US-ASCII"))
    huge.put("JUNK".getBytes("US-ASCII")).putInt(0xfffffff8)
    assert(WavImpl.parse(huge.array()) === null)
    assert(WavPayload.payload(huge.array()) === null)
  }

  test("WAV resample: hand-computed decimation on a known payload, corpus counts " +
      "and rate agree with the parsed header, malformed input is null") {
    import graft.functions.{WavImpl, WavResampleImpl}
    val payload = "0123456789abcdefghij".getBytes("UTF-8") // 20 B, ba=4 → 5 frames
    val blob = WavImpl.wrap(payload, 8000, 2, 16)
    val got = WavResampleImpl.compute(blob, 2) // frames 0, 2, 4
    val M = 1000000007L
    var expected = 0L
    for (f <- Seq(0, 2, 4); k <- 0 until 4)
      expected = (expected * 31L + (payload(f * 4 + k) & 0xffL)) % M
    assert(got != null)
    assert(got.getLong(0) === 4000L && got.getLong(1) === 2L)
    assert(got.getLong(2) === 16L && got.getLong(3) === 4L)
    assert(got.getLong(4) === 5L && got.getLong(5) === 3L)
    assert(got.getLong(6) === expected)
    assert(WavResampleImpl.compute(Array[Byte](1, 2), 4L) == null)
    assert(WavResampleImpl.compute(blob, 0L) == null)
    // corpus-wide: counts and rate derive exactly from the parsed header
    val rs = Multimodal.audioResample(docs)
    val meta = Multimodal.wavMeta(docs)
      .select(col("doc_id"), col("sample_rate"), col("n_frames"))
    val j = rs.join(meta, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("n_frames_in") =!= col("n_frames")).count() === 0)
    assert(j.filter(col("n_frames_out") =!= expr("(n_frames_in + 3) div 4"))
      .count() === 0)
    assert(j.filter(col("rate_out") =!= expr("sample_rate div 4")).count() === 0)
  }

  test("BMP wrap emits a byte-valid 24-bpp bitmap (independent reader); parse " +
      "round-trips it and the pixel hash equals a direct tiled fold") {
    import graft.functions.BmpImpl
    val data = "pixel payload bytes".getBytes("UTF-8")
    val (w, h) = (5L, 3L) // stride: 5*3=15 → pads to 16
    val bmp = BmpImpl.wrap(data, w, h)
    val st = 16
    assert(bmp.length === 54 + st * 3)
    val bb = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.get() === 'B'.toByte); assert(bb.get() === 'M'.toByte)
    assert(bb.getInt === 54 + st * 3) // file size
    assert(bb.getInt === 0) // reserved
    assert(bb.getInt === 54) // data offset
    assert(bb.getInt === 40) // info header size
    assert(bb.getInt === 5); assert(bb.getInt === 3) // width, height
    assert(bb.getShort === 1); assert(bb.getShort === 24) // planes, bpp
    assert(bb.getInt === 0) // BI_RGB
    assert(bb.getInt === st * 3) // image size
    bb.getInt; bb.getInt; bb.getInt; bb.getInt // dpi + palette fields
    // pixel rows: 15 payload-tiled bytes then 1 zero pad byte per row
    for (row <- 0 until 3; x <- 0 until 15)
      assert(bmp(54 + row * st + x) === data((row * 15 + x) % data.length),
        s"pixel byte row=$row x=$x")
    for (row <- 0 until 3)
      assert(bmp(54 + row * st + 15) === 0, s"pad byte row=$row")

    val hdr = BmpImpl.parse(bmp)
    assert(hdr != null)
    // [file_size, data_offset, header_size, width, height, planes, bpp,
    //  compression, image_size, row_stride, n_pixel_bytes, pixel_hash]
    assert(hdr.toLongArray().take(11).toSeq ===
      Seq(54L + st * 3, 54L, 40L, 5L, 3L, 1L, 24L, 0L, st * 3L, st.toLong, 45L))
    // reference fold over the tiled (unpadded) pixel stream
    var ref = 0L
    for (i <- 0 until 45)
      ref = (ref * 31L + (data(i % data.length) & 0xffL)) % 1000000007L
    assert(hdr.getLong(11) === ref)
    // decoded payload strips the padding and re-tiles the source
    val pix = graft.functions.BmpPixels.payload(bmp)
    assert(pix.length === 45)
    assert(pix.toSeq === (0 until 45).map(i => data(i % data.length)).toSeq)
    // empty payload → all-zero pixels, hash 0
    val empty = BmpImpl.parse(BmpImpl.wrap(Array.emptyByteArray, 4L, 2L))
    assert(empty.getLong(11) === 0L)
  }

  test("BMP resize: hand-computed nearest-neighbor picks on a known payload, " +
      "corpus thumbnails carry the source dims, malformed input is null") {
    import graft.functions.{BmpImpl, BmpResizeImpl}
    val payload = "abcdefghijklmnop".getBytes("UTF-8")
    val (w, h, t) = (16L, 20L, 8L)
    val blob = BmpImpl.wrap(payload, w, h)
    // independent reimplementation of the pick: byte (r,c,k) =
    // payload[((r·h div t)·3w + (c·w div t)·3 + k) mod n]
    val M = 1000000007L
    var expected = 0L
    for (r <- 0L until t; c <- 0L until t; k <- 0L until 3L) {
      val idx = ((r * h / t) * (w * 3) + (c * w / t) * 3 + k) % payload.length
      expected = (expected * 31L + (payload(idx.toInt) & 0xffL)) % M
    }
    val got = BmpResizeImpl.compute(blob, t)
    assert(got != null)
    assert(got.getLong(0) === t && got.getLong(1) === t)
    assert(got.getLong(2) === 3 * t * t)
    assert(got.getLong(3) === w && got.getLong(4) === h)
    assert(got.getLong(5) === expected)
    // malformed / out-of-profile inputs are null, never a throw
    assert(BmpResizeImpl.compute(Array[Byte](1, 2, 3), t) == null)
    assert(BmpResizeImpl.compute(blob, 0L) == null)
    assert(BmpResizeImpl.compute(blob.take(60), t) == null)
    // corpus-wide: every thumbnail is 8×8×3 bytes and carries the same
    // source dims bmpMeta parses from the container
    val rz = Multimodal.bmpResize(docs)
    val meta = Multimodal.bmpMeta(docs)
      .select(col("doc_id"), col("width"), col("height"))
    val joined = rz.join(meta, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("out_w") =!= 8 || col("out_h") =!= 8 ||
      col("n_pixel_bytes") =!= 192).count() === 0)
    assert(joined.filter(col("src_w") =!= col("width") ||
      col("src_h") =!= col("height")).count() === 0)
  }

  test("malformed BMPs parse to null, never throw: garbage, truncation, " +
      "unsupported profile") {
    import graft.functions.BmpImpl
    val good = BmpImpl.wrap("abc".getBytes("UTF-8"), 4L, 2L)
    assert(BmpImpl.parse(null) === null)
    assert(BmpImpl.parse(Array[Byte](1, 2, 3)) === null)
    assert(BmpImpl.parse("not a bitmap at all, just bytes padding 54+"
      .getBytes("UTF-8")) === null)
    assert(BmpImpl.parse(good.take(40)) === null, "truncated header")
    assert(BmpImpl.parse(good.take(60)) === null, "truncated pixel array")
    val badBpp = good.clone(); badBpp(28) = 8 // 8-bpp (palette) profile
    assert(BmpImpl.parse(badBpp) === null)
    val badCompress = good.clone(); badCompress(30) = 1 // BI_RLE8
    assert(BmpImpl.parse(badCompress) === null)
  }

  test("bmpMeta parse == meta declare: the real container carries exactly the " +
      "declared dimensions, and mm_decode image checksums come from pixels") {
    val bm = Multimodal.bmpMeta(docs).cache()
    val m = Multimodal.meta(docs).filter(col("format") === "image").cache()
    assert(bm.count() === m.count())
    val joined = bm.join(m.select(col("doc_id"),
      col("width").as("decl_w"), col("height").as("decl_h")), "doc_id")
    assert(joined.filter(col("width") =!= col("decl_w")).count() === 0)
    assert(joined.filter(col("height") =!= col("decl_h")).count() === 0)
    // layout invariants the oracle replays by formula
    assert(bm.filter(col("file_size") =!= col("bmp_bytes")).count() === 0)
    assert(bm.filter(col("row_stride") % 4 =!= 0).count() === 0)
    assert(bm.filter(col("image_size") =!= col("row_stride") * col("height")).count() === 0)
    bm.unpersist(); m.unpersist()
  }

  test("AVI wrap emits a byte-valid RIFF tree (independent reader); parse " +
      "round-trips it and the all-frames pixel hash equals a direct tiled fold") {
    import graft.functions.AviImpl
    val data = "video pixel payload".getBytes("UTF-8")
    val (w, h, n) = (5L, 3L, 2L) // stride 16, frame 48 bytes
    val avi = AviImpl.wrap(data, w, h, n)
    assert(avi.length === AviImpl.containerBytes(w, h, n))
    val bb = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
    def tag4() = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    assert(tag4() === "RIFF"); assert(bb.getInt === avi.length - 8)
    assert(tag4() === "AVI ")
    assert(tag4() === "LIST"); assert(bb.getInt === 192); assert(tag4() === "hdrl")
    assert(tag4() === "avih"); assert(bb.getInt === 56)
    assert(bb.getInt === 40000) // us/frame (25 fps)
    bb.getInt; bb.getInt // max bytes/sec, padding
    assert(bb.getInt === 0x10) // AVIF_HASINDEX
    assert(bb.getInt === 2) // total frames
    bb.getInt // initial frames
    assert(bb.getInt === 1) // streams
    bb.getInt // suggested buffer
    assert(bb.getInt === 5); assert(bb.getInt === 3) // width, height
    bb.position(bb.position() + 16) // reserved
    assert(tag4() === "LIST"); assert(bb.getInt === 116); assert(tag4() === "strl")
    assert(tag4() === "strh"); assert(bb.getInt === 56)
    assert(tag4() === "vids"); assert(tag4() === "DIB ")
    bb.position(12 + 200) // movi LIST header
    assert(tag4() === "LIST"); assert(bb.getInt === 4 + 2 * (8 + 48))
    assert(tag4() === "movi")
    // frame chunks: '00db' + 48 padded pixel bytes each, payload tiled
    // CONTIGUOUSLY across frames (frame 1 continues where frame 0 ended)
    for (f <- 0 until 2) {
      assert(tag4() === "00db"); assert(bb.getInt === 48)
      val base = bb.position()
      for (row <- 0 until 3; x <- 0 until 15) {
        val i = f * 45 + row * 15 + x
        assert(avi(base + row * 16 + x) === data(i % data.length), s"f=$f row=$row x=$x")
      }
      bb.position(base + 48)
    }
    assert(tag4() === "idx1"); assert(bb.getInt === 32)
    assert(tag4() === "00db"); assert(bb.getInt === 0x10) // keyframe flag
    val off0 = bb.getInt; assert(bb.getInt === 48)
    assert(off0 === 4, "first frame offset is relative to the movi fourcc")

    val hdr = AviImpl.parse(avi)
    assert(hdr != null)
    // [riff_size, us_per_frame, total_frames, width, height, n_streams,
    //  row_stride, frame_pixel_bytes, movi_frames, idx_entries,
    //  n_pixel_bytes, pixel_hash]
    assert(hdr.toLongArray().take(11).toSeq ===
      Seq(avi.length - 8L, 40000L, 2L, 5L, 3L, 1L, 16L, 48L, 2L, 2L, 90L))
    var ref = 0L
    for (i <- 0 until 90)
      ref = (ref * 31L + (data(i % data.length) & 0xffL)) % 1000000007L
    assert(hdr.getLong(11) === ref)
  }

  test("malformed AVIs parse to null, never throw: garbage, truncation, " +
      "frame/index mismatches, unsupported profile") {
    import graft.functions.AviImpl
    val good = AviImpl.wrap("abc".getBytes("UTF-8"), 4L, 2L, 2L)
    assert(AviImpl.parse(null) === null)
    assert(AviImpl.parse(Array[Byte](1, 2, 3)) === null)
    assert(AviImpl.parse("RIFFxxxxNOPE".getBytes("US-ASCII")) === null)
    assert(AviImpl.parse(good.take(100)) === null, "truncated header tree")
    assert(AviImpl.parse(good.dropRight(10)) === null, "truncated idx1")
    // declared frame count disagreeing with the movi chunks: avih body
    // starts at 32 (12 RIFF + 12 LIST hdrl + 8 avih header), total_frames
    // at body+16
    val badCount = good.clone(); badCount(48) = 3
    assert(AviImpl.parse(badCount) === null)
    // 8-bpp strf profile: strf body at 172 (12 + 12 + 64 avih + 12 strl
    // + 64 strh + 8 strf header), bpp at body+14
    val badBpp = good.clone(); badBpp(186) = 8
    assert(AviImpl.parse(badBpp) === null)
    // adversarial LIST nesting deeper than any real AVI tree: must hit
    // the depth cap and return null, never overflow the stack
    val deep = ByteBuffer.allocate(12 + 64 * 12).order(ByteOrder.LITTLE_ENDIAN)
    deep.put("RIFF".getBytes("US-ASCII")).putInt(4 + 64 * 12)
    deep.put("AVI ".getBytes("US-ASCII"))
    for (lvl <- 0 until 64) {
      deep.put("LIST".getBytes("US-ASCII"))
      deep.putInt(4 + (63 - lvl) * 12)
      deep.put("xxxx".getBytes("US-ASCII"))
    }
    assert(AviImpl.parse(deep.array()) === null)
  }

  test("aviMeta parse == meta declare on n_frames; layout invariants hold") {
    val am = Multimodal.aviMeta(docs).cache()
    val m = Multimodal.meta(docs).filter(col("format") === "video").cache()
    assert(am.count() === m.count())
    val joined = am.join(m.select(col("doc_id"), col("n_frames")), "doc_id")
    assert(joined.filter(col("total_frames") =!= col("n_frames")).count() === 0,
      "declared n_frames must equal the container's parsed frame count")
    assert(am.filter(col("movi_frames") =!= col("total_frames") ||
      col("idx_entries") =!= col("total_frames")).count() === 0)
    assert(am.filter(col("row_stride") % 4 =!= 0).count() === 0)
    assert(am.filter(col("riff_size") + 8 =!= col("avi_bytes")).count() === 0)
    assert(am.filter(col("n_pixel_bytes") =!=
      col("width") * 3 * col("height") * col("total_frames")).count() === 0)
    am.unpersist(); m.unpersist()
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

  test("audio fingerprint: level-invariant 15-bit energy-delta signature, short " +
      "and malformed inputs null, corpus covers every audio doc") {
    import graft.functions.{WavFingerprintImpl, WavImpl}
    val base = ("a nontrivial audio payload with enough bytes to cut into sixteen " +
      "windows of several frames each, plus change").getBytes("UTF-8")
    val fp = WavFingerprintImpl.compute(WavImpl.wrap(base, 8000L, 1L, 8L))
    assert(fp !== null)
    assert(fp.getLong(0) === 8000L && fp.getLong(1) === base.length.toLong)
    assert(fp.getLong(3) >= 0L && fp.getLong(3) < (1L << 15), "15 bits, sign-free")
    // constant level shift: every equal-size window's energy moves the
    // same amount ⇒ the delta bits are unchanged, total moves by n·shift
    val shifted = WavFingerprintImpl.compute(
      WavImpl.wrap(base.map(b => (b + 7).toByte), 8000L, 1L, 8L))
    assert(shifted.getLong(3) === fp.getLong(3), "fingerprint must survive the shift")
    assert(shifted.getLong(4) === fp.getLong(4) + 7L * 16L * fp.getLong(2))
    // a different payload fingerprints differently
    val other = WavFingerprintImpl.compute(
      WavImpl.wrap(base.reverse, 8000L, 1L, 8L))
    assert(other.getLong(3) != fp.getLong(3))
    // too short to window / malformed → null, never a throw
    assert(WavFingerprintImpl.compute(WavImpl.wrap("tiny".getBytes, 8000L, 1L, 8L)) === null)
    assert(WavFingerprintImpl.compute(null) === null)
    assert(WavFingerprintImpl.compute(Array[Byte](1, 2, 3)) === null)
    // corpus pass: one row per audio doc (nulls ride along, never dropped)
    val out = Multimodal.audioFingerprint(docs)
    assert(out.count() === docs.filter(col("doc_id") % 3 === 1).count())
  }

  test("video phash strip: one row per declared frame, per-frame brightness " +
      "invariance (shared ahash core), malformed nulls") {
    import graft.functions.{AviImpl, AviPhashImpl}
    val base = "frame payload bytes for a tiny strip test!".getBytes("UTF-8")
    val (w, h, n) = (10L, 9L, 4L)
    val strip = AviPhashImpl.compute(AviImpl.wrap(base, w, h, n))
    assert(strip !== null)
    assert(strip.numElements() === n.toInt)
    for (f <- 0 until n.toInt) {
      val row = strip.getArray(f)
      assert(row.getLong(0) === f.toLong, "frame_idx in order")
      for (i <- 2 to 3) assert(row.getLong(i) >= 0L && row.getLong(i) < (1L << 32))
    }
    // +9 brightness on every payload byte: every frame's hash unchanged
    val strip2 = AviPhashImpl.compute(AviImpl.wrap(base.map(b => (b + 9).toByte), w, h, n))
    for (f <- 0 until n.toInt) {
      assert(strip2.getArray(f).getLong(2) === strip.getArray(f).getLong(2) &&
        strip2.getArray(f).getLong(3) === strip.getArray(f).getLong(3),
        s"frame $f aHash must survive the shift")
      assert(strip2.getArray(f).getLong(1) === strip.getArray(f).getLong(1) + 9)
    }
    // different frames of a non-repeating payload genuinely differ
    assert((0 until n.toInt).map(f =>
      (strip.getArray(f).getLong(2), strip.getArray(f).getLong(3))).distinct.size > 1)
    // malformed → null, never a throw
    assert(AviPhashImpl.compute(null) === null)
    assert(AviPhashImpl.compute(Array[Byte](1, 2, 3)) === null)
    assert(AviPhashImpl.compute(AviImpl.wrap(base, w, h, n).take(60)) === null)
    // corpus pass: row count per video == meta's declared n_frames
    val strips = Multimodal.aviPhash(docs).cache()
    val meta = Multimodal.meta(docs).filter(col("format") === "video")
      .select(col("doc_id"), col("n_frames"))
    assert(strips.groupBy(col("doc_id")).count()
      .join(meta, "doc_id").filter(col("count") =!= col("n_frames")).count() === 0)
    assert(strips.filter(col("frame_idx") >= 16L).count() === 0, "n_frames caps at 16")
    strips.unpersist()
  }

  test("phash: brightness-shift invariant, byte-identity NOT required, halves stay " +
      "in [0, 2^32), malformed input nulls, dup groups count every member") {
    import graft.functions.{BmpImpl, BmpPhashImpl}
    val base = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val (w, h) = (17L, 9L)
    val ph = BmpPhashImpl.compute(BmpImpl.wrap(base, w, h))
    assert(ph !== null)
    assert(ph.getLong(0) === w && ph.getLong(1) === h)
    for (i <- 3 to 4)
      assert(ph.getLong(i) >= 0L && ph.getLong(i) < (1L << 32), s"half $i sign-free")
    // constant brightness shift (no clipping: ASCII stays < 246): every
    // luma and the mean move together, so the fingerprint is UNCHANGED
    // while the exact pixel hash moves — the perceptual property
    val brighter = base.map(b => (b + 9).toByte)
    val ph2 = BmpPhashImpl.compute(BmpImpl.wrap(brighter, w, h))
    assert(ph2.getLong(3) === ph.getLong(3) && ph2.getLong(4) === ph.getLong(4),
      "aHash must survive a constant brightness shift")
    assert(ph2.getLong(2) === ph.getLong(2) + 9, "mean moves with the shift")
    assert(BmpImpl.parse(BmpImpl.wrap(brighter, w, h)).getLong(11) !==
      BmpImpl.parse(BmpImpl.wrap(base, w, h)).getLong(11),
      "the exact pixel hash must NOT survive it")
    // a different image hashes differently
    val other = "a completely different pixel payload with other bytes!".getBytes("UTF-8")
    val ph3 = BmpPhashImpl.compute(BmpImpl.wrap(other, w, h))
    assert(ph3.getLong(3) != ph.getLong(3) || ph3.getLong(4) != ph.getLong(4))
    // malformed → null, never a throw
    assert(BmpPhashImpl.compute(null) === null)
    assert(BmpPhashImpl.compute(Array[Byte](1, 2, 3)) === null)
    assert(BmpPhashImpl.compute(BmpImpl.wrap(base, w, h).take(53)) === null)
    // corpus pass: every image row appears once, n_same sums to the row
    // count (each member counts its whole group)
    val out = Multimodal.bmpPhash(docs).cache()
    val images = docs.filter(col("doc_id") % 3 === 0).count()
    assert(out.count() === images)
    assert(out.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(countDistinct(col("n_same")).as("k")).filter(col("k") =!= 1).count() === 0)
    out.unpersist()
  }

  test("PNG codec: lossless roundtrip reproduces the tiled polyhash closed " +
      "form; malformed bytes are a value (None), never a throw") {
    import graft.functions.PngCodec
    val data = "the quick brown fox".getBytes("UTF-8")
    val (w, h) = (7, 5)
    val png = PngCodec.encodeTiled(data, w, h)
    assert(png.length > 8 && (png(1) & 0xff) == 'P'.toInt, "must be a real PNG")
    val Some((dw, dh, hash)) = PngCodec.decodeHash(png)
    assert(dw == w && dh == h)
    // closed form: polyhash over the payload tiled to w*3*h bytes
    val M = graft.functions.TextFunctions.HashMod
    var expect = 0L
    for (i <- 0 until w * 3 * h) expect = (expect * 31 + (data(i % data.length) & 0xff)) % M
    assert(hash == expect)
    // malformed arms: truncation, garbage, null
    assert(PngCodec.decodeHash(java.util.Arrays.copyOf(png, 16)).isEmpty)
    assert(PngCodec.decodeHash(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(PngCodec.decodeHash(null).isEmpty)
  }

  test("pngDecode: the (doc_id % 7 == 3) truncation arm nulls every " +
      "decode-derived column while clean rows decode with the BMP-formula hash") {
    val out = Multimodal.pngDecode(spark, Tables.load(spark, sf, "documents")).cache()
    val bad = out.filter(col("doc_id") % 7 === 3)
    assert(bad.count() > 0, "fixture must exercise the malformed arm")
    assert(bad.filter(col("pixel_hash").isNotNull || col("width").isNotNull ||
      col("decode_ok") =!= 0L).count() === 0)
    val good = out.filter(col("doc_id") % 7 =!= 3)
    assert(good.count() > 0)
    assert(good.filter(col("pixel_hash").isNull || col("decode_ok") =!= 1L).count() === 0)
    out.unpersist()
  }

  test("codec headers: a crafted PNG IHDR / JPEG SOF declaring huge " +
      "dimensions is rejected BEFORE decode allocates (None, no OOM, no throw)") {
    import graft.functions.{JpegCodec, PngCodec}
    val data = "payload for the crafted header arm".getBytes("UTF-8")
    // PNG: width lives at offset 16 (big-endian 32-bit), height at 20
    val png = PngCodec.encodeTiled(data, 7, 5)
    val hugePng = png.clone()
    hugePng(16) = 0x7f.toByte; hugePng(17) = 0xff.toByte // w = 2^31-ish
    hugePng(20) = 0x7f.toByte; hugePng(21) = 0xff.toByte
    assert(PngCodec.decodeHash(hugePng).isEmpty)
    // JPEG: find the SOF0 segment and patch its declared h/w fields
    val jpg = JpegCodec.encodeTiled(data, 7, 5)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < jpg.length) {
      if ((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0) sof = i
      else i += 1
    }
    assert(sof > 0, "encoder must emit a baseline SOF0")
    val hugeJpg = jpg.clone()
    hugeJpg(sof + 5) = 0x7f.toByte; hugeJpg(sof + 6) = 0xff.toByte // h
    hugeJpg(sof + 7) = 0x7f.toByte; hugeJpg(sof + 8) = 0xff.toByte // w
    assert(JpegCodec.decodeHash(hugeJpg).isEmpty)

    // the AREA budget (r11 ADVICE): per-dimension caps alone admit
    // 16384×16384 ≈ 1 GiB of raster — each side legal, the product not.
    // 16384·16384 > MaxPixels must reject; a legal-area header with one
    // large side must still reach the decoder (and fail there on the
    // mismatched entropy stream, not on the guard — None either way, but
    // the small 2047×977 (< 2M px) control below proves the budget line
    // sits where documented)
    val areaPng = png.clone()
    // 32-bit BE dims: offsets 16..19 w, 20..23 h — both set to 16384
    for ((o, v) <- Seq(16 -> 0x00, 17 -> 0x00, 18 -> 0x40, 19 -> 0x00,
                       20 -> 0x00, 21 -> 0x00, 22 -> 0x40, 23 -> 0x00))
      areaPng(o) = v.toByte
    assert(java.nio.ByteBuffer.wrap(areaPng, 16, 4).getInt == 16384,
      "fixture patch sanity")
    assert(PngCodec.decodeHash(areaPng).isEmpty,
      "16384x16384 is within per-dim caps but must trip the pixel budget")
    val areaJpg = jpg.clone()
    areaJpg(sof + 5) = 0x40.toByte; areaJpg(sof + 6) = 0x00.toByte // h = 16384
    areaJpg(sof + 7) = 0x40.toByte; areaJpg(sof + 8) = 0x00.toByte // w = 16384
    assert(JpegCodec.decodeHash(areaJpg).isEmpty,
      "16384x16384 is within per-dim caps but must trip the pixel budget")
    val okJpg = jpg.clone()
    okJpg(sof + 5) = 0x03.toByte; okJpg(sof + 6) = 0xd1.toByte // h = 977
    okJpg(sof + 7) = 0x07.toByte; okJpg(sof + 8) = 0xff.toByte // w = 2047
    // 2047·977 < 2M: passes the guard (no false rejection below the
    // line) — ImageIO then decodes at the patched dims (it pads the
    // short entropy stream), which proves the budget is the ONLY new gate
    assert(JpegCodec.decodeHash(okJpg).exists(t => t._1 == 2047 && t._2 == 977),
      "a below-budget header must reach the decoder")
  }

  test("MJPEG: wrap->walk->decode round trip — frame payloads survive the " +
      "container byte-for-byte, per-frame reconstruction stays in the JPEG " +
      "bound, malformed containers are null, and the corpus rows gate the " +
      "exact face") {
    import graft.functions.{AviImpl, JpegCodec, PngCodec}
    val data = ("Motion JPEG frames tile the payload contiguously across " +
      "the video, 0123456789 lorem ipsum dolor sit amet").getBytes("UTF-8")
    val (w, h, n) = (24, 16, 3)
    val frames = graft.operators.Multimodal.mjpegFrames(data, w, h, n)
    val avi = AviImpl.wrapMjpeg(frames, w, h)
    // the walk returns exactly the encoder's bytes — the container adds
    // structure, never touches the payload
    val back = AviImpl.mjpegFrames(avi)
    assert(back != null && back.length == n)
    (frames zip back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes must survive the container")
    }
    // per-frame reconstruction bound — the same lossy contract as the
    // still-JPEG spec, frame f's source raster tiling the payload from
    // byte f*w*3*h
    for ((jpg, f) <- back.zipWithIndex) {
      val dec = JpegCodec.decodeRaster(jpg).get
      assert(dec.getWidth == w && dec.getHeight == h)
      val rot = {
        val k = (f * w * 3 * h) % data.length
        val r = new Array[Byte](data.length)
        System.arraycopy(data, k, r, 0, data.length - k)
        System.arraycopy(data, 0, r, data.length - k, k)
        r
      }
      val src = PngCodec.tiledImage(rot, w, h)
      var maxErr = 0L; var sumErr = 0L; var cnt = 0L
      for (y <- 0 until h; x <- 0 until w; s <- Seq(16, 8, 0)) {
        val e = math.abs(((src.getRGB(x, y) >> s) & 0xff) - ((dec.getRGB(x, y) >> s) & 0xff))
        maxErr = math.max(maxErr, e); sumErr += e; cnt += 1
      }
      assert(maxErr <= 128, s"frame $f max error $maxErr exceeds the lossy bound")
      assert(sumErr.toDouble / cnt <= 40.0, s"frame $f mean error exceeds the lossy bound")
      assert(sumErr > 0, "a lossless MJPEG frame means the codec was bypassed")
    }
    // malformed arms: truncation, a declared chunk size past the parent
    // bound (unsigned-truncation guard), and a non-MJPG profile all
    // return null — a value, never a throw or a hang
    assert(AviImpl.mjpegFrames(java.util.Arrays.copyOf(avi, 64)) == null)
    val badSize = avi.clone()
    // first '00dc' chunk begins right after the 232-byte header + LIST
    // movi preamble; its size field sits at header+4 of the chunk
    val firstChunk = 12 + 200 + 12 // RIFF hdr + hdrl LIST + movi LIST hdr
    assert(new String(badSize, firstChunk, 4, "US-ASCII") == "00dc")
    badSize(firstChunk + 4) = 0xff.toByte; badSize(firstChunk + 5) = 0xff.toByte
    badSize(firstChunk + 6) = 0xff.toByte; badSize(firstChunk + 7) = 0xff.toByte
    assert(AviImpl.mjpegFrames(badSize) == null)
    val uncompressed = AviImpl.wrap(data, w, h, n)
    assert(AviImpl.mjpegFrames(uncompressed) == null,
      "the '00db' profile must not pass the MJPG walk")

    // corpus gate shape: every video doc decodes (or nulls on the
    // truncation arm) with the declared geometry
    val docs = Tables.load(spark, sf, "documents")
    val out = graft.operators.Multimodal.mjpegDecode(spark, docs).cache()
    assert(out.filter(col("doc_id") % 3 =!= 2).count() === 0)
    val trunc = out.filter(col("doc_id") % 7 === 3)
    assert(trunc.filter(col("decode_ok") =!= 0L || col("n_frames").isNotNull).count() === 0)
    val good = out.filter(col("doc_id") % 7 =!= 3)
    assert(good.filter(col("decode_ok") =!= 1L || col("n_frames").isNull).count() === 0)
    assert(good.filter(col("n_pixel_bytes") =!=
      col("width") * 3 * col("height") * col("n_frames")).count() === 0)
    out.unpersist()
  }

  test("JPEG codec: lossy roundtrip keeps dims exact and per-pixel error " +
      "bounded (the honest lossy contract); malformed bytes are None, never a throw") {
    import graft.functions.{JpegCodec, PngCodec}
    val data = ("The quick brown fox jumps over the lazy dog 0123456789 " +
      "lorem ipsum dolor sit amet, consectetur adipiscing elit").getBytes("UTF-8")
    for ((w, h) <- Seq((16, 36), (48, 33))) {
      val src = PngCodec.tiledImage(data, w, h)
      val jpg = JpegCodec.encodeTiled(data, w, h)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "must be a real JPEG")
      val dec = JpegCodec.decodeRaster(jpg).get
      assert(dec.getWidth == w && dec.getHeight == h, "SOF dims survive quantization")
      var maxErr = 0L; var sumErr = 0L; var n = 0L
      for (y <- 0 until h; x <- 0 until w; s <- Seq(16, 8, 0)) {
        val e = math.abs(((src.getRGB(x, y) >> s) & 0xff) - ((dec.getRGB(x, y) >> s) & 0xff))
        maxErr = math.max(maxErr, e); sumErr += e; n += 1
      }
      // measured on the ASCII tiling at default writer quality: max ≈ 99,
      // mean ≈ 20 — the pinned contract leaves honest margin, and a
      // quality regression (or an accidental identity "codec") trips it
      assert(maxErr <= 128, s"max per-channel error $maxErr exceeds the lossy bound")
      assert(sumErr.toDouble / n <= 40.0, "mean per-channel error exceeds the lossy bound")
      assert(sumErr > 0, "a truly lossless JPEG means the codec was bypassed")
    }
    val jpg = JpegCodec.encodeTiled(data, 16, 36)
    assert(JpegCodec.decodeHash(java.util.Arrays.copyOf(jpg, 16)).isEmpty)
    assert(JpegCodec.decodeHash(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(JpegCodec.decodeHash(null).isEmpty)
    // determinism of the ungated fold: same bytes → same hash
    assert(JpegCodec.decodeHash(jpg) == JpegCodec.decodeHash(jpg.clone()))
  }

  test("jpegDecode: truncation arm nulls the decode-derived columns; clean " +
      "rows carry exact dims and decode_ok = 1") {
    val out = Multimodal.jpegDecode(spark, Tables.load(spark, sf, "documents")).cache()
    val bad = out.filter(col("doc_id") % 7 === 3)
    assert(bad.count() > 0, "fixture must exercise the malformed arm")
    assert(bad.filter(col("width").isNotNull || col("n_pixel_bytes").isNotNull ||
      col("decode_ok") =!= 0L).count() === 0)
    val good = out.filter(col("doc_id") % 7 =!= 3)
    assert(good.count() > 0)
    assert(good.filter(col("width").isNull || col("decode_ok") =!= 1L ||
      col("n_pixel_bytes") =!= col("width") * 3 * col("height")).count() === 0)
    out.unpersist()
  }

  test("WavUlawImpl: byte-for-byte agreement with the JDK's own G.711 " +
      "mu-law converter on every non-clipped sample; above the CCITT clip " +
      "the JDK wraps (overflow) while ours clips — pinned exactly") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // all 65536 16-bit samples, little-endian PCM_SIGNED mono
    val n = 65536
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = i - 32768
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val srcFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val dstFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), srcFmt, n.toLong)
    val conv = AudioSystem.getAudioInputStream(dstFmt, src)
    val jdk = conv.readAllBytes()
    assert(jdk.length == n)
    var inRangeMismatches = 0
    var clippedMismatches = 0
    i = 0
    while (i < n) {
      val s = i - 32768
      val ours = graft.functions.WavUlawImpl.encode(s)
      if (ours != (jdk(i) & 0xff)) {
        if (math.abs(s) <= 32635) inRangeMismatches += 1
        else clippedMismatches += 1
      }
      i += 1
    }
    assert(inRangeMismatches == 0,
      s"$inRangeMismatches non-clipped mu-law codes differ from the JDK G.711 encoder")
    // |s| > 32635: the CCITT reference clips to the top segment (ours);
    // the JDK adds the bias UNCLIPPED, its 15-bit segment lookup wraps,
    // and full-scale samples come back as near-zero codes — a known
    // fidelity quirk we deliberately do NOT reproduce. Pin the
    // divergence to exactly that range (132 positive + 133 negative).
    assert(clippedMismatches == 265,
      s"clipped-range divergence changed: $clippedMismatches (expected 265)")
  }

  test("WavUlawImpl: companding fixed point (dec-enc idempotent), error " +
      "bound over the full range, clip arm, and malformed-container nulls") {
    import graft.functions.WavUlawImpl.{decode, encode}
    var x = -32768
    var maxErr = 0L
    while (x < 32768) {
      val d = decode(encode(x))
      // dec(enc(x)) is a fixed point: re-companding reproduces it exactly
      assert(decode(encode(d)) == d, s"not idempotent at $x")
      // reconstruction error: <= half the segment step for in-range
      // samples, worst at the clip ceiling (|x| > 32635 -> 644)
      maxErr = math.max(maxErr, math.abs(d.toLong - x))
      x += 1
    }
    assert(maxErr <= 644L, s"max reconstruction error $maxErr exceeds G.711 bound")
    // malformed containers degrade to null, never a throw
    assert(graft.functions.WavUlawImpl.compute(Array[Byte](1, 2, 3)) == null)
    val wav = WavImpl.wrap("abcdef".getBytes("US-ASCII"), 8000, 1, 16)
    assert(graft.functions.WavUlawImpl.compute(
      java.util.Arrays.copyOf(wav, 20)) == null)
    assert(graft.functions.WavUlawImpl.compute(wav) != null)
  }

  test("ulawRoundtrip: every fixture row decodes (no nulls on the audio " +
      "arm), n_samples matches the declared geometry, and the error stays " +
      "in the G.711 bound") {
    val out = Multimodal.ulawRoundtrip(Tables.load(spark, sf, "documents")).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_samples").isNull).count() === 0)
    assert(out.filter(col("max_abs_err") > 644L).count() === 0)
    // 8-bit: one sample per byte; 16-bit: floor(bytes/2) (ragged tail dropped)
    val geo = Multimodal.ulawRoundtrip(Tables.load(spark, sf, "documents"))
      .join(Tables.load(spark, sf, "documents").select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("len")), "doc_id")
    assert(geo.filter(
      (col("bits_per_sample") === 8 && col("n_samples") =!= col("len")) ||
      (col("bits_per_sample") === 16 && col("n_samples") =!= expr("len DIV 2")))
      .count() === 0)
    out.unpersist()
  }
}
