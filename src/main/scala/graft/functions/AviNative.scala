package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native AVI container support — the video completion of the
  * WAV ([[WavImpl]]) / BMP ([[BmpImpl]]) family: a minimal VALID
  * uncompressed AVI (RIFF 'AVI ' with hdrl/avih, strl/strh+strf, movi
  * with '00db' DIB frames, and an idx1 keyframe index) is buildable and
  * parseable with no codec library, which makes the VIDEO decode path
  * genuine too — frames are raw bottom-up 24-bpp pixel rows exactly like
  * [[BmpImpl]]'s (4-byte stride), tiling the payload CONTIGUOUSLY across
  * frames so the all-frames pixel hash keeps the same tiled-polyhash
  * closed form the BMP oracle replays (total = w·3·h·n_frames).
  *
  *   - `graft_avi_wrap(data, width, height, n_frames)` emits the
  *     canonical fixed-layout container (25 fps, one 'vids'/'DIB '
  *     stream; layout asserted byte-for-byte by an independent reader
  *     in MultimodalSpec);
  *   - `graft_avi_meta(blob)` walks the RIFF tree like a real reader
  *     (LIST recursion by declared sizes, unknown chunks skipped,
  *     '00db' frames counted, idx1 entries counted, frame geometry
  *     bounds-checked) and folds the polyhash of the UNPADDED pixel
  *     bytes across all frames in order; NULL for anything malformed,
  *     never a throw.
  *
  * Both are codegen'd single JVM calls. All fields are integers, so the
  * wrap→parse round trip is formula-replayable (`mm_avi_meta`,
  * `mm_decode` video rows).
  */
object AviImpl {

  /** Parsed field order — shared by `graft_avi_meta`, the mm_avi_meta
    * oracle SQL, and MultimodalSpec:
    * [riff_size, us_per_frame, total_frames, width, height, n_streams,
    *  row_stride, frame_pixel_bytes, movi_frames, idx_entries,
    *  n_pixel_bytes, pixel_hash].
    */
  val Fields = 12

  val UsPerFrame = 40000L // 25 fps, fixed for the canonical profile

  private val M = TextFunctions.HashMod

  def stride(w: Long): Long = ((w * 3 + 3) / 4) * 4

  /** Container size by construction: 12 (RIFF hdr) + 200 (hdrl LIST)
    * + 12 (movi LIST hdr) + n·(8 + stride·h) (frames) + 8 + 16·n (idx1).
    */
  def containerBytes(w: Long, h: Long, n: Long): Long =
    232 + n * (24 + stride(w) * h)

  def wrap(data: Array[Byte], w: Long, h: Long, nFrames: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096 && nFrames > 0 && nFrames <= 4096,
      s"graft_avi_wrap: invalid geometry ${w}x$h x$nFrames")
    require(containerBytes(w, h, nFrames) <= Int.MaxValue,
      s"graft_avi_wrap: container for ${w}x$h x$nFrames exceeds 2 GiB")
    val st = stride(w).toInt
    val fp = st * h.toInt // padded frame bytes
    val n = nFrames.toInt
    val total = containerBytes(w, h, nFrames).toInt
    val out = new Array[Byte](total)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    tag("RIFF"); bb.putInt(total - 8); tag("AVI ")
    // LIST hdrl (size = 4 + 64 + 124 = 192)
    tag("LIST"); bb.putInt(192); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(UsPerFrame.toInt) // us per frame
    bb.putInt(fp * 25) // max bytes/sec
    bb.putInt(0) // padding granularity
    bb.putInt(0x10) // AVIF_HASINDEX
    bb.putInt(n) // total frames
    bb.putInt(0) // initial frames
    bb.putInt(1) // streams
    bb.putInt(fp) // suggested buffer
    bb.putInt(w.toInt); bb.putInt(h.toInt)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // reserved
    // LIST strl (size = 4 + 64 + 48 = 116)
    tag("LIST"); bb.putInt(116); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("DIB ")
    bb.putInt(0); bb.putShort(0); bb.putShort(0) // flags, priority, language
    bb.putInt(0) // initial frames
    bb.putInt(1); bb.putInt(25) // scale, rate -> 25 fps
    bb.putInt(0) // start
    bb.putInt(n) // length in frames
    bb.putInt(fp) // suggested buffer
    bb.putInt(-1) // quality (default)
    bb.putInt(0) // sample size (varies)
    bb.putShort(0); bb.putShort(0) // rcFrame left, top
    bb.putShort(w.toShort); bb.putShort(h.toShort) // rcFrame right, bottom
    tag("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(w.toInt); bb.putInt(h.toInt)
    bb.putShort(1); bb.putShort(24) // planes, bpp
    bb.putInt(0); bb.putInt(fp) // BI_RGB, image size
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    // LIST movi
    tag("LIST"); bb.putInt(4 + n * (8 + fp)); tag("movi")
    val rowBytes = (w * 3).toInt
    val len = data.length
    var src = 0
    val frameOffsets = new Array[Int](n)
    var f = 0
    while (f < n) {
      frameOffsets(f) = bb.position()
      tag("00db"); bb.putInt(fp)
      val base = bb.position()
      var row = 0
      while (row < h) {
        var x = 0
        while (x < rowBytes) {
          out(base + row * st + x) = if (len == 0) 0 else data(src % len)
          src += 1
          x += 1
        }
        row += 1
      }
      bb.position(base + fp) // stride padding stays zero
      f += 1
    }
    // idx1: offsets are relative to the start of the movi LIST type tag
    val moviType = 12 + 200 + 8 // position of the 'movi' fourcc
    tag("idx1"); bb.putInt(16 * n)
    f = 0
    while (f < n) {
      tag("00db"); bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(frameOffsets(f) - moviType)
      bb.putInt(fp)
      f += 1
    }
    out
  }

  /** 'MJPG' as the little-endian biCompression / fccHandler u32. */
  val MjpgFourcc: Long =
    ('M' & 0xffL) | (('J' & 0xffL) << 8) | (('P' & 0xffL) << 16) | (('G' & 0xffL) << 24)

  /** MJPEG container size: header block is [[wrap]]'s 232 bytes; each
    * frame chunk is 8 + its JPEG length (even-padded) and each idx1
    * entry 16.
    */
  def mjpegContainerBytes(frames: Array[Array[Byte]]): Long =
    232L + frames.map(f => 8L + f.length + (f.length & 1) + 16L).sum

  /** The MJPEG twin of [[wrap]] (round-11 VERDICT #3: video through the
    * LOSSY seam): the same canonical RIFF skeleton, but the stream is
    * 'MJPG'-compressed — each '00dc' chunk body is a caller-supplied
    * REAL JPEG (the [[JpegCodec]] encoder output), frame sizes vary, odd
    * sizes take the RIFF even-pad byte. Because the JPEG bytes are
    * encoder-defined, no pixel-hash closed form exists (the
    * [[JpegCodec]] contract); the container GEOMETRY stays exact and
    * oracle-gated.
    */
  def wrapMjpeg(frames: Array[Array[Byte]], w: Long, h: Long): Array[Byte] = {
    val n = frames.length
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096 && n > 0 && n <= 4096,
      s"graft wrapMjpeg: invalid geometry ${w}x$h x$n")
    val total = mjpegContainerBytes(frames)
    require(total <= Int.MaxValue, s"graft wrapMjpeg: container exceeds 2 GiB")
    val padded = frames.map(f => f.length + (f.length & 1))
    val maxBuf = padded.max
    val out = new Array[Byte](total.toInt)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    tag("RIFF"); bb.putInt(total.toInt - 8); tag("AVI ")
    tag("LIST"); bb.putInt(192); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(UsPerFrame.toInt)
    bb.putInt(maxBuf * 25) // max bytes/sec
    bb.putInt(0)
    bb.putInt(0x10) // AVIF_HASINDEX
    bb.putInt(n)
    bb.putInt(0)
    bb.putInt(1)
    bb.putInt(maxBuf) // suggested buffer
    bb.putInt(w.toInt); bb.putInt(h.toInt)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    tag("LIST"); bb.putInt(116); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("MJPG")
    bb.putInt(0); bb.putShort(0); bb.putShort(0)
    bb.putInt(0)
    bb.putInt(1); bb.putInt(25)
    bb.putInt(0)
    bb.putInt(n)
    bb.putInt(maxBuf)
    bb.putInt(-1)
    bb.putInt(0)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    tag("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(w.toInt); bb.putInt(h.toInt)
    bb.putShort(1); bb.putShort(24)
    bb.putInt(MjpgFourcc.toInt) // biCompression = 'MJPG'
    bb.putInt(maxBuf) // image size (max frame)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    tag("LIST"); bb.putInt(4 + padded.map(_ + 8).sum); tag("movi")
    val moviType = 12 + 200 + 8
    val frameOffsets = new Array[Int](n)
    var f = 0
    while (f < n) {
      frameOffsets(f) = bb.position()
      tag("00dc"); bb.putInt(frames(f).length)
      bb.put(frames(f))
      if ((frames(f).length & 1) == 1) bb.put(0.toByte) // RIFF even pad
      f += 1
    }
    tag("idx1"); bb.putInt(16 * n)
    f = 0
    while (f < n) {
      tag("00dc"); bb.putInt(0x10)
      bb.putInt(frameOffsets(f) - moviType)
      bb.putInt(frames(f).length)
      f += 1
    }
    out
  }

  /** Walk an MJPEG AVI and return its '00dc' frame payloads (each a
    * JPEG for the codec seam to decode), or null when anything is
    * malformed: wrong magic, non-'MJPG' strf, any declared chunk size
    * past its parent bound (the unsigned-truncation guard — sizes read
    * as u32 and bounds-checked BEFORE the walk advances), LIST depth
    * past 16, or frame counts disagreeing between avih, the movi walk
    * and idx1. Null, never a throw or a hang — the container-kernel
    * contract.
    */
  def mjpegFrames(blob: Array[Byte]): Array[Array[Byte]] = {
    if (blob == null || blob.length < 12) return null
    if (tagAt(blob, 0) != "RIFF" || tagAt(blob, 8) != "AVI ") return null
    var totalFrames = -1L
    var width = -1L
    var height = -1L
    var idxEntries = -1L
    var sawMjpg = false
    var ok = true
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walkFrames(start: Int, end: Int): Unit = {
      var pos = start
      while (ok && pos + 8 <= end) {
        val id = tagAt(blob, pos)
        val size = u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) { ok = false; return }
        if (id == "00dc")
          frames += java.util.Arrays.copyOfRange(blob, body, (body + size).toInt)
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) { ok = false; return }
      var pos = start
      while (ok && pos + 8 <= end) {
        val id = tagAt(blob, pos)
        val size = u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) { ok = false; return }
        if (id == "LIST") {
          if (size < 4) { ok = false; return }
          val listType = tagAt(blob, body)
          if (listType == "movi") walkFrames(body + 4, (body + size).toInt)
          else walk(body + 4, (body + size).toInt, depth + 1)
        } else if (id == "avih") {
          if (size < 56) { ok = false; return }
          totalFrames = u32(blob, body + 16)
          width = u32(blob, body + 32)
          height = u32(blob, body + 36)
        } else if (id == "strf") {
          if (size < 40) { ok = false; return }
          sawMjpg = u32(blob, body + 16) == MjpgFourcc
        } else if (id == "idx1") {
          if (size % 16 != 0) { ok = false; return }
          idxEntries = size / 16
        }
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    walk(12, blob.length, 0)
    if (!ok || !sawMjpg || totalFrames <= 0 || width <= 0 || height <= 0 ||
        frames.length != totalFrames || idxEntries != totalFrames)
      return null
    frames.toArray
  }

  private[functions] def u16(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8)
  private[functions] def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private[functions] def tagAt(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** RIFF-tree walk; null (not an exception) on anything malformed or
    * outside the 24-bpp 'DIB ' profile.
    */
  def parse(blob: Array[Byte]): ArrayData = {
    if (blob == null || blob.length < 12) return null
    if (tagAt(blob, 0) != "RIFF" || tagAt(blob, 8) != "AVI ") return null
    val riffSize = u32(blob, 4)
    var usPerFrame = -1L
    var totalFrames = -1L
    var width = -1L
    var height = -1L
    var nStreams = -1L
    var moviFrames = 0L
    var idxEntries = -1L
    var hash = 0L
    var pixelBytes = 0L
    var ok = true

    def walkFrames(start: Int, end: Int): Unit = {
      // inside LIST movi: count '00db' frames and fold the unpadded
      // pixel hash in order
      var pos = start
      while (ok && pos + 8 <= end) {
        val id = tagAt(blob, pos)
        val size = u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) { ok = false; return }
        if (id == "00db") {
          if (width <= 0 || height <= 0) { ok = false; return }
          val st = stride(width)
          if (size != st * height) { ok = false; return }
          val rowBytes = (width * 3).toInt
          var row = 0
          while (row < height) {
            val base = (body + row * st).toInt
            var x = 0
            while (x < rowBytes) {
              hash = (hash * 31L + (blob(base + x) & 0xffL)) % M
              x += 1
            }
            row += 1
          }
          pixelBytes += width * 3 * height
          moviFrames += 1
        }
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      // depth cap: a malformed blob nesting LISTs ~len/12 deep would
      // otherwise overflow the stack — a throw, where the contract is
      // null. Real AVI trees are 2-3 deep.
      if (depth > 16) { ok = false; return }
      var pos = start
      while (ok && pos + 8 <= end) {
        val id = tagAt(blob, pos)
        val size = u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) { ok = false; return }
        if (id == "LIST") {
          if (size < 4) { ok = false; return }
          val listType = tagAt(blob, body)
          if (listType == "movi") walkFrames(body + 4, (body + size).toInt)
          else walk(body + 4, (body + size).toInt, depth + 1)
        } else if (id == "avih") {
          if (size < 56) { ok = false; return }
          usPerFrame = u32(blob, body)
          totalFrames = u32(blob, body + 16)
          nStreams = u32(blob, body + 24)
          width = u32(blob, body + 32)
          height = u32(blob, body + 36)
        } else if (id == "strf") {
          // 24-bpp uncompressed profile only
          if (size < 40 || u16(blob, body + 14) != 24 || u32(blob, body + 16) != 0) {
            ok = false; return
          }
        } else if (id == "idx1") {
          if (size % 16 != 0) { ok = false; return }
          idxEntries = size / 16
        }
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    walk(12, blob.length, 0)
    if (!ok || usPerFrame <= 0 || totalFrames <= 0 || width <= 0 ||
        height <= 0 || moviFrames != totalFrames || idxEntries != totalFrames)
      return null
    new GenericArrayData(Array[Long](
      riffSize, usPerFrame, totalFrames, width, height, nStreams,
      stride(width), stride(width) * height, moviFrames, idxEntries,
      pixelBytes, hash))
  }
}

/** (data binary, width, height, n_frames) → AVI bytes. */
case class AviWrap(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avi_wrap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType &&
        Seq(second, third, fourth).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_wrap expects (binary, bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(data: Any, w: Any, h: Any, n: Any): Any =
    AviImpl.wrap(data.asInstanceOf[Array[Byte]], w.asInstanceOf[Long],
      h.asInstanceOf[Long], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, w, h, n) =>
      s"graft.functions.AviImpl.wrap($d, $w, $h, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): AviWrap =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** AVI bytes → header/index fields + all-frames pixel hash (see
  * [[AviImpl.Fields]]); null when the container is malformed.
  */
case class AviMeta(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avi_meta expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AviImpl.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AviImpl.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AviMeta =
    copy(child = newChild)
}

/** AVI bytes → one [frame_idx, mean_luma, phash_hi, phash_lo] row per
  * '00db' frame — the per-frame AVERAGE-HASH fingerprint strip (video
  * near-dup: two videos match when their frame-hash sequences do; a
  * re-brightened re-encode still matches because each frame's aHash is
  * brightness-shift invariant, see [[BmpPhashImpl.ahash]]). The blob is
  * validated by [[AviImpl.parse]] FIRST (one shared bounds/profile gate —
  * the walk below never runs on a container parse rejected), then a
  * second movi walk computes the 64-pixel aHash per frame: O(frames)
  * total, touching 192 bytes per frame regardless of frame size. Null on
  * malformed input, never a throw.
  */
case class AviPhash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_phash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avi_phash expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AviPhashImpl.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AviPhashImpl.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AviPhash =
    copy(child = newChild)
}

object AviPhashImpl {
  def compute(blob: Array[Byte]): ArrayData = {
    val hdr = AviImpl.parse(blob)
    if (hdr == null) return null
    val w = hdr.getLong(3)
    val h = hdr.getLong(4)
    val st = hdr.getLong(6)
    val frames = scala.collection.mutable.ArrayBuffer.empty[ArrayData]

    // parse validated every chunk size/profile above; this walk only
    // locates the '00db' bodies again (same traversal, same depth cap)
    def walkFrames(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = AviImpl.tagAt(blob, pos)
        val size = AviImpl.u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) return
        if (id == "00db") {
          val r = BmpPhashImpl.ahash(blob, body.toLong, w, h, st)
          frames += new GenericArrayData(
            Array[Long](frames.length.toLong, r(0), r(1), r(2)))
        }
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var pos = start
      while (pos + 8 <= end) {
        val id = AviImpl.tagAt(blob, pos)
        val size = AviImpl.u32(blob, pos + 4)
        val body = pos + 8
        if (body + size > end) return
        if (id == "LIST" && size >= 4) {
          if (AviImpl.tagAt(blob, body) == "movi") walkFrames(body + 4, (body + size).toInt)
          else walk(body + 4, (body + size).toInt, depth + 1)
        }
        pos = body + size.toInt + (size & 1L).toInt
      }
    }

    walk(12, blob.length, 0)
    new GenericArrayData(frames.toArray[Any])
  }
}
