package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native BMP (Windows bitmap) container support — the image analogue of
  * [[WavImpl]]: 24-bit uncompressed BMP is the one image format trivial
  * enough to build AND parse byte-exactly with no codec library, which
  * makes the IMAGE decode path genuine the same way round 8 made audio
  * genuine (the round-7 residual: "image/video stay honest stubs"):
  *
  *   - `graft_bmp_wrap(data, width, height)` emits a canonical 54-byte
  *     BITMAPFILEHEADER + BITMAPINFOHEADER and a bottom-up 24-bpp pixel
  *     array with 4-byte row stride padding — a genuine viewable
  *     bitmap; pixel bytes tile the payload cyclically (an empty
  *     payload yields zero pixels), so every pixel byte is a formula of
  *     the source text;
  *   - `graft_bmp_meta(blob)` parses the headers like a real reader
  *     (magic, header sizes, 24-bpp uncompressed only, offset/stride
  *     bounds checked) and folds the polyhash of the UNPADDED pixel
  *     bytes in file row order — the checksum of what a decoder would
  *     actually hand downstream; NULL for anything malformed, never a
  *     throw (strict-decode semantics).
  *
  * The pixel hash has a closed form the DuckDB oracle replays without
  * touching bytes: tiling repeats the payload k times plus a prefix, and
  * polyhash concatenation obeys H(A||B) = (H(A)·31^|B| + H(B)) mod M —
  * so three bounded list_reduce folds (power, k-fold repeat, prefix)
  * reproduce the kernel exactly (PipelineQueries `mm_bmp_meta` /
  * `mm_decode`). Both expressions are codegen'd single JVM calls.
  */
object BmpImpl {

  /** Parsed field order — shared by `graft_bmp_meta`, the mm_bmp_meta
    * oracle SQL, and MultimodalSpec:
    * [file_size, data_offset, header_size, width, height, planes, bpp,
    *  compression, image_size, row_stride, n_pixel_bytes, pixel_hash].
    */
  val Fields = 12

  private val M = TextFunctions.HashMod

  /** BMP rows pad to 4-byte boundaries. */
  def stride(w: Long): Long = ((w * 3 + 3) / 4) * 4

  def wrap(data: Array[Byte], w: Long, h: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384,
      s"graft_bmp_wrap: invalid dimensions ${w}x$h")
    val st = stride(w).toInt
    val imgSize = st * h.toInt
    val out = new Array[Byte](54 + imgSize)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(54 + imgSize) // file size
    bb.putInt(0) // reserved
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(w.toInt)
    bb.putInt(h.toInt)
    bb.putShort(1) // planes
    bb.putShort(24) // bits per pixel
    bb.putInt(0) // BI_RGB (uncompressed)
    bb.putInt(imgSize)
    bb.putInt(2835); bb.putInt(2835) // 72 DPI in pixels/metre
    bb.putInt(0); bb.putInt(0) // colors used / important
    val rowBytes = (w * 3).toInt
    val n = data.length
    var row = 0
    var src = 0
    var pos = 54
    while (row < h) {
      var x = 0
      while (x < rowBytes) {
        out(pos + x) = if (n == 0) 0 else data(src % n)
        src += 1
        x += 1
      }
      pos += st // stride padding stays zero
      row += 1
    }
    out
  }

  private def u16(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], p: Int): Long = u32(b, p).toInt.toLong

  /** Validated geometry [dataOffset, width, height, stride] of a 24-bpp
    * uncompressed BMP, or null — the shared bounds gate of [[parse]] and
    * [[BmpResizeImpl]] (one checker, so the two walks can't drift).
    */
  def geometry(blob: Array[Byte]): Array[Long] = {
    if (blob == null || blob.length < 54) return null
    if (blob(0) != 'B' || blob(1) != 'M') return null
    val dataOffset = u32(blob, 10)
    val headerSize = u32(blob, 14)
    val width = i32(blob, 18)
    val height = i32(blob, 22)
    val bpp = u16(blob, 28)
    val compression = u32(blob, 30)
    if (headerSize < 40 || width <= 0 || height <= 0 ||
        bpp != 24 || compression != 0) return null
    val st = stride(width)
    if (dataOffset < 54 || dataOffset + st * height > blob.length) return null
    Array(dataOffset, width, height, st)
  }

  /** Header parse + pixel-hash fold; null (not an exception) on anything
    * malformed or outside the 24-bpp uncompressed profile.
    */
  def parse(blob: Array[Byte]): ArrayData = {
    val geo = geometry(blob)
    if (geo == null) return null
    val Array(dataOffset, width, height, st) = geo
    val fileSize = u32(blob, 2)
    val headerSize = u32(blob, 14)
    val planes = u16(blob, 26)
    val bpp = u16(blob, 28)
    val compression = u32(blob, 30)
    val imageSize = u32(blob, 34)
    var hash = 0L
    val rowBytes = (width * 3).toInt
    var row = 0
    while (row < height) {
      val base = (dataOffset + row * st).toInt
      var x = 0
      while (x < rowBytes) {
        hash = (hash * 31L + (blob(base + x) & 0xffL)) % M
        x += 1
      }
      row += 1
    }
    new GenericArrayData(Array[Long](fileSize, dataOffset, headerSize,
      width, height, planes, bpp, compression, imageSize, st,
      width * 3 * height, hash))
  }
}

/** See [[BmpImpl]]. JVM-side decode companion for the batched
  * mapPartitions path: the unpadded pixel bytes in file row order, or
  * null when malformed.
  */
object BmpPixels {
  def payload(blob: Array[Byte]): Array[Byte] = {
    val hdr = BmpImpl.parse(blob)
    if (hdr == null) return null
    val dataOffset = hdr.getLong(1).toInt
    val width = hdr.getLong(3).toInt
    val height = hdr.getLong(4).toInt
    val st = hdr.getLong(9).toInt
    val rowBytes = width * 3
    val out = new Array[Byte](rowBytes * height)
    var row = 0
    while (row < height) {
      System.arraycopy(blob, dataOffset + row * st, out, row * rowBytes, rowBytes)
      row += 1
    }
    out
  }
}

/** (data binary, width, height) → BMP bytes. */
case class BmpWrap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bmp_wrap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType &&
        Seq(second, third).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bmp_wrap expects (binary, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(data: Any, w: Any, h: Any): Any =
    BmpImpl.wrap(data.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, w, h) =>
      s"graft.functions.BmpImpl.wrap($d, $w, $h)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BmpWrap =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** BMP bytes → header fields + pixel hash (see [[BmpImpl.Fields]]); null
  * when the container is malformed.
  */
case class BmpMeta(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_meta expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    BmpImpl.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpImpl.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpMeta =
    copy(child = newChild)
}

/** blob → [out_w, out_h, n_pixel_bytes, src_w, src_h, pixel_hash] —
  * nearest-neighbor RESIZE of a genuine 24-bpp BMP to a t×t thumbnail,
  * the image analogue of mm_framesample's frame picking: output pixel
  * (r, c) reads source pixel (r·h div t, c·w div t) and the hash folds
  * the picked B,G,R bytes in output row-major order (rows in FILE
  * order, the same convention as the full-pixel hash). Touches exactly
  * 3·t² source bytes — the thumbnail cost is O(t²) regardless of the
  * source dimensions, which is the point of resizing before shipping
  * pixels anywhere. Null on malformed input ([[BmpImpl.geometry]] is
  * the shared bounds gate).
  */
case class BmpResize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_resize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_resize expects (binary, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))

  override protected def nullSafeEval(blob: Any, t: Any): Any =
    BmpResizeImpl.compute(blob.asInstanceOf[Array[Byte]], t.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, t) => s"""
      ${ev.value} = graft.functions.BmpResizeImpl.compute($b, $t);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BmpResize =
    copy(left = newLeft, right = newRight)
}

object BmpResizeImpl {
  /** [out_w, out_h, n_pixel_bytes, src_w, src_h, pixel_hash] */
  val Fields = 6
  private val M = TextFunctions.HashMod

  def compute(blob: Array[Byte], t: Long): ArrayData = {
    if (t <= 0 || t > 4096) return null
    val geo = BmpImpl.geometry(blob)
    if (geo == null) return null
    val Array(dataOffset, w, h, st) = geo
    val ti = t.toInt
    var hash = 0L
    var r = 0
    while (r < ti) {
      val srcRow = r * h / t
      val base = dataOffset + srcRow * st
      var c = 0
      while (c < ti) {
        val p = (base + (c * w / t) * 3).toInt
        var k = 0
        while (k < 3) {
          hash = (hash * 31L + (blob(p + k) & 0xffL)) % M
          k += 1
        }
        c += 1
      }
      r += 1
    }
    new GenericArrayData(Array[Long](t, t, 3L * t * t, w, h, hash))
  }
}

/** blob → [src_w, src_h, mean_luma, phash_hi, phash_lo] — 64-bit
  * AVERAGE-HASH (aHash) perceptual fingerprint of a genuine 24-bpp BMP:
  * the 8×8 nearest-neighbor thumbnail ([[BmpResizeImpl]]'s tiling,
  * exactly), each picked pixel reduced to an integer luma
  * (B+G+R) div 3, thresholded against the integer mean of the 64 lumas
  * (strict >, ties → 0), bits packed row-major MSB-first into two
  * NON-NEGATIVE 32-bit halves (hi = rows 0-3, lo = rows 4-7) so
  * grouping/banding stays sign-free in every engine — the simhash
  * convention. Two images that differ by a constant brightness shift
  * (no clipping) hash IDENTICALLY: the shift moves every luma and the
  * mean by the same amount, so every comparison is unchanged — that is
  * the perceptual part, and what byte-exact dedup can never give.
  * Touches 3·64 source bytes + header: O(1) per image regardless of
  * dimensions. Null on malformed input ([[BmpImpl.geometry]] is the
  * shared bounds gate).
  */
case class BmpPhash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_phash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_phash expects a binary blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    BmpPhashImpl.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpPhashImpl.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpPhash =
    copy(child = newChild)
}

object BmpPhashImpl {
  /** [src_w, src_h, mean_luma, phash_hi, phash_lo] */
  val Fields = 5
  val T = 8

  /** The shared 8×8 aHash core over one bottom-up 24-bpp pixel array at
    * `dataOffset` with row stride `st` — used by the BMP kernel here and
    * per-frame by [[AviPhashImpl]] (AVI DIB frames are the same layout).
    * Returns [mean, hi, lo]; bounds are the CALLER's contract
    * (BmpImpl.geometry / AviImpl.parse both guarantee
    * dataOffset + st·h ≤ blob.length before this runs).
    */
  def ahash(blob: Array[Byte], dataOffset: Long, w: Long, h: Long,
            st: Long): Array[Long] = {
    val lumas = new Array[Long](T * T)
    var r = 0
    while (r < T) {
      val base = dataOffset + (r * h / T) * st
      var c = 0
      while (c < T) {
        val p = (base + (c * w / T) * 3).toInt
        lumas(r * T + c) =
          ((blob(p) & 0xffL) + (blob(p + 1) & 0xffL) + (blob(p + 2) & 0xffL)) / 3
        c += 1
      }
      r += 1
    }
    var sum = 0L
    var i = 0
    while (i < T * T) { sum += lumas(i); i += 1 }
    val mean = sum / (T * T)
    // MSB-first fold: hi = bits 0..31, lo = bits 32..63 (row-major)
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < 32) { hi = hi * 2 + (if (lumas(i) > mean) 1L else 0L); i += 1 }
    while (i < 64) { lo = lo * 2 + (if (lumas(i) > mean) 1L else 0L); i += 1 }
    Array[Long](mean, hi, lo)
  }

  def compute(blob: Array[Byte]): ArrayData = {
    val geo = BmpImpl.geometry(blob)
    if (geo == null) return null
    val Array(dataOffset, w, h, st) = geo
    val Array(mean, hi, lo) = ahash(blob, dataOffset, w, h, st)
    new GenericArrayData(Array[Long](w, h, mean, hi, lo))
  }
}
