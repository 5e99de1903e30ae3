package graft.functions

import javax.imageio.ImageIO

/** First LOSSY codec seam (round-10 VERDICT #2) — the tiled fixture
  * raster crosses `javax.imageio`'s JPEG writer/reader (DCT quantization
  * + Huffman coding, JDK-shipped). Lossy by design, which is the point:
  * the decoded pixels are NOT the payload, so — unlike the lossless PNG
  * twin ([[PngCodec]]) — no closed-form pixel-hash oracle exists. What
  * stays exact and SQL-gated: the decoded dimensions, the pixel-byte
  * count (w·3·h — JPEG carries no stride padding), and decode_ok /
  * the truncation arm → nulls. The lossy contract itself (bounded
  * per-pixel reconstruction error vs the source raster) is pinned in
  * MultimodalSpec — the honest gate for a codec whose output is
  * approximate by specification.
  *
  * Container-kernel contract: the SOF dimensions are parsed from the
  * marker segments and bounds-checked BEFORE ImageIO.read (a crafted
  * header claiming a huge w×h would otherwise drive a gigabyte
  * BufferedImage allocation whose OutOfMemoryError escapes the caught
  * exceptions); every declared segment length is validated against the
  * remaining bytes, and the walk is step-bounded — malformed → None,
  * never a throw or a hang.
  */
object JpegCodec {
  private val M = TextFunctions.HashMod
  private val MaxDim = 16384

  ImageIO.setUseCache(false)

  /** The tiled raster ([[PngCodec.tiledImage]]) encoded as a real JPEG
    * at the writer's default quality. Per-thread writer reuse (r18,
    * [[ImageIoPool]]): identical bytes to `ImageIO.write`, minus the
    * per-image registry scan + writer disposal.
    */
  def encodeTiled(data: Array[Byte], w: Int, h: Int): Array[Byte] =
    ImageIoPool.encode(PngCodec.tiledImage(data, w, h), "jpg", 64 + w * h)

  /** Declared (width, height) from the first SOF marker segment, or None
    * when the marker stream is malformed, truncated, reaches SOS/EOI
    * before any SOF, declares a dimension outside (0, MaxDim], or
    * declares more than [[PngCodec.MaxPixels]] total pixels — the AREA
    * bound is what actually limits the decode-side raster allocation
    * (round-11 ADVICE: per-dimension caps alone admit a crafted
    * 16384×16384 ≈ 1 GiB TYPE_INT_RGB allocation whose
    * OutOfMemoryError escapes the catch as an Error).
    */
  private[functions] def declaredDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    def u8(o: Int): Int = bytes(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return None // SOI
    var i = 2
    var steps = 0
    while (i + 3 < bytes.length && steps < 4096) {
      steps += 1
      if (u8(i) != 0xff) return None
      val marker = u8(i + 1)
      if (marker == 0xff) {
        i += 1 // fill byte
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone: TEM / RSTn / SOI / EOI carry no length
      } else {
        val len = be16(i + 2) // includes its own two bytes
        if (len < 2 || i + 2 + len > bytes.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          val h = be16(i + 5)
          val w = be16(i + 7)
          return if (w < 1 || h < 1 || w > MaxDim || h > MaxDim ||
            w.toLong * h > PngCodec.MaxPixels) None
          else Some((w, h))
        }
        if (marker == 0xda) return None // SOS before any SOF: malformed
        i += 2 + len
      }
    }
    None
  }

  /** Decode a JPEG to its raster, bounds-checking the DECLARED SOF
    * dimensions first. None on anything malformed — a value, never a
    * throw.
    */
  def decodeRaster(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      // declaredDims gates BEFORE the reader (bounds-check contract), so
      // the pooled reader only ever sees SOI+SOF-validated bytes
      if (declaredDims(bytes).isEmpty) return None
      Option(ImageIoPool.read(bytes, "jpg"))
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    }

  /** Decode and fold the row-major (r,g,b) byte stream with the corpus
    * polyhash — NOT oracle-gated (lossy bytes are encoder-defined), kept
    * for the spec's determinism check: same bytes, same fold, any
    * partition.
    */
  def decodeHash(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    decodeRaster(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      var hash = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          hash = (hash * 31 + ((rgb >> 16) & 0xff)) % M
          hash = (hash * 31 + ((rgb >> 8) & 0xff)) % M
          hash = (hash * 31 + (rgb & 0xff)) % M
          x += 1
        }
        y += 1
      }
      (w, h, hash)
    }
}
