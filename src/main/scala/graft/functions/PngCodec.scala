package graft.functions

import javax.imageio.ImageIO

/** REAL PNG codec seam (round-9 VERDICT #4) — the first multimodal path
  * whose bytes travel through an actual compressed image format:
  * `javax.imageio`'s PNG writer/reader (zlib deflate/inflate + scanline
  * filter reconstruction, shipped with the JDK — no new dependency).
  *
  * The fixture raster mirrors the BMP wrap exactly (BmpNative.scala:51):
  * the UTF-8 payload tiles the w×h RGB plane row-major with NO stride
  * padding, so the decoded-pixel polyhash has the same tiled closed form
  * the `mm_bmp_meta` oracle already replays (H(data^k || prefix) by three
  * bounded folds) — PNG is lossless, so decode(encode(raster)) == raster
  * and the checksum is formula-replayable even though the PNG BYTES
  * themselves are encoder-dependent (which is why byte length is NOT a
  * gated column, unlike the formula-layout BMP/WAV/AVI containers).
  *
  * Channel order is pinned by going through getRGB/setRGB packed ints on
  * both sides — the fold sees r,g,b per pixel regardless of the
  * BufferedImage's internal raster layout.
  */
object PngCodec {
  private val M = TextFunctions.HashMod

  // keep ImageIO memory-only: the default temp-file stream cache would
  // put executor-thread disk I/O on the decode hot path
  ImageIO.setUseCache(false)

  /** The w×h TYPE_INT_RGB raster with `data` tiled row-major (r,g,b =
    * consecutive payload bytes, wrapping) — the shared fixture builder
    * for every codec seam (PNG here, JPEG in [[JpegCodec]]).
    */
  def tiledImage(data: Array[Byte], w: Int, h: Int): java.awt.image.BufferedImage = {
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384,
      s"PngCodec.tiledImage: invalid dimensions ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val n = data.length
    var src = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def nxt(): Int = {
          val b = if (n == 0) 0 else data(src % n) & 0xff
          src += 1
          b
        }
        val r = nxt(); val g = nxt(); val b = nxt()
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The tiled raster encoded as a real PNG. Per-thread writer reuse
    * (r18, [[ImageIoPool]]): identical bytes to `ImageIO.write`, minus
    * the per-image registry scan + writer disposal.
    */
  def encodeTiled(data: Array[Byte], w: Int, h: Int): Array[Byte] =
    ImageIoPool.encode(tiledImage(data, w, h), "png", 64 + w * h)

  private val MaxDim = 16384

  /** Pixel-count budget for a DECODE-side allocation: a TYPE_INT_RGB
    * raster costs 4 bytes/pixel, so per-dimension caps alone still admit
    * a crafted 16384×16384 header — a ~1 GiB allocation inside
    * ImageIO.read whose OutOfMemoryError is an Error and escapes the
    * IOException/RuntimeException catch (round-11 ADVICE). 2M pixels
    * (≈8 MB) is comfortably above every fixture (335×215 ≈ 72k) and the
    * area bound, not the side bounds, is what actually limits the
    * allocation. Shared by [[JpegCodec]].
    */
  private[functions] val MaxPixels = 2000000L

  /** The declared IHDR (width, height), or None when the header is
    * shorter than signature+IHDR, either dimension is outside
    * (0, MaxDim], or w·h exceeds [[MaxPixels]]. Read BEFORE
    * ImageIO.read: a crafted header claiming a huge w×h would otherwise
    * drive a gigabyte BufferedImage allocation whose OutOfMemoryError is
    * an Error — not the caught exceptions — and escape as a crash (the
    * container-kernel contract: bounds-check every declared size,
    * malformed → null, never a throw or a hang).
    */
  private def declaredDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    // 8-byte signature, 4-byte chunk length, "IHDR", 4-byte w, 4-byte h
    if (bytes.length < 24) return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R')
      return None
    val w = be32(16)
    val h = be32(20)
    if (w < 1 || h < 1 || w > MaxDim || h > MaxDim || w * h > MaxPixels) None
    else Some((w.toInt, h.toInt))
  }

  /** Decode a PNG and fold the row-major (r,g,b) byte stream with the
    * corpus polyhash. None on anything ImageIO rejects (truncated bytes,
    * wrong magic, null input) and on any header whose DECLARED dimensions
    * fall outside the encodeTiled bound — malformed is a value, never a
    * throw.
    */
  def decodeHash(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      if (bytes == null) return None
      // declaredDims gates BEFORE the reader (bounds-check contract), so
      // the pooled reader only ever sees IHDR-validated bytes
      if (declaredDims(bytes).isEmpty) return None
      val img = ImageIoPool.read(bytes, "png")
      if (img == null) None
      else {
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
        Some((w, h, hash))
      }
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    }
}
