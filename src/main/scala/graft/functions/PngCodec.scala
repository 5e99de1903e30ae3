package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
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

  /** The w×h RGB raster with `data` tiled row-major (r,g,b = consecutive
    * payload bytes, wrapping), encoded as a real PNG.
    */
  def encodeTiled(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384,
      s"PngCodec.encodeTiled: invalid dimensions ${w}x$h")
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
    val bos = new ByteArrayOutputStream(64 + w * h)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG and fold the row-major (r,g,b) byte stream with the
    * corpus polyhash. None on anything ImageIO rejects (truncated bytes,
    * wrong magic, null input) — malformed is a value, never a throw.
    */
  def decodeHash(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      if (bytes == null) return None
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
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
