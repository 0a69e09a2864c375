package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec on the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF — no
  * third-party jar): decode, deterministic pixel extraction, Graphics2D
  * resize, PNG encode. This replaces the documented [[Multimodal.StubCodec]]
  * for content that actually decodes as an image; non-image payloads still
  * fall back to the stub so text-backed fixtures keep their semantics.
  *
  * Determinism: PNG is lossless, so decode(encode(pixels)) == pixels and the
  * q82 oracle can predict decoded values in closed form. Pixel channels are
  * normalized as v/256.0 — exact in binary floating point (v × 2⁻⁸), so sums
  * of per-row means are order-independent and bit-exact across engines. */
object ImageIoCodec {

  /** Magic-byte sniff before the (expensive) ImageIO probe: PNG, JPEG, GIF,
    * BMP, TIFF (both byte orders — JDK 9+ ImageIO decodes TIFF natively).
    * On mixed media/text corpora most payloads are NOT this format —
    * rejecting them on the first bytes instead of an ImageIO reader-search
    * per blob keeps the decode chain cheap (measured ~4× on featurize over
    * text payloads). This set IS the supported-format contract of
    * [[Multimodal.featurize]]/resize's real-decode path. */
  def looksLikeImage(c: Array[Byte]): Boolean =
    c != null && c.length >= 4 && (
      (c(0) == 0x89.toByte && c(1) == 'P' && c(2) == 'N' && c(3) == 'G') ||
      (c(0) == 0xFF.toByte && c(1) == 0xD8.toByte) ||            // JPEG
      (c(0) == 'G' && c(1) == 'I' && c(2) == 'F') ||
      (c(0) == 'B' && c(1) == 'M') ||
      (c(0) == 'I' && c(1) == 'I' && c(2) == 42 && c(3) == 0) || // TIFF LE
      (c(0) == 'M' && c(1) == 'M' && c(2) == 0 && c(3) == 42))   // TIFF BE

  def decodeImage(content: Array[Byte]): Option[BufferedImage] =
    if (!looksLikeImage(content)) None
    else
      try {
        // Per-read in-memory stream instead of the JVM-GLOBAL
        // ImageIO.setUseCache(false) toggle (a class-load side effect that
        // would change behavior for every other ImageIO user in the JVM):
        // the default disk cache writes a temp file per decode — pointless
        // overhead and tmp churn for byte arrays on executors.
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(content))
        // ImageIO.read(ImageInputStream) closes the stream itself WHEN a
        // reader claims it (so a plain finally-close throws
        // IOException("closed")), but returns null WITHOUT closing when no
        // registered reader matches (sniff-passing corrupt bytes, TIFF on a
        // JRE without the plugin) — close tolerantly so that path does not
        // leak the stream to the Disposer
        val img = Option(ImageIO.read(in))
        try in.close() catch { case _: java.io.IOException => () }
        img
      } catch { case _: Exception => None }

  /** Decode at NATIVE size to row-major red-channel doubles in [0,1)
    * (v/256.0 — exact). Returns (width, height, pixels). */
  def decodeNative(content: Array[Byte]): Option[(Int, Int, Array[Double])] =
    decodeImage(content).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = ((img.getRGB(x, y) >> 16) & 0xFF) / 256.0
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }

  /** Decode + resize to w×h, luminance floats in [0,1) (real path of
    * [[Multimodal.featurize]]). Nearest-neighbor keeps scaling deterministic
    * across JVMs (no AA rounding). */
  def decodeGray(content: Array[Byte], w: Int, h: Int): Option[Array[Float]] =
    decodeImage(content).map { img =>
      val scaled = scaleTo(img, w, h)
      val out = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = scaled.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          out(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 256.0f
          x += 1
        }
        y += 1
      }
      out
    }

  def scaleTo(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    if (img.getWidth == w && img.getHeight == h && img.getType == BufferedImage.TYPE_INT_RGB)
      return img
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    // memory-cached output stream for the same reason as decodeImage — the
    // OutputStream overload would go through the global disk-cache setting
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try ImageIO.write(img, "png", out) finally out.close()
    bos.toByteArray
  }

  /** Deterministic NEAR-DUP test pattern for perceptual-hash dedup (q100):
    * ids form groups of `groupSize`; all members share the group's base
    * pattern and differ only at pixel (2,3), whose value shifts by
    * member·53 — so two members' dHashes differ in at most the two
    * comparisons that touch that pixel (hamming ≤ 2), while distinct groups
    * get unrelated base patterns. Gray value, replayed in closed form by the
    * oracle:
    *   g = id / groupSize, j = id mod groupSize
    *   base(x,y) = ((g·31 + y·w + x) · (g·17 + 7)) mod 251
    *   v(x,y)    = (base + (if j>0 ∧ x=2 ∧ y=3 then j·53 else 0)) mod 256
    * PNG round-trips losslessly like [[testPattern]]. */
  def nearDupPattern(id: Long, w: Int, h: Int, groupSize: Int): Array[Byte] = {
    val g = id / groupSize; val j = id % groupSize
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = ((g * 31 + y * w + x) * (g * 17 + 7)) % 251
        val v = ((base + (if (j > 0 && x == 2 && y == 3) j * 53 else 0)) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic test pattern: gray pixel (x,y) = (seed·31 + y·w + x) mod
    * 256 in all three channels. The q82 oracle recomputes decoded values from
    * this formula — PNG round-trips it losslessly. */
  def testPattern(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((seed * 31 + y * w + x) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }
}
