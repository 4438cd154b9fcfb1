package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec on the JDK's built-in `javax.imageio` (PNG/JPEG/BMP
  * readers and writers ship with `java.desktop` — no external libraries).
  * This replaces the former decode stub: pixels are genuinely decoded,
  * resized, and measured. Runs headless; every kernel is deterministic
  * (integer nearest-neighbour resize, exact integer accumulators) so
  * results are stable across executors and re-runs.
  *
  * Shape at 100 TB: all kernels are per-row byte→byte or byte→vector —
  * map-only, partition-parallel, nothing shuffles. Payload bytes stay in
  * binary columns; only fixed-width features/metadata flow onward.
  */
object ImageCodec {

  /** Decoded raster: width, height, packed ARGB pixels row-major. */
  final case class Raster(width: Int, height: Int, argb: Array[Int])

  def decode(bytes: Array[Byte]): Option[Raster] =
    if (bytes == null || bytes.length == 0) None
    else
      // ImageIO returns null for unrecognized payloads but THROWS on
      // recognized-yet-corrupt ones (truncated JPEG, bogus huffman/DAC
      // tables...). In a 100 TB corpus corrupt payloads are routine data,
      // not exceptions: map them to None so the task survives and the row
      // yields null, same contract as the WAV/AVI parsers.
      try
        Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
          val w = img.getWidth; val h = img.getHeight
          Raster(w, h, img.getRGB(0, 0, w, h, null, 0, w))
        }
      catch {
        case _: java.io.IOException | _: RuntimeException => None
      }

  def encodePng(r: Raster): Array[Byte] = {
    val img = new BufferedImage(r.width, r.height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, r.width, r.height, r.argb, 0, r.width)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic image for a seed: a hash-gradient pattern
    * whose per-pixel values are a pure function of (seed, x, y) — the
    * generator behind test payloads (stands in for reading real files). */
  def syntheticImage(seed: Long, width: Int, height: Int): Raster = {
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = graft.functions.HashKernels.mix64(
          seed ^ (x.toLong << 32) ^ y.toLong)
        val r = ((h >>> 16) & 0xFF).toInt
        val g = ((h >>> 32) & 0xFF).toInt
        val b = ((h >>> 48) & 0xFF).toInt
        px(y * width + x) = 0xFF000000 | (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Raster(width, height, px)
  }

  /** Integer nearest-neighbour resize (source pixel = floor(i·src/dst)) —
    * bit-deterministic, no float interpolation to vary across platforms. */
  def resizeNearest(r: Raster, w: Int, h: Int): Raster = {
    require(w > 0 && h > 0, "target dims must be positive")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * r.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * r.width / w).toInt
        out(y * w + x) = r.argb(sy * r.width + sx)
        x += 1
      }
      y += 1
    }
    Raster(w, h, out)
  }

  /** Real image features: per-channel means (R, G, B scaled to [0,1]) +
    * an 8-bin luminance histogram (fractions) — an 11-dim descriptor.
    * Integer accumulation, so the result is exactly reproducible. */
  def features(r: Raster): Array[Float] = {
    val n = r.argb.length
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < n) {
      val p = r.argb(i)
      val red = (p >>> 16) & 0xFF; val grn = (p >>> 8) & 0xFF
      val blu = p & 0xFF
      sr += red; sg += grn; sb += blu
      // integer Rec.601 luma: (299R + 587G + 114B) / 1000 ∈ [0, 255]
      val luma = (299 * red + 587 * grn + 114 * blu) / 1000
      hist(math.min(7, luma >>> 5)) += 1L
      i += 1
    }
    val out = new Array[Float](11)
    out(0) = sr.toFloat / (n * 255f)
    out(1) = sg.toFloat / (n * 255f)
    out(2) = sb.toFloat / (n * 255f)
    var b = 0
    while (b < 8) { out(3 + b) = hist(b).toFloat / n; b += 1 }
    out
  }

  private def lumaOf(p: Int): Int =
    (299 * ((p >>> 16) & 0xFF) + 587 * ((p >>> 8) & 0xFF) +
      114 * (p & 0xFF)) / 1000

  /** Average hash (aHash): resize to 8×8, integer luma, bit i set iff
    * luma(i) > mean luma. Bit-deterministic (integer resize + integer
    * mean), 64-bit — near-duplicate images land within a small Hamming
    * distance, so the SimHash banding machinery applies unchanged. */
  def aHash(r: Raster): Long = {
    val s = resizeNearest(r, 8, 8)
    val lum = s.argb.map(lumaOf)
    val mean = lum.map(_.toLong).sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (lum(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Difference hash (dHash): resize to 9×8, bit (y·8 + x) set iff
    * luma(x+1, y) > luma(x, y) — captures gradient structure, more robust
    * to global brightness shifts than aHash. */
  def dHash(r: Raster): Long = {
    val s = resizeNearest(r, 9, 8)
    val lum = s.argb.map(lumaOf)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(y * 9 + x + 1) > lum(y * 9 + x)) bits |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Real grayscale conversion (integer Rec.601 luma per pixel). */
  def grayscale(r: Raster): Raster = {
    val out = new Array[Int](r.argb.length)
    var i = 0
    while (i < r.argb.length) {
      val p = r.argb(i)
      val l = (299 * ((p >>> 16) & 0xFF) + 587 * ((p >>> 8) & 0xFF) +
        114 * (p & 0xFF)) / 1000
      out(i) = 0xFF000000 | (l << 16) | (l << 8) | l
      i += 1
    }
    Raster(r.width, r.height, out)
  }
}
