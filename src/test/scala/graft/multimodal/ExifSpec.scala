package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM EXIF parse (reference `util/EXIF.scala:34-67`): synthetic
  * JPEG/APP1/TIFF roundtrips, hemisphere signs, and garbage tolerance. */
class ExifSpec extends AnyFunSuite {

  test("roundtrip: all four hemisphere quadrants and the timestamp") {
    for ((lat, lon) <- Seq((-35.25, 149.75), (35.25, -149.75),
      (-0.75, -0.25), (84.25, 177.5), (0.0, 0.0))) {
      val bytes = Exif.syntheticExifJpeg(lat, lon, "2012:03:05 14:30:00")
      val x = Exif.extract(bytes)
      assert(x.latitude == lat, s"lat for ($lat,$lon): ${x.latitude}")
      assert(x.longitude == lon, s"lon for ($lat,$lon): ${x.longitude}")
      assert(x.dateTimeOriginal == "2012:03:05 14:30:00")
    }
  }

  test("DMS decomposition: fractional minutes and centiseconds") {
    // 10° 30' 36.75" = 10 + (30*60 + 36.75)/3600 = 10.510208333...
    val lat = 10.0 + (30 * 60 + 36.75) / 3600.0
    val x = Exif.extract(Exif.syntheticExifJpeg(lat, 0.0, "2020:01:01 00:00:00"))
    assert(math.abs(x.latitude - lat) < 1e-9)
  }

  test("garbage tolerance: all-null result, never a throw") {
    assert(Exif.extract(null) == ExifData(null, null, null))
    assert(Exif.extract(Array[Byte]()) == ExifData(null, null, null))
    assert(Exif.extract("not a jpeg".getBytes) == ExifData(null, null, null))
    // valid JPEG magic, no APP1
    assert(Exif.extract(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) ==
      ExifData(null, null, null))
    // truncated mid-TIFF: every prefix must be safe
    val good = Exif.syntheticExifJpeg(-35.25, 149.75, "2012:03:05 14:30:00")
    (0 until good.length).foreach { n =>
      Exif.extract(good.take(n)) // must not throw
    }
    // PNG bytes (the multimodal fixture generator's other format)
    val png = Multimodal.syntheticPngStream(7L, 1, 8, 8)
    assert(Exif.extract(png) == ExifData(null, null, null))
  }

  test("single-byte fuzz anywhere in a valid exif jpeg never throws") {
    val good = Exif.syntheticExifJpeg(-35.25, 149.75, "2012:03:05 14:30:00")
    var i = 0
    while (i < good.length) {
      val fuzzed = good.clone()
      fuzzed(i) = (fuzzed(i) ^ 0x5A).toByte
      Exif.extract(fuzzed) // fields may go null; must not throw
      i += 1
    }
  }

  test("little-endian TIFF parses too") {
    // hand-build an II-order TIFF with just a GPS IFD holding latitude
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16le(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32le(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    val tiff = new java.io.ByteArrayOutputStream()
    def t8(v: Int): Unit = tiff.write(v & 0xff)
    def t16(v: Int): Unit = { t8(v); t8(v >> 8) }
    def t32(v: Long): Unit = { t8(v.toInt); t8((v >> 8).toInt); t8((v >> 16).toInt); t8((v >> 24).toInt) }
    t8('I'); t8('I'); t16(42); t32(8)
    // IFD0: one entry -> GPS IFD at 26
    t16(1)
    t16(0x8825); t16(4); t32(1); t32(26)
    t32(0)
    // GPS IFD at 26: two entries (ref + lat), next=0 -> data at 26+2+24+4=56
    t16(2)
    t16(0x0001); t16(2); t32(2); t8('S'); t8(0); t8(0); t8(0)
    t16(0x0002); t16(5); t32(3); t32(56)
    t32(0)
    for ((n, d) <- Seq((35L, 1L), (15L, 1L), (0L, 1L))) { t32(n); t32(d) }
    val tb = tiff.toByteArray
    w8(0xff); w8(0xd8); w8(0xff); w8(0xe1)
    val len = 2 + 6 + tb.length
    w8(len >> 8); w8(len)
    out.write("Exif".getBytes); w8(0); w8(0)
    out.write(tb); w8(0xff); w8(0xd9)
    val x = Exif.extract(out.toByteArray)
    assert(x.latitude == -35.25)
    assert(x.longitude == null && x.dateTimeOriginal == null)
  }

  test("crafted rational count never allocates: all-null, no OOM") {
    // same hand-built TIFF as above, but the GPS latitude entry declares
    // count = 512M rationals (4 GB) — the bounds check must reject it
    // BEFORE Array.tabulate, or the 'untrusted input never throws'
    // contract dies by uncatchable OutOfMemoryError
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    val tiff = new java.io.ByteArrayOutputStream()
    def t8(v: Int): Unit = tiff.write(v & 0xff)
    def t16(v: Int): Unit = { t8(v); t8(v >> 8) }
    def t32(v: Long): Unit = { t8(v.toInt); t8((v >> 8).toInt); t8((v >> 16).toInt); t8((v >> 24).toInt) }
    t8('I'); t8('I'); t16(42); t32(8)
    t16(1)
    t16(0x8825); t16(4); t32(1); t32(26)
    t32(0)
    t16(2)
    t16(0x0001); t16(2); t32(2); t8('S'); t8(0); t8(0); t8(0)
    t16(0x0002); t16(5); t32(0x20000000L); t32(56)
    t32(0)
    for ((n, d) <- Seq((35L, 1L), (15L, 1L), (0L, 1L))) { t32(n); t32(d) }
    val tb = tiff.toByteArray
    w8(0xff); w8(0xd8); w8(0xff); w8(0xe1)
    val len = 2 + 6 + tb.length
    w8(len >> 8); w8(len)
    out.write("Exif".getBytes); w8(0); w8(0)
    out.write(tb); w8(0xff); w8(0xd9)
    assert(Exif.extract(out.toByteArray) == ExifData(null, null, null))
  }
}
