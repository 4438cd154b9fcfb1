package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Whole-domain validation of the round-11 planted-PIXEL / planted-TONE
  * closed forms that back the q42/q43/q117/q188/q213 DuckDB oracles.
  * Each oracle recomputes these formulas independently in SQL; this spec
  * proves the JVM side actually satisfies them over the ENTIRE fixed id
  * domain each query uses, so the hash gate can never drift.
  */
class PlantedFixtureSpec extends AnyFunSuite {

  test("planted raster channel sums match the closed form after a real " +
      "PNG encode/decode roundtrip (q42 domain)") {
    for (id <- 0L until 500L) {
      val w = (id % 13).toInt + 8
      val h = (id % 7).toInt + 6
      val bytes = ImageCodec.encodePng(Multimodal.plantedRaster(id, w, h))
      val r = ImageCodec.decode(bytes).get
      assert(r.width == w && r.height == h)
      val f = ImageCodec.features(r)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id + x + y) % 256
        sg += (3 * id + 2 * x + y) % 256
        sb += (7 * id + x + 3 * y) % 256
      }
      val n = w * h
      assert(f(0) == sr.toFloat / (n * 255f), s"mean_r id=$id")
      assert(f(1) == sg.toFloat / (n * 255f), s"mean_g id=$id")
      assert(f(2) == sb.toFloat / (n * 255f), s"mean_b id=$id")
    }
  }

  test("planted PNG stream frames decode to the per-frame closed form " +
      "(q43 domain)") {
    for (id <- 0L until 100L) {
      val k = (id % 5).toInt + 2
      val frames = Multimodal.splitPngStream(Multimodal.plantedPngStream(id, k))
      assert(frames.size == k)
      frames.zipWithIndex.foreach { case (fb, f) =>
        val r = ImageCodec.decode(fb).get
        assert(r.width == 8 && r.height == 6)
        var sr = 0L
        for (y <- 0 until 6; x <- 0 until 8)
          sr += (id + 97L * (f + 1) + x + y) % 256
        assert(ImageCodec.features(r)(0) == sr.toFloat / 12240f,
          s"frame mean id=$id f=$f")
      }
    }
  }

  test("planted square wave features are exactly the closed form through " +
      "a real WAV roundtrip (q117 domain)") {
    for (id <- 0L until 500L) {
      val n = ((id % 11) + 4).toInt * 400
      val a = ((id % 9) + 1).toInt * 1000
      val hp = (id % 7).toInt + 2
      val wav = AudioCodec.encodeWav(Multimodal.plantedSquareSamples(id, n), 8000)
      val (rate, samples) = AudioCodec.decodeWav(wav).get
      assert(rate == 8000 && samples.length == n)
      val f = AudioCodec.features(rate, samples)
      assert(f(0) == n.toDouble / 8000, s"duration id=$id")
      assert(f(1) == a.toDouble / 32768, s"rms id=$id")
      assert(f(2) == ((n - 1) / hp).toDouble / n, s"zcr id=$id")
      val (r2, s2) = AudioCodec.decimate(rate, samples, 2)
      assert(AudioCodec.encodeWav(s2, r2).length == 44 + n, s"half id=$id")
    }
  }

  test("twin-pair tone fingerprints: exact-halving BER is 0, twins match " +
      "bitwise, different bases discriminate (q188 domain)") {
    def fp(id: Long): Array[Int] = {
      val base = id / 2
      val n = ((base % 7) + 4).toInt * 1024
      val s = Multimodal.plantedHoppingSamples(base, n)
      val out = if (id % 2 == 1) s.map(v => (v * 2).toShort) else s
      AudioFingerprint.fingerprint(8000, out)
    }
    val fps = (0L until 24L).map(id => id -> fp(id)).toMap
    for (id <- 0L until 24L) {
      val base = id / 2
      val n = ((base % 7) + 4).toInt * 1024
      assert(fps(id).length == (n - 1024) / 512, s"n_words id=$id")
      // the words must not be the degenerate all-zero pattern a
      // stationary tone produces (the bug this fixture dodges)
      assert(fps(id).exists(_ != 0), s"degenerate fingerprint id=$id")
      // exact ÷2 re-master: power-of-two scaling through the linear FFT
      // preserves every band-energy-difference sign
      val halved = AudioCodec.decodeWav(AudioCodec.encodeWav(
        (if (id % 2 == 1) Multimodal.plantedHoppingSamples(base, n)
            .map(v => (v * 2).toShort)
          else Multimodal.plantedHoppingSamples(base, n))
          .map(v => (v / 2).toShort), 8000)).get._2
      assert(AudioFingerprint.bitErrorRate(fps(id),
        AudioFingerprint.fingerprint(8000, halved)) == 0.0,
        s"ber_scaled id=$id")
    }
    for (id <- 0L until 23L) {
      val ber = AudioFingerprint.bitErrorRate(fps(id), fps(id + 1))
      if (id % 2 == 0) assert(ber == 0.0, s"twin id=$id ber=$ber")
      else assert(ber > 0.3, s"non-twin id=$id ber=$ber")
    }
  }

  test("derivative-ladder dims replay Math.round(dim * target/maxside) " +
      "(q213 domain)") {
    for (id <- 1L to 2000L) {
      val w = (id % 13).toInt + 8
      val h = (id % 7).toInt + 6
      val r = ImageCodec.decode(ImageCodec.encodePng(
        ImageCodec.syntheticImage(id, w, h))).get
      Seq(100f, 314f, 650f).foreach { target =>
        val f = target / math.max(w, h)
        val ew = math.max(1, math.round(w * f))
        val eh = math.max(1, math.round(h * f))
        val resized = ImageCodec.resizeNearest(r, ew, eh)
        assert(resized.width == ew && resized.height == eh)
      }
    }
  }
}
