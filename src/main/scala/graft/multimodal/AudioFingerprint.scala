package graft.multimodal

/** Acoustic fingerprinting (Haitsma & Kalker 2002 "A highly robust audio
  * fingerprinting system"): per-frame sub-fingerprints from the SIGNS of
  * band-energy differences across frequency and time. The sign features
  * are invariant to amplitude scaling and robust to mild filtering — the
  * property that lets a dedup pipeline match re-encoded copies of the
  * same recording.
  *
  * All pure JVM DSP (iterative radix-2 FFT, Hann window, log-spaced
  * bands): deterministic, no native codecs — the Spark side stays a
  * map-only UDF over the binary WAV column.
  */
object AudioFingerprint {

  /** In-place iterative radix-2 Cooley–Tukey FFT; length must be a power
    * of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, "FFT length must be a power of 2")
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      val half = len >> 1
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  val FrameSize = 1024
  val Hop = 512
  /** 17 edges → 16 bands → 16 sign bits per frame. */
  val NEdges = 17

  /** Log-spaced band edge bins between `loHz` and `hiHz`. */
  def bandEdges(sampleRate: Int, loHz: Double = 300.0,
      hiHz: Double = 2000.0): Array[Int] = {
    val edges = new Array[Int](NEdges)
    var b = 0
    while (b < NEdges) {
      val hz = loHz * math.pow(hiHz / loHz, b.toDouble / (NEdges - 1))
      edges(b) = math.max(1, (hz * FrameSize / sampleRate).toInt)
      b += 1
    }
    edges
  }

  /** Sub-fingerprints: one 16-bit word per frame after the first.
    * Bit b of frame f = sign of (E[f][b]−E[f][b+1]) − (E[f−1][b]−E[f−1][b+1]).
    * Clips shorter than two frames yield an empty fingerprint. */
  def fingerprint(sampleRate: Int, samples: Array[Short]): Array[Int] = {
    val nFrames = if (samples.length < FrameSize) 0
      else (samples.length - FrameSize) / Hop + 1
    if (nFrames < 2) return Array.emptyIntArray
    val edges = bandEdges(sampleRate)
    val energies = Array.ofDim[Double](nFrames, NEdges - 1)
    val re = new Array[Double](FrameSize)
    val im = new Array[Double](FrameSize)
    var f = 0
    while (f < nFrames) {
      val off = f * Hop
      var i = 0
      while (i < FrameSize) {
        // Hann window kills spectral leakage across band edges
        val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1)))
        re(i) = samples(off + i) * w
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      var b = 0
      while (b < NEdges - 1) {
        var e = 0.0
        var k = edges(b)
        while (k < edges(b + 1)) {
          e += re(k) * re(k) + im(k) * im(k)
          k += 1
        }
        energies(f)(b) = e
        b += 1
      }
      f += 1
    }
    val words = new Array[Int](nFrames - 1)
    f = 1
    while (f < nFrames) {
      var word = 0
      var b = 0
      while (b < NEdges - 2) {
        val d = (energies(f)(b) - energies(f)(b + 1)) -
          (energies(f - 1)(b) - energies(f - 1)(b + 1))
        if (d > 0) word |= 1 << b
        b += 1
      }
      words(f - 1) = word
      f += 1
    }
    words
  }

  /** Bit error rate between two fingerprints over their common frame
    * prefix (15 compared bits per word); 1.0 when either is empty. */
  def bitErrorRate(a: Array[Int], b: Array[Int]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 1.0
    var bits = 0
    var i = 0
    while (i < n) {
      bits += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0x7FFF)
      i += 1
    }
    bits.toDouble / (n * 15)
  }
}
