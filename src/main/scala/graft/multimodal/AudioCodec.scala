package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio codec for the multimodal pipeline: canonical RIFF/WAVE
  * (PCM 16-bit mono) encode + parse in pure byte code — no native codec
  * dependency — so the Spark-side plumbing (binary column → decode →
  * per-record features) runs against genuine, byte-accurate payloads.
  * Mirrors the role `ImageCodec` plays for images; real deployments swap
  * these kernels for an ffmpeg/soundfile call with the SAME column shape.
  */
object AudioCodec {

  /** 16-bit mono PCM samples → RIFF/WAVE bytes (44-byte canonical header). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse RIFF/WAVE → (sampleRate, samples). Walks the chunk list (so
    * non-canonical files with extra chunks parse too); None for anything
    * that is not PCM 16-bit mono RIFF. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    try {
      if (ascii(4) != "RIFF") return None
      buf.getInt // declared riff length
      if (ascii(4) != "WAVE") return None
      var rate = -1
      var ok = false
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && samples == null) {
        val id = ascii(4)
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (len < 16) return None // malformed: fixed part is 16 bytes
            val fmt = buf.getShort; val ch = buf.getShort
            rate = buf.getInt
            buf.getInt; buf.getShort
            val bits = buf.getShort
            ok = fmt == 1 && ch == 1 && bits == 16
            buf.position(buf.position() + (len - 16))
          case "data" =>
            if (!ok || rate <= 0) return None
            val out = new Array[Short](len / 2)
            var i = 0
            while (i < out.length) { out(i) = buf.getShort; i += 1 }
            samples = out
          case _ =>
            // odd-length chunks carry a pad byte, but a truncated file may
            // end exactly at the declared length — don't step past the end
            val skip = math.min(len + (len & 1), buf.remaining())
            buf.position(buf.position() + skip)
        }
      }
      Option(samples).map(s => (rate, s))
    } catch {
      // any residual malformed-header arithmetic → unparseable, not a crash
      case _: RuntimeException => None
    }
  }

  /** Deterministic synthetic clip per id: an integer triangle tone whose
    * period derives from the id, plus splitmix-hashed low-level noise —
    * varied, reproducible payloads with non-trivial spectra. */
  def syntheticAudio(id: Long, nSamples: Int): Array[Short] = {
    val period = ((id % 37) + 20).toInt
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      val phase = i % period
      val tri = // triangle in [-8192, 8192]
        if (phase * 2 < period) (phase * 32768 / period) - 8192
        else 8192 - ((phase * 2 - period) * 16384 / period)
      var z = id * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
      val noise = ((z >>> 40) & 0xFF).toInt - 128
      out(i) = (tri + noise).toShort
      i += 1
    }
    out
  }

  /** Per-clip features: [duration_s, rms, zero-crossing rate, peak/32768].
    * The shape a downstream audio encoder consumes. */
  def features(sampleRate: Int, samples: Array[Short]): Array[Double] = {
    if (samples.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    var sumSq = 0.0
    var crossings = 0L
    var peak = 0
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      sumSq += v.toDouble * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((v >= 0) != (samples(i - 1) >= 0))) crossings += 1
      i += 1
    }
    Array(samples.length.toDouble / sampleRate,
      math.sqrt(sumSq / samples.length) / 32768.0,
      crossings.toDouble / samples.length,
      peak.toDouble / 32768.0)
  }

  /** Decimate by an integer factor (naive resample — keeps every k-th
    * sample). Real deployments low-pass first; the COLUMN shape (binary →
    * binary at a new rate) is what the pipeline depends on. */
  def decimate(sampleRate: Int, samples: Array[Short],
      factor: Int): (Int, Array[Short]) = {
    require(factor >= 1)
    val out = new Array[Short]((samples.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = samples(i * factor); i += 1 }
    (sampleRate / factor, out)
  }
}
