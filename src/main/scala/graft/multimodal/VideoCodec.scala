package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video codec for the multimodal pipeline: AVI/MJPEG (RIFF container,
  * Motion-JPEG frames) encode + parse in pure byte code. MJPEG is the one
  * video format genuinely decodable with nothing but the JDK — every frame
  * is a complete JPEG picture, and `javax.imageio` ships a JPEG codec — so
  * the video column stops being a stub: container walk, `idx1` index seek,
  * stride frame-sampling, and per-frame pixel decode are all real.
  * (Reference scope: `load/MediaStore.scala` stores videos as opaque media
  * paths; no reference query decodes them — this is the LLM-pipeline tier.)
  *
  * Container layout written (and the superset parsed):
  * {{{
  * RIFF('AVI ')
  *   LIST('hdrl') avih(56)  LIST('strl') strh(56,'vids','MJPG') strf(40)
  *   LIST('movi') '00dc' <jpeg> ['00dc' <jpeg> ...]
  *   'idx1' 16-byte entries (ckid, flags=KEYFRAME, offset, size)
  * }}}
  *
  * Shape at 100 TB: payload bytes stay in a binary column; metadata comes
  * from the fixed-size headers without touching frame data, and stride
  * sampling decodes ONLY the selected frames by seeking through `idx1`
  * (in MJPEG every frame is a keyframe). All kernels are map-only.
  *
  * Every length/count read from the (untrusted) payload is bounds-checked
  * before use — garbage, truncation, or hostile sizes parse to None, never
  * an allocation blow-up or a crash (same discipline as [[Exif]]).
  */
object VideoCodec {

  /** Container metadata, readable without decoding any frame. */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Int,
      totalFrames: Int)

  private val Keyframe = 0x00000010 // AVIIF_KEYFRAME

  private def fourcc(s: String): Int = {
    val b = s.getBytes("US-ASCII")
    (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) |
      ((b(3) & 0xFF) << 24)
  }
  private val RIFF = fourcc("RIFF"); private val AVI = fourcc("AVI ")
  private val LIST = fourcc("LIST"); private val HDRL = fourcc("hdrl")
  private val AVIH = fourcc("avih"); private val STRL = fourcc("strl")
  private val STRH = fourcc("strh"); private val STRF = fourcc("strf")
  private val VIDS = fourcc("vids"); private val MJPG = fourcc("MJPG")
  private val MOVI = fourcc("movi"); private val DC00 = fourcc("00dc")
  private val IDX1 = fourcc("idx1")
  private val AUDS = fourcc("auds"); private val WB01 = fourcc("01wb")

  /** Encode pre-compressed JPEG frames into a canonical AVI/MJPEG file. */
  def encodeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    require(frames.nonEmpty, "at least one frame")
    val paddedLens = frames.map(f => f.length + (f.length & 1))
    val moviDataLen = paddedLens.map(_ + 8).sum // 8 = ckid + cksize
    val moviListLen = 4 + moviDataLen // 'movi' fourcc + chunks
    val idxLen = frames.length * 16
    val hdrlListLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffLen = 4 + (8 + hdrlListLen) + (8 + moviListLen) + (8 + idxLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)

    buf.putInt(RIFF).putInt(riffLen).putInt(AVI)
    // ── LIST hdrl ──
    buf.putInt(LIST).putInt(hdrlListLen).putInt(HDRL)
    buf.putInt(AVIH).putInt(56)
    buf.putInt(1000000 / fps) // microseconds per frame
      .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      .putInt(frames.length).putInt(0).putInt(1) // totalFrames, initial, streams
      .putInt(frames.map(_.length).max) // suggested buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    buf.putInt(LIST).putInt(4 + (8 + 56) + (8 + 40)).putInt(STRL)
    buf.putInt(STRH).putInt(56)
    buf.putInt(VIDS).putInt(MJPG)
      .putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initial
      .putInt(1).putInt(fps) // scale, rate → rate/scale fps
      .putInt(0).putInt(frames.length) // start, length (in frames)
      .putInt(frames.map(_.length).max).putInt(-1).putInt(0) // buf, quality, sampleSize
      .putShort(0).putShort(0) // rcFrame left, top
      .putShort(width.toShort).putShort(height.toShort)
    buf.putInt(STRF).putInt(40)
    buf.putInt(40).putInt(width).putInt(height) // biSize, w, h
      .putShort(1).putShort(24).putInt(MJPG) // planes, bitCount, compression
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // ── LIST movi ──
    buf.putInt(LIST).putInt(moviListLen)
    val moviStart = buf.position() // position of the 'movi' fourcc
    buf.putInt(MOVI)
    val offsets = frames.map { f =>
      val off = buf.position() - moviStart // idx1 offset convention
      buf.putInt(DC00).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      (off, f.length)
    }
    // ── idx1 ──
    buf.putInt(IDX1).putInt(idxLen)
    offsets.foreach { case (off, len) =>
      buf.putInt(DC00).putInt(Keyframe).putInt(off).putInt(len)
    }
    buf.array()
  }

  private def reader(bytes: Array[Byte]): Option[ByteBuffer] =
    if (bytes == null || bytes.length < 12) None
    else {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.getInt != RIFF) None
      else { buf.getInt; if (buf.getInt != AVI) None else Some(buf) }
    }

  /** Parse container metadata from `avih` — no frame bytes touched. */
  def parseMeta(bytes: Array[Byte]): Option[AviMeta] =
    reader(bytes).flatMap { buf =>
      try {
        var meta: Option[AviMeta] = None
        while (meta.isEmpty && buf.remaining() >= 8) {
          val id = buf.getInt; val len = buf.getInt
          if (len < 0 || len > buf.remaining()) return None
          if (id == LIST && len >= 4) {
            val listType = buf.getInt
            if (listType == HDRL) {
              // descend: the next chunk must be avih
              if (buf.remaining() >= 8 && buf.getInt == AVIH) {
                val alen = buf.getInt
                if (alen < 40 || alen > buf.remaining()) return None
                val us = buf.getInt
                buf.getInt; buf.getInt; buf.getInt
                val total = buf.getInt
                buf.getInt; buf.getInt; buf.getInt
                val w = buf.getInt; val h = buf.getInt
                if (w < 0 || h < 0 || total < 0 || us < 0) return None
                meta = Some(AviMeta(w, h, us, total))
              } else return None
            } else buf.position(buf.position() + (len - 4) + (len & 1))
          } else buf.position(buf.position() + len + (len & 1))
        }
        meta
      } catch { case _: RuntimeException => None }
    }

  /** Frame (offset, length) table pointing at raw JPEG bytes inside the
    * payload. Prefers the `idx1` index (O(1) per entry — the "keyframe
    * seek" path); falls back to a linear `movi` walk when the index is
    * absent or inconsistent. Offsets in `idx1` may follow either public
    * convention (relative to the movi list's fourcc, or absolute); both
    * are detected by checking the bytes actually name a `00dc` chunk. */
  def frameTable(bytes: Array[Byte]): IndexedSeq[(Int, Int)] =
    chunkTable(bytes, DC00)

  private def chunkTable(bytes: Array[Byte],
      wantId: Int): IndexedSeq[(Int, Int)] = {
    val buf = reader(bytes).getOrElse(return IndexedSeq.empty)
    var moviStart = -1 // position of the 'movi' fourcc
    var idxPos = -1; var idxLen = 0
    try {
      while (buf.remaining() >= 8) {
        val id = buf.getInt; val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return IndexedSeq.empty
        if (id == LIST && len >= 4) {
          val p = buf.position()
          if (buf.getInt == MOVI) { moviStart = p; buf.position(p + len + (len & 1)) }
          else buf.position(p + len + (len & 1))
        } else if (id == IDX1) {
          idxPos = buf.position(); idxLen = len
          buf.position(buf.position() + len + (len & 1))
        } else buf.position(buf.position() + len + (len & 1))
      }
    } catch { case _: RuntimeException => return IndexedSeq.empty }
    if (moviStart < 0) return IndexedSeq.empty

    def chunkAt(pos: Int): Option[(Int, Int)] = {
      if (pos < 0 || pos + 8 > bytes.length) return None
      val b = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN)
      val id = b.getInt; val len = b.getInt
      if (id == wantId && len >= 0 && pos + 8 + len <= bytes.length)
        Some((pos + 8, len))
      else None
    }

    if (idxPos >= 0 && idxLen >= 16) {
      val n = idxLen / 16
      val idx = ByteBuffer.wrap(bytes, idxPos, n * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      val out = IndexedSeq.newBuilder[(Int, Int)]
      var ok = true
      var i = 0
      while (ok && i < n) {
        val ckid = idx.getInt; idx.getInt // flags
        val off = idx.getInt; idx.getInt // size (trust the chunk header)
        if (ckid == wantId) {
          chunkAt(moviStart + off).orElse(chunkAt(off)) match {
            case Some(c) => out += c
            case None => ok = false
          }
        }
        i += 1
      }
      if (ok) {
        val res = out.result()
        if (res.nonEmpty) return res
      }
    }
    // linear movi walk fallback
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var pos = moviStart + 4
    var continue = true
    while (continue && pos + 8 <= bytes.length) {
      val b = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN)
      val id = b.getInt; val len = b.getInt
      if (len < 0 || pos + 8 + len > bytes.length) continue = false
      else {
        if (id == wantId) out += ((pos + 8, len))
        else if (id == IDX1) continue = false // ran past movi into the index
        pos += 8 + len + (len & 1)
      }
    }
    out.result()
  }

  /** Stride-sample frames WITHOUT decoding the skipped ones: every
    * `stride`-th entry of the frame table, returned as
    * (frameIndex, jpegBytes). */
  def sampleFrameBytes(bytes: Array[Byte],
      stride: Int): Seq[(Int, Array[Byte])] = {
    require(stride >= 1, "stride must be >= 1")
    frameTable(bytes).zipWithIndex.collect {
      case ((off, len), i) if i % stride == 0 =>
        (i, java.util.Arrays.copyOfRange(bytes, off, off + len))
    }
  }

  /** Number of stored frames, from the index/container (no pixel work). */
  def frameCount(bytes: Array[Byte]): Int = frameTable(bytes).size

  /** Per-video temporal signature: dHash each `stride`-th decoded frame,
    * then majority-vote each of the 64 bits across frames. Near-duplicate
    * videos (re-encodes, small edits, a perturbed frame) land within a
    * small Hamming distance, so [[graft.operators.Dedup
    * .hammingPairsOfSignatures]] applies unchanged — the video analogue of
    * the image pHash path. None when no frame decodes. */
  def signature(bytes: Array[Byte], stride: Int): Option[Long] = {
    val hashes = sampleFrameBytes(bytes, stride)
      .flatMap { case (_, jpeg) => ImageCodec.decode(jpeg) }
      .map(ImageCodec.dHash)
    if (hashes.isEmpty) None
    else {
      var sig = 0L
      var b = 0
      while (b < 64) {
        var votes = 0
        hashes.foreach(h => if (((h >>> b) & 1L) == 1L) votes += 1)
        if (votes * 2 >= hashes.length) sig |= (1L << b)
        b += 1
      }
      Some(sig)
    }
  }

  /** Encode an interleaved audio+video AVI: MJPEG frames in stream 0
    * ('00dc') and 16-bit mono PCM in stream 1 ('01wb'), the PCM split
    * evenly across frame periods, both streams declared by their own
    * `strl` (video BITMAPINFOHEADER / audio WAVEFORMATEX) and indexed in
    * `idx1` — a genuine muxed A/V container, not two files glued. */
  def encodeAviAv(frames: Seq[Array[Byte]], samples: Array[Short],
      width: Int, height: Int, fps: Int, sampleRate: Int): Array[Byte] = {
    require(fps > 0 && sampleRate > 0, "fps and sampleRate must be positive")
    require(frames.nonEmpty, "at least one frame")
    val nF = frames.length
    val spf = (samples.length + nF - 1) / nF // samples per frame period
    val audioChunks: Seq[Array[Byte]] = (0 until nF).map { i =>
      val from = math.min(samples.length, i * spf)
      val to = math.min(samples.length, (i + 1) * spf)
      val b = ByteBuffer.allocate((to - from) * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      var j = from
      while (j < to) { b.putShort(samples(j)); j += 1 }
      b.array()
    }
    def padded(a: Array[Byte]) = a.length + (a.length & 1)
    val moviDataLen = frames.map(f => padded(f) + 8).sum +
      audioChunks.map(a => padded(a) + 8).sum
    val moviListLen = 4 + moviDataLen
    val idxLen = (nF * 2) * 16
    val vidStrl = 4 + (8 + 56) + (8 + 40)
    val audStrl = 4 + (8 + 56) + (8 + 16)
    val hdrlListLen = 4 + (8 + 56) + (8 + vidStrl) + (8 + audStrl)
    val riffLen = 4 + (8 + hdrlListLen) + (8 + moviListLen) + (8 + idxLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)

    buf.putInt(RIFF).putInt(riffLen).putInt(AVI)
    buf.putInt(LIST).putInt(hdrlListLen).putInt(HDRL)
    buf.putInt(AVIH).putInt(56)
    buf.putInt(1000000 / fps)
      .putInt(0).putInt(0).putInt(0)
      .putInt(nF).putInt(0).putInt(2) // two streams
      .putInt(frames.map(_.length).max)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // stream 0: video
    buf.putInt(LIST).putInt(vidStrl).putInt(STRL)
    buf.putInt(STRH).putInt(56)
    buf.putInt(VIDS).putInt(MJPG)
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps)
      .putInt(0).putInt(nF)
      .putInt(frames.map(_.length).max).putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
    buf.putInt(STRF).putInt(40)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(MJPG)
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // stream 1: audio (PCM mono 16-bit)
    buf.putInt(LIST).putInt(audStrl).putInt(STRL)
    buf.putInt(STRH).putInt(56)
    buf.putInt(AUDS).putInt(0) // handler 0 = PCM
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(sampleRate) // scale, rate → samples/sec
      .putInt(0).putInt(samples.length) // start, length (in samples)
      .putInt(spf * 2).putInt(-1).putInt(2) // buf, quality, sampleSize
      .putShort(0).putShort(0).putShort(0).putShort(0)
    buf.putInt(STRF).putInt(16) // WAVEFORMATEX fixed part
    buf.putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    // movi: interleave 00dc / 01wb per frame period
    buf.putInt(LIST).putInt(moviListLen)
    val moviStart = buf.position()
    buf.putInt(MOVI)
    val entries = (0 until nF).flatMap { i =>
      val vOff = buf.position() - moviStart
      buf.putInt(DC00).putInt(frames(i).length).put(frames(i))
      if ((frames(i).length & 1) == 1) buf.put(0.toByte)
      val aOff = buf.position() - moviStart
      buf.putInt(WB01).putInt(audioChunks(i).length).put(audioChunks(i))
      if ((audioChunks(i).length & 1) == 1) buf.put(0.toByte)
      Seq((DC00, vOff, frames(i).length), (WB01, aOff, audioChunks(i).length))
    }
    buf.putInt(IDX1).putInt(idxLen)
    entries.foreach { case (ckid, off, len) =>
      buf.putInt(ckid).putInt(Keyframe).putInt(off).putInt(len)
    }
    buf.array()
  }

  /** Audio sample rate from the `auds` stream's WAVEFORMATEX — header
    * walk only. None when the container has no PCM-mono-16 audio stream. */
  def audioRate(bytes: Array[Byte]): Option[Int] =
    reader(bytes).flatMap { buf =>
      try {
        var rate: Option[Int] = None
        var sawAuds = false
        def walkList(end: Int): Unit =
          while (rate.isEmpty && buf.position() + 8 <= end) {
            val id = buf.getInt; val len = buf.getInt
            if (len < 0 || len > end - buf.position()) return
            val next = buf.position() + len + (len & 1)
            if (id == LIST && len >= 4) { buf.getInt; walkList(next) }
            else if (id == STRH && len >= 4) sawAuds = buf.getInt == AUDS
            else if (id == STRF && sawAuds && len >= 16) {
              val fmt = buf.getShort; val ch = buf.getShort
              val sr = buf.getInt; buf.getInt; buf.getShort
              val bits = buf.getShort
              if (fmt == 1 && ch == 1 && bits == 16 && sr > 0)
                rate = Some(sr)
              else sawAuds = false
            }
            buf.position(math.min(next, end))
          }
        walkList(bytes.length)
        rate
      } catch { case _: RuntimeException => None }
    }

  /** Demux the PCM audio stream: concatenated `01wb` chunk payloads →
    * (sampleRate, samples) — the SAME contract as
    * [[AudioCodec.decodeWav]], so every audio kernel (features,
    * decimation, acoustic fingerprint) runs unchanged on video payloads. */
  def demuxAudio(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    audioRate(bytes).flatMap { rate =>
      val chunks = chunkTable(bytes, WB01)
      if (chunks.isEmpty) None
      else {
        val total = chunks.map(_._2).sum / 2
        val out = new Array[Short](total)
        var k = 0
        chunks.foreach { case (off, len) =>
          val b = ByteBuffer.wrap(bytes, off, len)
            .order(ByteOrder.LITTLE_ENDIAN)
          val n = len / 2
          var i = 0
          while (i < n) { out(k) = b.getShort; k += 1; i += 1 }
        }
        Some((rate, if (k == out.length) out
        else java.util.Arrays.copyOf(out, k)))
      }
    }

  /** JPEG-encode a raster with the JDK codec (quality left at the writer
    * default — deterministic for a fixed JDK). */
  def encodeJpeg(r: ImageCodec.Raster): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(r.width, r.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, r.width, r.height, r.argb, 0, r.width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic MJPEG clip: `n` frames of the hash-gradient
    * raster family, consecutive frames related by seed stepping — the
    * generator behind test payloads (stands in for reading real files). */
  def syntheticVideo(seed: Long, n: Int, w: Int, h: Int,
      fps: Int = 10): Array[Byte] = {
    val frames = (0 until n).map(i =>
      encodeJpeg(ImageCodec.syntheticImage(seed * 1000L + i * 7L, w, h)))
    encodeAvi(frames, w, h, fps)
  }
}
