package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REAL AVI/MJPEG video path: container roundtrip, idx1-seek vs linear
  * walk equivalence, untrusted-payload tolerance, stride sampling with
  * genuine JPEG pixel decode, and temporal-signature near-dup pairing. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("avi encode/parse roundtrips meta and every frame's jpeg bytes") {
    val frames = (0 until 5).map(i =>
      VideoCodec.encodeJpeg(ImageCodec.syntheticImage(7L + i, 20, 14)))
    val avi = VideoCodec.encodeAvi(frames, 20, 14, 25)
    val Some(meta) = VideoCodec.parseMeta(avi)
    assert(meta.width == 20 && meta.height == 14)
    assert(meta.totalFrames == 5 && meta.usPerFrame == 40000)
    val table = VideoCodec.frameTable(avi)
    assert(table.size == 5)
    table.zipWithIndex.foreach { case ((off, len), i) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), frames(i)))
    }
  }

  test("idx1 seek and linear movi walk find the same frames") {
    val frames = (0 until 4).map(i =>
      VideoCodec.encodeJpeg(ImageCodec.syntheticImage(100L + i, 17, 13)))
    val avi = VideoCodec.encodeAvi(frames, 17, 13, 10)
    val viaIdx = VideoCodec.frameTable(avi)
    // blind the index: corrupt idx1's fourcc so the parser must fall back
    val noIdx = avi.clone()
    val idxPos = {
      // locate 'idx1' by scanning (test-only)
      val pat = "idx1".getBytes("US-ASCII")
      (0 until avi.length - 4).find(p =>
        avi(p) == pat(0) && avi(p + 1) == pat(1) &&
        avi(p + 2) == pat(2) && avi(p + 3) == pat(3)).get
    }
    noIdx(idxPos) = 'J'.toByte
    val viaWalk = VideoCodec.frameTable(noIdx)
    assert(viaIdx == viaWalk)
  }

  test("parser tolerates junk, truncation, and hostile lengths") {
    assert(VideoCodec.parseMeta(null).isEmpty)
    assert(VideoCodec.parseMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.parseMeta(Array.fill[Byte](200)(0x41)).isEmpty)
    assert(VideoCodec.frameTable(Array.fill[Byte](64)(0x7F)).isEmpty)
    val good = VideoCodec.syntheticVideo(1L, 3, 16, 12)
    // truncate mid-movi: parse must not throw; meta (header) still reads
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length / 2)
    VideoCodec.frameTable(cut) // no throw
    assert(VideoCodec.parseMeta(cut).nonEmpty)
    // hostile declared length: claim a chunk bigger than the buffer
    val evil = good.clone()
    val riffLenPos = 4
    evil(riffLenPos) = -1; evil(riffLenPos + 1) = -1
    evil(riffLenPos + 2) = -1; evil(riffLenPos + 3) = 0x7F
    VideoCodec.parseMeta(evil) // no allocation blow-up, no throw
  }

  test("stride sampling decodes only every k-th frame, pixels real") {
    val avi = VideoCodec.syntheticVideo(42L, 7, 24, 16)
    val sampled = VideoCodec.sampleFrameBytes(avi, 3)
    assert(sampled.map(_._1) == Seq(0, 3, 6))
    sampled.foreach { case (_, jpeg) =>
      val Some(r) = ImageCodec.decode(jpeg)
      assert(r.width == 24 && r.height == 16)
      // decoded JPEG of a hash-gradient raster is never a constant field
      assert(r.argb.distinct.length > 1)
    }
    assert(VideoCodec.frameCount(avi) == 7)
  }

  test("temporal signature: re-encode stable, frame edit lands nearby") {
    val frames = (0 until 4).map(i =>
      VideoCodec.encodeJpeg(ImageCodec.syntheticImage(900L + i * 7L, 20, 16)))
    val a = VideoCodec.encodeAvi(frames, 20, 16, 10)
    val b = VideoCodec.encodeAvi(frames, 20, 16, 30) // same frames, new fps
    val Some(sa) = VideoCodec.signature(a, 1)
    val Some(sb) = VideoCodec.signature(b, 1)
    assert(sa == sb) // container-level change: identical signature
    // unrelated clip: far away in Hamming space
    val other = VideoCodec.syntheticVideo(31337L, 4, 20, 16)
    val Some(so) = VideoCodec.signature(other, 1)
    assert(java.lang.Long.bitCount(sa ^ so) > 10)
  }

  test("spark pipeline: meta scan + frame sampling explode, map-only") {
    val df = (0L until 40L).toDF("doc_id")
    val vids = Multimodal.withGeneratedVideoColumn(df, "doc_id")
    // header-only meta scan agrees with the generator's meta struct
    val metas = vids.select(col("doc_id"),
        Multimodal.videoMetaOf(col("video")).as("m"),
        col("videoMeta")).collect()
    metas.foreach { r =>
      val m = r.getStruct(1)
      val want = r.getStruct(2)
      assert(m.getInt(0) == want.getInt(1)) // width
      assert(m.getInt(1) == want.getInt(2)) // height
      assert(m.getInt(2) == want.getInt(3)) // usPerFrame
      assert(m.getInt(3) == want.getInt(4)) // nFrames
    }
    val frames = Multimodal.sampleAviFrames(vids, "video", stride = 2)
      .select("doc_id", "frameIndex", "frameWidth", "frameFeatures")
    val rows = frames.collect()
    // every sampled index is even; per-doc counts = ceil(nFrames/2)
    assert(rows.forall(_.getInt(1) % 2 == 0))
    val perDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    (0L until 40L).foreach { id =>
      val n = (id % 5).toInt + 3
      assert(perDoc(id) == (n + 1) / 2, s"doc $id")
    }
    // features are the real 11-dim image descriptor
    assert(rows.forall(_.getSeq[Float](3).length == 11))
  }

  test("muxed a/v container: audio demux roundtrips PCM exactly, video intact") {
    val frames = (0 until 3).map(i =>
      VideoCodec.encodeJpeg(ImageCodec.syntheticImage(500L + i, 18, 14)))
    val samples = AudioCodec.syntheticAudio(99L, 2400)
    val av = VideoCodec.encodeAviAv(frames, samples, 18, 14, 10, 8000)
    // audio: rate + every sample back, bit-exact
    assert(VideoCodec.audioRate(av).contains(8000))
    val Some((rate, back)) = VideoCodec.demuxAudio(av)
    assert(rate == 8000 && back.sameElements(samples))
    // video: frame table unchanged by the interleaved audio chunks
    val table = VideoCodec.frameTable(av)
    assert(table.size == 3)
    table.zipWithIndex.foreach { case ((off, len), i) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(av, off, off + len), frames(i)))
    }
    // meta still reads; a video-only file has no audio stream
    assert(VideoCodec.parseMeta(av).exists(_.totalFrames == 3))
    val videoOnly = VideoCodec.encodeAvi(frames, 18, 14, 10)
    assert(VideoCodec.audioRate(videoOnly).isEmpty)
    assert(VideoCodec.demuxAudio(videoOnly).isEmpty)
    // features computed from the demuxed track match the wav-path kernel
    assert(AudioCodec.features(rate, back)
      .sameElements(AudioCodec.features(8000, samples)))
  }

  test("spark a/v pipeline: one binary column feeds audio AND frame kernels") {
    val df = (0L until 30L).toDF("doc_id")
    val av = Multimodal.withGeneratedAvColumn(df, "doc_id")
    val out = av.select(col("doc_id"),
        Multimodal.demuxedAudioFeatures(col("av")).as("af"),
        Multimodal.videoMetaOf(col("av")).as("m"))
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val n = (id % 4).toInt + 2
      val af = r.getSeq[Double](1)
      // duration = n*800 samples at 8 kHz
      assert(math.abs(af.head - n * 800 / 8000.0) < 1e-9, s"doc $id")
      assert(r.getStruct(2).getInt(3) == n) // nFrames from avih
    }
    // frame sampling runs unchanged on the muxed payload
    val frames = Multimodal.sampleAviFrames(av, "av", stride = 1)
      .groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 30L).foreach { id =>
      assert(frames(id) == (id % 4) + 2, s"doc $id")
    }
  }

  test("property: random clips roundtrip container + survive byte fuzz") {
    // raw ScalaCheck generators sampled deterministically (the scalatest
    // bridge artifact is not in the offline cache)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.zip(Gen.choose(1, 9), Gen.choose(9, 40),
      Gen.choose(8, 30), Gen.choose(1L, 100000L))
    var seed = Seed(7L)
    var i = 0
    while (i < 40) {
      gen.apply(Gen.Parameters.default, seed).foreach { case (n, w, h, s) =>
        val avi = VideoCodec.syntheticVideo(s, n, w, h)
        val Some(m) = VideoCodec.parseMeta(avi)
        assert(m.width == w && m.height == h && m.totalFrames == n)
        assert(VideoCodec.frameCount(avi) == n)
        VideoCodec.sampleFrameBytes(avi, 2).foreach { case (_, jpeg) =>
          val Some(r) = ImageCodec.decode(jpeg)
          assert(r.width == w && r.height == h)
        }
        // single-byte fuzz anywhere must never throw (decode may fail)
        val pos = (s % avi.length).toInt
        val fuzzed = avi.clone(); fuzzed(pos) = (fuzzed(pos) ^ 0x5A).toByte
        VideoCodec.parseMeta(fuzzed); VideoCodec.frameTable(fuzzed)
        VideoCodec.signature(fuzzed, 1)
      }
      seed = seed.next
      i += 1
    }
  }

  test("near-dup videos pair with their originals, not across seeds") {
    val base = (0L until 60L).toDF("vid_id")
    val vids = Multimodal.withNearDupVideoColumn(base, "vid_id")
    val pairs = Multimodal
      .videoNearDupPairs(vids, "vid_id", "video", stride = 1, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (2k, 2k+1) planted pair found
    (0L until 30L).foreach { k =>
      assert(pairs.contains((2 * k, 2 * k + 1)), s"planted pair $k missing")
    }
    // no pair spans different seeds
    pairs.foreach { case (x, y) => assert(x / 2 == y / 2, s"spurious ($x,$y)") }
  }
}
