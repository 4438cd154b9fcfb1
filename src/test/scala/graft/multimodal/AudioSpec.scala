package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wav encode/decode round-trips samples and rate exactly") {
    val samples = AudioCodec.syntheticAudio(42L, 3000)
    val bytes = AudioCodec.encodeWav(samples, 8000)
    assert(bytes.length == 44 + 6000)
    val Some((rate, back)) = AudioCodec.decodeWav(bytes)
    assert(rate == 8000 && back.sameElements(samples))
  }

  test("decoder rejects junk and non-PCM payloads") {
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decodeWav(
      Array.fill[Byte](100)(0x41)).isEmpty) // "AAAA..." not RIFF
    // corrupt a valid header's format tag → rejected
    val good = AudioCodec.encodeWav(Array[Short](1, 2, 3), 8000)
    val bad = good.clone(); bad(20) = 7 // fmt != 1 (PCM)
    assert(AudioCodec.decodeWav(bad).isEmpty)
  }

  test("single-byte fuzz anywhere in a valid wav never throws") {
    val good = AudioCodec.encodeWav(AudioCodec.syntheticAudio(7L, 1200), 8000)
    var i = 0
    while (i < good.length) {
      val fuzzed = good.clone()
      fuzzed(i) = (fuzzed(i) ^ 0x5A).toByte
      AudioCodec.decodeWav(fuzzed) // may be None; must not throw
      i += 1
    }
  }

  test("decoder walks extra chunks before data") {
    // insert a LIST chunk between fmt and data
    val samples = Array[Short](100, -200, 300)
    val canonical = AudioCodec.encodeWav(samples, 16000)
    val head = canonical.take(36) // RIFF..fmt chunk end
    val data = canonical.drop(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withExtra = head ++ listChunk ++ data
    val Some((rate, back)) = AudioCodec.decodeWav(withExtra)
    assert(rate == 16000 && back.sameElements(samples))
  }

  test("features: silence, full-scale square wave, and decimation") {
    assert(AudioCodec.features(8000, Array.fill[Short](800)(0))
      .sameElements(Array(0.1, 0.0, 0.0, 0.0)))
    // alternating full-scale square: rms = 1 (almost), zcr ~ 1
    val square = Array.tabulate[Short](1000)(i =>
      if (i % 2 == 0) 32767 else -32767)
    val f = AudioCodec.features(8000, square)
    assert(math.abs(f(1) - 32767.0 / 32768.0) < 1e-9)
    assert(f(2) == 999.0 / 1000.0 && f(3) == 32767.0 / 32768.0)
    val (r2, s2) = AudioCodec.decimate(8000, square, 2)
    assert(r2 == 4000 && s2.length == 500 && s2.forall(_ == 32767))
  }

  test("spark-side audio pipeline is map-only and deterministic") {
    val df = (0L until 50L).toDF("doc_id")
    val out = Multimodal.withGeneratedAudioColumn(df, "doc_id")
      .withColumn("f", Multimodal.decodedAudioFeatures(col("audio")))
      .select(col("doc_id"), element_at(col("f"), 1).as("dur"),
        element_at(col("f"), 2).as("rms"))
    val rows = out.collect()
    assert(rows.length == 50 && rows.forall(_.getDouble(2) > 0.0))
    // duration matches the declared metadata exactly
    val meta = Multimodal.withGeneratedAudioColumn(df, "doc_id")
      .select(col("doc_id"),
        (col("audioMeta.nSamples").cast("double") / 8000.0).as("want"))
    val joined = out.join(meta, "doc_id")
      .filter(abs(col("dur") - col("want")) > 1e-12)
    assert(joined.isEmpty)
    out.queryExecution.executedPlan.toString
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "audio decode must be map-only")
  }
}
