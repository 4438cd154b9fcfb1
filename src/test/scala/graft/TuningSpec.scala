package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the data-aware shuffle-partition formula (VERDICT r11 item 3):
  * the default must reproduce the hand-tuned values that swept the
  * measured decades clean, floor to one-per-core at the record SF, and
  * never run away on huge inputs. */
class TuningSpec extends AnyFunSuite {

  test("formula: floors to cpus at record scale, tracks data beyond") {
    // sf0.1 is ~17 MB — the record config must stay one per core
    assert(Tuning.partitionsForBytes(17L << 20, 32) == 32)
    assert(Tuning.partitionsForBytes(17L << 20, 16) == 16)
    // 10× is ~174 MB — reproduces the hand-picked 64-neighbourhood
    val p10 = Tuning.partitionsForBytes(174L << 20, 16)
    assert(p10 >= 32 && p10 <= 96, s"10x gave $p10")
    // 100× is ~1.7 GB — same order as the hand-picked 256
    val p100 = Tuning.partitionsForBytes(1737L << 20, 16)
    assert(p100 >= 256 && p100 <= 1024, s"100x gave $p100")
    // monotone in bytes, capped at 4096
    assert(Tuning.partitionsForBytes(1L << 40, 16) == 4096)
    assert(Tuning.partitionsForBytes(0L, 8) == 8)
  }

  test("dirBytes sums nested regular files; absent dir reads as zero") {
    val d = java.nio.file.Files.createTempDirectory("tuning_spec")
    java.nio.file.Files.createDirectory(d.resolve("t.parquet"))
    java.nio.file.Files.write(d.resolve("t.parquet/part-0"),
      new Array[Byte](1000))
    java.nio.file.Files.write(d.resolve("top"), new Array[Byte](500))
    assert(Tuning.dirBytes(d.toString) == 1500L)
    assert(Tuning.dirBytes(d.resolve("nope").toString) == 0L)
  }

  test("the real testdata dirs land where the measured decades did") {
    import SparkTestSession.{sfDir, fixturesPresent}
    assume(fixturesPresent("0.1"), "testdata fixtures absent")
    // record SF: data is small enough that cores win the clamp
    assert(Tuning.partitionsForBytes(
      Tuning.dirBytes(sfDir("0.1")), 32) == 32)
  }
}
