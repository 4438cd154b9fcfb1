package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JackKnifeSpec extends AnyFunSuite {

  test("fewer than 20 samples -> None") {
    assert(JackKnife.jackknife(Seq.fill(19)(1.0f)).isEmpty)
    assert(JackKnife.jackknife(Nil).isEmpty)
  }

  test("zero range -> None (threshold <= 0)") {
    assert(JackKnife.jackknife(Seq.fill(30)(5.0f)).isEmpty)
  }

  test("clear outlier tail is flagged") {
    // uniform 1..30 plus a far point: only the far point's gap statistic
    // exceeds the threshold (a tight cluster + far point would instead
    // cascade flags through the below-mean side and trip the failsafe)
    val samples = (1 to 30).map(_.toFloat) :+ 100.0f
    val stats = JackKnife.jackknife(samples).get
    assert(stats.outlierValues.contains(100.0f))
    assert(!stats.triggerFailsafe)
    assert(stats.sampleSize == 31)
    assert(stats.max == 100.0f)
  }

  test("tight cluster + far point trips the failsafe (flags cascade)") {
    val base = (1 to 30).map(i => 10.0f + (i % 5) * 0.1f)
    val stats = JackKnife.jackknife(base :+ 100.0f).get
    assert(stats.triggerFailsafe)
    assert(stats.outlierValues.isEmpty)
  }

  test("no outliers in uniform spread") {
    val samples = (1 to 40).map(_.toFloat)
    val stats = JackKnife.jackknife(samples).get
    assert(stats.outlierValues.isEmpty)
  }

  test("failsafe clears outliers when more than half flagged") {
    // two tight clusters far apart: flagging propagates across > half
    val samples = Seq.fill(12)(0.0f) ++ Seq.fill(9)(0.001f) ++ Seq(1000f, 1000.1f)
    JackKnife.jackknife(samples).foreach { s =>
      if (s.triggerFailsafe) assert(s.outlierValues.isEmpty)
    }
  }

  test("stats match direct computation") {
    val samples = (1 to 25).map(_.toFloat)
    val s = JackKnife.jackknife(samples).get
    assert(s.mean == 13.0f)
    assert(s.min == 1.0f && s.max == 25.0f && s.range == 24.0f)
    val expected = ((0.95 * math.sqrt(25) + 0.2) * (24.0f / 50)).toFloat
    assert(math.abs(s.threshold - expected) < 1e-6)
  }
}
