package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class FrequencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def exactHeavy(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("heavyHitters equals the exact count filter on a skewed stream") {
    val items = Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 300).map(i => s"cold$i")
    val df = items.toDF("v").repartition(7) // force cross-partition merges
    val got = Frequency.heavyHitters(df, "v", 8)
      .as[(String, Long)].collect().toMap
    assert(got == exactHeavy(items, 8))
    assert(got.contains("hot") && got.contains("warm"))
  }

  test("heavyHitters with more capacity than distinct items is plain topk") {
    val items = Seq("a", "a", "a", "b", "b", "c")
    val got = Frequency.heavyHitters(items.toDF("v"), "v", 4)
      .as[(String, Long)].collect().toMap
    // threshold 6/4 = 1.5 → a(3) and b(2) pass, c(1) does not
    assert(got == Map("a" -> 3L, "b" -> 2L))
  }

  test("heavyHitters returns empty when nothing crosses N/k") {
    val items = (1 to 100).map(i => s"u$i") // all frequency 1, k=50
    assert(Frequency.heavyHitters(items.toDF("v"), "v", 50).isEmpty)
  }

  test("MG sketch guarantee: any item above N/k survives the sketch") {
    // adversarial order: heavy item interleaved with a long unique tail
    val items = (1 to 400).flatMap(i => Seq(s"u$i", "heavy")) ++
      (1 to 399).map(i => s"v$i")
    val agg = new Frequency.MisraGriesAgg(10)
    // single-threaded reduce in stream order, then a lopsided merge
    val (front, back) = items.splitAt(301)
    val b1 = front.foldLeft(agg.zero)(agg.reduce)
    val b2 = back.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(b1, b2)
    // heavy: 400 of 1199 total > N/10 → must be present
    assert(merged.counts.contains("heavy"))
    assert(merged.total == 1199L)
    assert(merged.counts.size <= 10)
    // MG bound: stored count undershoots by at most N/k
    assert(merged.counts("heavy") >= 400L - 1199L / 10)
  }
}
