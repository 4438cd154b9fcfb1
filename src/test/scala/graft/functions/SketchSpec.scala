package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── BloomFilterAgg ──

  test("bloom filter has no false negatives and bounded false positives") {
    val members = (0L until 2000L).map(i => i * 2654435761L)
    val bits = new Array[Long](BloomFilterAgg.sizeFor(2000) / 64)
    members.foreach(BloomFilterAgg.set(bits, _))
    assert(members.forall(BloomFilterAgg.mightContain(bits, _)))
    val probes = (1L to 10000L).map(i => i * 0x9e3779b97f4a7c15L + 7L)
      .filterNot(members.toSet)
    val fp = probes.count(BloomFilterAgg.mightContain(bits, _))
    // ~10 bits/element, k=7 → theoretical fp < 1%; allow 3% slack
    assert(fp < probes.size * 0.03, s"false-positive rate too high: $fp")
  }

  test("bloom aggregator merge ORs to the single-pass filter") {
    val agg = new BloomFilterAgg(1024)
    val xs = (0L until 500L).map(i => i * 31L + 5L)
    val (a, b) = xs.splitAt(250)
    val partA = a.foldLeft(agg.zero.clone())(agg.reduce)
    val partB = b.foldLeft(agg.zero.clone())(agg.reduce)
    val merged = agg.merge(partA, partB)
    val single = xs.foldLeft(agg.zero.clone())(agg.reduce)
    assert(merged.sameElements(single))
  }

  test("distributed bloom aggregate equals local build") {
    val xs = (0L until 3000L).map(i => i * 1099511628211L)
    val bloomAgg = udaf(new BloomFilterAgg(4096))
    val distributed = xs.toDF("x").repartition(7)
      .agg(bloomAgg(col("x"))).head().getAs[Seq[Long]](0).toArray
    val local = xs.foldLeft(new Array[Long](64)) { (b, x) =>
      BloomFilterAgg.set(b, x); b
    }
    assert(distributed.sameElements(local))
  }

  // ── BottomKAgg ──

  test("bottom-k aggregator equals brute-force sorted distinct take(k)") {
    val agg = new BottomKAgg(8)
    val vs = Seq("m", "c", "x", "c", "a", "q", "b", "m", "z", "d", "e",
      "f", "g", "h", "a")
    val viaAgg = vs.foldLeft(agg.zero)(agg.reduce)
    assert(viaAgg == vs.distinct.sorted.take(8))
    // merge of two partial buffers = bottom-k of the union
    val (l, r) = vs.splitAt(7)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == vs.distinct.sorted.take(8))
  }

  test("distributed bottom-k sketch equals collect-sort-take") {
    val data = (0 until 5000).map(i => f"${(i * 7919) % 1000}%06d")
    val bk = udaf(new BottomKAgg(32))
    val sketch = data.toDF("h").repartition(5)
      .agg(bk(col("h"))).head()
      .getAs[scala.collection.Seq[String]](0).toList
    assert(sketch == data.distinct.sorted.take(32))
  }

  // ── AhoCorasick ──

  test("aho-corasick matches exactly the contains() battery") {
    val pats = Seq("he", "she", "his", "hers", "agg row", "row")
    val ac = AhoCorasick(pats)
    for (text <- Seq("ushers", "key agg row scan", "shis", "", "xyz",
        "hehehe", "hershey", "rows of aggs")) {
      val expected = pats.filter(text.contains(_))
      assert(ac.matchedPatterns(text) == expected, s"text='$text'")
    }
  }

  test("aho-corasick counts overlapping occurrences") {
    val ac = AhoCorasick(Seq("aa"))
    assert(ac.countMatches("aaaa") == 3L) // positions 0,1,2
    val ac2 = AhoCorasick(Seq("he", "she", "hers"))
    // "shers": she@1, he@2, hers@1 → 3
    assert(ac2.countMatches("shers") == 3L)
  }

  test("aho-corasick on a large random text agrees with a regex scan") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    val text = Seq.fill(20000)(alphabet(rnd.nextInt(4))).mkString
    val pats = Seq("abca", "dcb", "aaaa", "bcd", "dd")
    val ac = AhoCorasick(pats)
    assert(ac.matchedPatterns(text) == pats.filter(text.contains(_)))
    val expectedCount = pats.map { p =>
      Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
        .takeWhile(_ >= 0).size
    }.sum
    assert(ac.countMatches(text) == expectedCount)
  }
}
