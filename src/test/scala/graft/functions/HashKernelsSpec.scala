package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HashKernelsSpec extends AnyFunSuite {
  import HashKernels._

  private def naiveLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded levenshtein agrees with full DP for k in 0..3") {
    val words = Seq("", "a", "ab", "abc", "abcd", "axcd", "bacd", "abdc",
      "Customer#000000001", "Customer#000000100", "Customer#000001001",
      "Customer#999999999", "kitten", "sitting", "flaw", "lawn")
    for (a <- words; b <- words; k <- 0 to 3) {
      val expected = naiveLev(a, b) <= k
      assert(levenshteinWithin(a, b, k) == expected,
        s"'$a' vs '$b' k=$k expected $expected")
    }
  }

  test("hashed shingles match string shingles in count") {
    val text = "the quick brown fox jumps over the lazy dog"
    assert(charShinglesHashed(text, 5).length == charShingles(text, 5).length)
    assert(charShinglesHashed("ab", 5).length == 1)
  }

  test("jaccardLong equals jaccard on equivalent sets") {
    val a = "spark makes distributed joins easy"
    val b = "spark makes distributed aggregation easy"
    val js = jaccard(charShingles(a, 4), charShingles(b, 4))
    val jl = jaccardLong(charShinglesHashed(a, 4), charShinglesHashed(b, 4))
    assert(math.abs(js - jl) < 1e-12)
  }
}
