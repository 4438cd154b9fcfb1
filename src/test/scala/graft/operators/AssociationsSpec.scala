package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AssociationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("coOccurrencePairs counts unordered distinct pairs per basket") {
    val df = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "b"), // duplicate item collapses
      (4, "c")).toDF("basket", "item")
    val got = Associations.coOccurrencePairs(df, "basket", "item",
        minSupport = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.head == ("a", "b", 3L))
    assert(got.toSet == Set(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("coOccurrencePairs support cut and top-k ordering") {
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"))
      .toDF("basket", "item")
    val got = Associations.coOccurrencePairs(df, "basket", "item",
      minSupport = 2, topK = 10).collect()
    assert(got.length == 1 && got(0).getString(0) == "x" &&
      got(0).getString(1) == "y" && got(0).getLong(2) == 2L)
  }

  test("mutualInformation: determined column has MI = H(Y)") {
    // y = f(x): MI = H(Y); uniform 2-way split -> H(Y) = 1 bit
    val df = (1 to 100).map(i => (s"k${i % 4}", s"v${i % 2}"))
      .toDF("x", "y")
    val r = Associations.mutualInformation(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("h_y") == 1.0)
    assert(r.getAs[Double]("mi") == 1.0)
    assert(r.getAs[Double]("h_x") == 2.0) // uniform 4-way
  }

  test("mutualInformation: independent columns have MI = 0") {
    val rows = for (x <- 0 until 4; y <- 0 until 3) yield (s"x$x", s"y$y")
    val r = Associations.mutualInformation(rows.toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("mi")) < 1e-9)
    assert(r.getAs[Double]("h_xy") ==
      BigDecimal(math.log(12.0) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pmiCollocations scores a planted collocation above stopword pairs") {
    // "new york" always adjacent and rare; "the the" frequent but expected
    val docs = ((1 to 10).map(i => s"doc$i" -> "visit new york today") ++
      (1 to 10).map(i => s"filler$i" ->
        "the cat the dog the bird the fish")).toDF("id", "text")
    val got = CorpusStats.pmiCollocations(docs, "text",
      minCount = 5, topK = 5).collect()
    val bigrams = got.map(_.getString(0))
    assert(bigrams.contains("new york"))
    val ny = got.find(_.getString(0) == "new york").get
    assert(ny.getAs[Long]("c_ab") == 10L)
    // c_a = c_b = 10; N = 40 + 80 tokens, NB = 30 + 70 bigrams:
    // pmi = log2((10/100) / ((10/120)^2))
    val expected = math.log((10.0 / 100) / ((10.0 / 120) * (10.0 / 120))) /
      math.log(2.0)
    assert(math.abs(ny.getAs[Double]("pmi") - expected) < 5e-5)
    // the planted collocation outscores every "the X" pair
    val thePairs = got.filter(_.getString(0).startsWith("the "))
    assert(thePairs.forall(_.getAs[Double]("pmi") < ny.getAs[Double]("pmi")))
  }
}
