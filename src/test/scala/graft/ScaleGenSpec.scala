package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the derived-rehearsal-data fidelity properties the 100× sweep
  * taught (SURVEY §9.4): honest k× growth must not manufacture quadratic
  * duplicate workloads. Each property here failed — and poisoned the
  * measurements — before round 11's ScaleGen fixes:
  *
  *   - constant `c_name` across copies → every name a k-clique → the
  *     linkage family paid C(k,2) artificial pairs per base customer;
  *   - word-suffix text decorrelation → cross-copy docs still shared
  *     most CHAR trigrams → ~k shingle-sharing twins per doc → the
  *     n-gram family OOM'd on ~742M candidate pairs at 100×.
  */
class ScaleGenSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir, fixturesPresent}

  private val k = 3
  private lazy val dest: String = {
    assume(fixturesPresent("0.001"), "testdata fixtures absent")
    val d = java.nio.file.Files
      .createTempDirectory("scalegen_spec").toString
    ScaleGen.derive(spark, sfDir("0.001"), d, k)
    d
  }
  private def t(name: String) =
    spark.read.parquet(s"$dest/$name.parquet")
  private def base(name: String) =
    spark.read.parquet(s"${sfDir("0.001")}/$name.parquet")

  test("row counts scale by k; dimensions copied once") {
    assert(t("customer").count() == k * base("customer").count())
    assert(t("lineitem").count() == k * base("lineitem").count())
    assert(t("documents").count() == k * base("documents").count())
    assert(t("nation").count() == base("nation").count())
  }

  test("referential integrity: every o_custkey resolves at every copy") {
    val orphans = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans == 0L)
  }

  test("c_name is re-derived from the shifted key — no k-cliques") {
    val dup = t("customer").groupBy("c_name").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "duplicate names would make every name a k-clique")
    val bad = t("customer").filter(
      col("c_name") =!= format_string("Customer#%09d", col("c_custkey")))
      .count()
    assert(bad == 0L, "names must follow the TPC-H generator rule")
  }

  test("copy 0 is byte-identical to the base tables") {
    val n = base("documents").count()
    assert(t("documents").filter(col("doc_id") < n)
      .join(base("documents"), Seq("doc_id", "text")).count() == n)
    val nc = base("customer").count()
    assert(t("customer").filter(col("c_custkey") < nc)
      .join(base("customer"), Seq("c_custkey", "c_name")).count() == nc)
  }

  test("no cross-copy word-shingle sharing; no cross-copy near-dup pair") {
    // Individual char trigrams CAN coincide across copies (Caesar is an
    // alphabet bijection, so " z " in copy 0 lands on copy 1's " a ";
    // on the tiny sf0.001 fixture's trigram space that's ~20% of
    // distinct trigrams) — what the fix must guarantee is the OPERATOR
    // currency: cross-copy documents are never near-duplicates, and
    // word-level shingles (every word moves under the shift) never
    // match across copies at all. Pre-fix, every doc had k−1 cross-copy
    // near-twins and the n-gram family paid k² candidates.
    val n = base("documents").count()
    val docs = t("documents")
      .withColumn("copy", (col("doc_id") / n).cast("int"))

    val words = docs.select(col("copy"),
        explode(expr("filter(split(lower(text), '\\\\s+'), " +
          "w -> w rlike '[a-z]')")).as("w"))
      .groupBy("w").agg(countDistinct(col("copy")).as("nc"))
    assert(words.filter(col("nc") > 1).count() == 0L,
      "a letter word shared across copies breaks word-shingle dedup")

    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, threshold = 0.5)
    val crossCopy = pairs
      .filter((col("id_a") / n).cast("int") =!=
        (col("id_b") / n).cast("int")).count()
    assert(crossCopy == 0L,
      "a cross-copy near-dup pair means k× data carries artificial twins")
  }

  test("affine cipher family: 312 pairwise-distinct injective maps, " +
      "identity at 0") {
    // Spark-free property over the WHOLE family the generator permits —
    // the k=3 derivation above never reaches the regime where the
    // round-11 Caesar family broke (copies i and i+25 byte-identical at
    // k ≥ 27). Distinct (from → to) translate maps ⇒ distinct ciphertext
    // for every pair of copies.
    val maps = (0 until 312).map(ScaleGen.affineMap)
    assert(maps.distinct.size == 312, "letter maps must be pairwise distinct")
    maps.foreach { case (from, to) =>
      assert(from.length == 52 && to.length == 52)
      assert(to.toSet.size == 52, "cipher must be injective on letters")
      assert(to.forall(c => c.isLetter))
    }
    val (f0, t0) = ScaleGen.affineMap(0)
    assert(f0 == t0, "copy 0 must read through the identity map")
    // family exhaustion is loud, not a silent wrap-around
    assertThrows[IllegalArgumentException](ScaleGen.affineMap(312))
  }

  test("embeddings are decorrelated across copies (direction changes)") {
    val n = base("embeddings").count()
    val pairs = t("embeddings")
      .select(((col("vec_id") / n).cast("int")).as("copy"),
        (col("vec_id") % n).as("bid"), col("embedding"))
    val a = pairs.filter(col("copy") === 0)
      .select(col("bid"), col("embedding").as("ea"))
    val b = pairs.filter(col("copy") === 1)
      .select(col("bid"), col("embedding").as("eb"))
    val identical = a.join(b, "bid")
      .filter(col("ea") === col("eb")).count()
    assert(identical == 0L)
  }
}
