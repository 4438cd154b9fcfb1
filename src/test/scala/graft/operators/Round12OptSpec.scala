package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-12 optimization pins: every rewrite that changed an operator's
  * INTERNALS must stay row-identical to the relational form it replaced.
  *
  *   - winnowing: map-only kernel ≡ the explode + per-doc-window-minima
  *     restatement (bit-identical md5-derived hashes included)
  *   - portable MinHash: array-form banding ≡ the exploded
  *     signaturesPortable → groupBy(id, band) form, per rows-per-band
  *   - nonPushableGate: identity on the filter semantics (incl. null)
  */
class Round12OptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
    (3L, "completely different words live in this one document here"),
    (4L, "short text"),
    (5L, "  Mixed   CASE   and    extra   whitespace   collapses   here  "),
    (6L, "the quick brown fox jumps over the lazy dog again and again"),
    (7L, "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa")
  ).toDF("doc_id", "text")

  test("winnow kernel ≡ relational explode+window restatement, bit-exact") {
    import org.apache.spark.sql.expressions.Window
    val k = 8; val w = 4
    val kernel = TextSearch.winnowFingerprints(fixtureDocs, "doc_id", "text",
      k, w).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the pre-round-12 relational form, inline
    val grams = fixtureDocs
      .select(col("doc_id").as("doc"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
      .select(col("doc"), col("t"), (length(col("t")) - (k - 1)).as("np"))
      .filter(col("np") >= w)
      .select(col("doc"), col("np"),
        explode(sequence(lit(1), col("np"))).as("pos"), col("t"))
      .select(col("doc"), col("np"), col("pos"),
        conv(substring(md5(substring(col("t"), col("pos"), lit(k))), 1, 8),
          16, 10).cast("long").as("h"))
    val byPos = Window.partitionBy("doc").orderBy("pos")
    val withMins = grams.select(col("doc") +: col("np") +: col("pos") +:
      col("h") +: (0 until w).map { a =>
        min("h").over(byPos.rowsBetween(-a, w - 1 - a)).as(s"m$a")
      }: _*)
    val selected = (0 until w).map { a =>
      (col("pos") - a >= 1) && (col("pos") - a <= col("np") - (w - 1)) &&
        col(s"m$a") === col("h")
    }.reduce(_ || _)
    val relational = withMins.filter(selected).select("doc", "h").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(kernel == relational)
    assert(kernel.nonEmpty)
    // identical docs 1 and 6 share their whole fingerprint set
    assert(kernel.filter(_._1 == 1L).map(_._2) ==
      kernel.filter(_._1 == 6L).map(_._2))
  }

  test("array-form band candidates ≡ exploded signaturesPortable banding") {
    val numHashes = 12
    val sh = Dedup.wordShingleSet(fixtureDocs, "doc_id", "text", 3)
    val shArr = Dedup.wordShingleArrays(fixtureDocs, "doc_id", "text", 3)
    val sigArr = Dedup.signatureArrays(shArr, numHashes)
    for (r <- Seq(2, 3, 4, 6)) {
      val viaArrays = Dedup.candidatesFromArrays(sigArr, r, numHashes)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val viaExploded = Dedup.candidatesFromSignatures(
          Dedup.signaturesPortable(sh, numHashes), r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(viaArrays == viaExploded, s"rowsPerBand=$r")
    }
  }

  test("wordShingleArrays ≡ distinct exploded shingle set, short docs gated") {
    val viaArr = Dedup.wordShingleArrays(fixtureDocs, "doc_id", "text", 3)
      .select(col("id"), explode(col("shs")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaSet = Dedup.wordShingleSet(fixtureDocs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaArr == viaSet)
    assert(!viaArr.exists(_._1 == 4L)) // 2 tokens < n=3 → no rows
    // repeated-token doc collapses to ONE distinct shingle
    assert(viaArr.count(_._1 == 7L) == 1)
  }

  test("nonPushableGate is filter-identity, including null conditions") {
    val df = Seq((1, "a"), (2, null.asInstanceOf[String]), (3, "c"))
      .toDF("k", "v")
    val plain = df.filter(length(col("v")) > 0)
      .collect().map(_.getInt(0)).toSet
    val gated = df.filter(graft.Tuning.nonPushableGate(length(col("v")) > 0))
      .collect().map(_.getInt(0)).toSet
    assert(gated == plain) // null condition drops the row in both forms
  }
}
