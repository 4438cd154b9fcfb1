package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Exact bottom-k DISTINCT values as a mergeable typed `Aggregator` — the
  * KMV (k minimum values) sketch. Over uniformly-hashed elements the k
  * smallest distinct hashes are a fixed-size summary of the whole set:
  *  - distinct-count estimate: (k−1) / max(sketch) (normalized);
  *  - resemblance: bottom-k of A ∪ B is computable from the two sketches
  *    alone (merge = bottom-k of the concatenation), and the fraction of
  *    the union sketch present in both input sketches estimates Jaccard.
  *
  * The buffer is a sorted ascending array of ≤ k distinct values, so the
  * shuffle carries at most k values per group per partition — the full
  * distinct set never materialises (contrast `collect_set`, which is
  * unbounded). Values are compared as plain strings; callers feed
  * fixed-width hex hashes (md5), where lexicographic order IS uniform
  * numeric order — and any engine with md5 reproduces the exact same
  * sketch, which is what makes the q114 oracle hash-checkable.
  */
class BottomKAgg(val k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0)

  override def zero: Seq[String] = Vector.empty

  override def reduce(buf: Seq[String], v: String): Seq[String] = {
    if (v == null) return buf
    // reject fast when the buffer is full and v can't displace anything
    if (buf.length >= k && buf.last <= v) return buf
    val idx = buf.search(v)(Ordering.String) match {
      case scala.collection.Searching.Found(_) => return buf // already present
      case scala.collection.Searching.InsertionPoint(i) => i
    }
    val inserted = (buf.take(idx) :+ v) ++ buf.drop(idx)
    if (inserted.length > k) inserted.take(k) else inserted
  }

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] = {
    // merge two sorted distinct runs, keeping the k smallest distinct
    val out = Vector.newBuilder[String]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); i += 1
          if (j < b.length && b(j) == v) j += 1
          v
        } else { val v = b(j); j += 1; v }
      out += take; n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
