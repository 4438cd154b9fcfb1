package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Custom typed aggregate (the UDAF tier of SURVEY §2.9): elementwise MIN
  * over per-row MinHash signatures.
  *
  * MinHash is union-homomorphic — the elementwise min of the signatures of
  * two sets IS the signature of their union — so aggregating per-document
  * signatures yields the exact signature the GROUP's pooled shingle set
  * would have produced. That gives group-vs-group resemblance (source vs
  * source, shard vs shard, day vs day) from one aggregate over
  * signature-sized rows: the raw shingle sets never shuffle, only k longs
  * per row.
  *
  * Implemented as a Dataset `Aggregator` (merge-combinable: Spark runs it
  * with partial aggregation, so the shuffle carries one signature per
  * group per partition). An empty group yields an empty signature.
  */
object MinHashUnionAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  private def mergeArrays(b: Array[Long], a: Array[Long]): Array[Long] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else {
      require(a.length == b.length,
        s"signature length mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Long](b.length)
      var i = 0
      while (i < b.length) {
        out(i) = math.min(b(i), a(i)); i += 1
      }
      out
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    mergeArrays(b, if (a == null) Array.empty else a.toArray)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    mergeArrays(b1, b2)

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
