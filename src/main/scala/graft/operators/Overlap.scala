package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Audience / segment overlap: for every pair of segments, how many
  * distinct members they share (|A∩B|, |A∪B|, Jaccard) — the OLAP query
  * behind audience planning, cohort comparison, and dedup-across-sources
  * reporting.
  *
  * Scale shape: the naive form is a distinct-(member, segment) self-join
  * on member — one shuffle of the FULL membership per segment pair. Here
  * each segment is collapsed to a dense bitset by a mergeable typed
  * `Aggregator` (elementwise-OR merge ⇒ map-side partials, one bitset per
  * partition per segment on the wire), and the pairwise popcount algebra
  * runs over the segments-×-segments table — rows = segment count, not
  * member count. With a 1e9-wide id space a dense bitset is 125 MB per
  * segment, so past [[Overlap.DenseBitsetMaxBits]] the auto overload
  * switches to the chunked roaring-style representation
  * ([[Overlap.segmentOverlapSparse]]) — memory tracks MEMBERS, not id
  * range, same algebra, still exact. KMV sketches
  * ([[graft.functions.BottomKAgg]]) remain the estimate-only fallback
  * when even the member sets outgrow a row.
  */
object Overlap {

  /** Mergeable dense bitset over member ids in [0, numBits). Out-of-range
    * ids fail loudly — silent truncation would corrupt the counts. */
  class BitsetAgg(val numBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0, "numBits must be positive")
    private val words = (numBits + 63) >>> 6

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(bits: Array[Long], x: Long): Array[Long] = {
      require(x >= 0 && x < numBits, s"member id $x outside [0, $numBits)")
      bits((x >>> 6).toInt) |= 1L << (x & 63)
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Array[Long] = bits

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Dense-bitset width past which the cost-chooser switches to the
    * compressed (roaring-style) representation: 2^27 bits = 16 MB of
    * buffer per segment on the shuffle wire. */
  val DenseBitsetMaxBits: Long = 1L << 27

  /** Pairwise segment overlap matrix (upper triangle, seg_a < seg_b):
    * (seg_a, seg_b, n_a, n_b, n_common, n_union, jaccard). Exact —
    * the member sets are exact, every output number integer set algebra
    * (jaccard an exact rational, rounded 6dp).
    *
    * The representation is cost-chosen from one scalar `max(memberCol)`
    * pre-pass (a single-row driver action, not a collect): dense
    * popcount bitsets while the id range fits [[DenseBitsetMaxBits]],
    * the chunked roaring containers of [[segmentOverlapSparse]] beyond —
    * so the operator neither fails on a larger scale factor because a
    * ceiling was tuned for a smaller one, nor ships 125 MB bitsets for a
    * 1e9-wide sparse id space. */

  def segmentOverlap(events: DataFrame, segCol: String,
      memberCol: String): DataFrame = {
    val mxRow = events.agg(max(col(memberCol).cast("long"))).head()
    require(!mxRow.isNullAt(0),
      s"cannot derive a bitset width: max($memberCol) is null — empty " +
        "input, or a member column that casts to all-null longs")
    val mx = mxRow.getLong(0)
    require(mx >= 0, s"max($memberCol) is negative: $mx")
    // cost-chooser (round-11): dense popcount words up to 16 MB/segment,
    // chunked roaring containers beyond — same pairwise algebra, exact
    // either way, spec-pinned equal on the shared range
    if (mx + 1 <= DenseBitsetMaxBits)
      segmentOverlap(events, segCol, memberCol, (mx + 1).toInt)
    else segmentOverlapSparse(events, segCol, memberCol)
  }

  def segmentOverlap(events: DataFrame, segCol: String, memberCol: String,
      maxMembers: Int): DataFrame = {
    val bm = udaf(new BitsetAgg(maxMembers))
    val segs = events
      .groupBy(col(segCol).as("seg"))
      .agg(bm(col(memberCol).cast("long")).as("bits"))
    val pop = udf { (a: Array[Long]) =>
      var s = 0L; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i)); i += 1 }
      s
    }
    val popAnd = udf { (a: Array[Long], b: Array[Long]) =>
      var s = 0L; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
      s
    }
    segs.select(col("seg").as("seg_a"), col("bits").as("_ba"))
      .join(segs.select(col("seg").as("seg_b"), col("bits").as("_bb")),
        col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        pop(col("_ba")).as("n_a"), pop(col("_bb")).as("n_b"),
        popAnd(col("_ba"), col("_bb")).as("n_common"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
  }

  // ── compressed (roaring-style) path ──────────────────────────────────
  //
  // Chunked containers, the classic roaring layout (Chambi, Lemire et al.
  // 2016, "Better bitmap performance with Roaring bitmaps"): the id space
  // splits into 2^16-value chunks keyed by (id >>> 16); a chunk holds
  // either a sorted value array (cardinality < 1024 — 8 B per member) or
  // a 1024-word bitmap (8 KB flat). Memory tracks the MEMBER COUNT, not
  // the id range, so 1e9-wide sparse id spaces cost what their members
  // cost — the wall the dense path's 2^27 require documents. Containers
  // of exactly 1024 longs are bitmaps by construction (array containers
  // convert at cardinality 1024, before the ambiguity can arise).

  /** One segment's compressed membership: sorted chunk keys + one
    * container per key. */
  private[operators] type Chunks = (Array[Int], Array[Array[Long]])

  private val BitmapWords = 1024 // 2^16 bits

  private[operators] def isBitmap(c: Array[Long]): Boolean = c.length == BitmapWords

  private[operators] def toBitmap(values: Array[Long]): Array[Long] = {
    val w = new Array[Long](BitmapWords)
    var i = 0
    while (i < values.length) {
      val v = values(i).toInt
      w(v >>> 6) |= 1L << (v & 63)
      i += 1
    }
    w
  }

  private[operators] def containerCard(c: Array[Long]): Long =
    if (isBitmap(c)) {
      var s = 0L; var i = 0
      while (i < c.length) { s += java.lang.Long.bitCount(c(i)); i += 1 }
      s
    } else c.length.toLong

  /** Union of two containers (either kind). */
  private[operators] def containerOr(a: Array[Long], b: Array[Long]): Array[Long] =
    (isBitmap(a), isBitmap(b)) match {
      case (true, true) =>
        val w = new Array[Long](BitmapWords)
        var i = 0
        while (i < w.length) { w(i) = a(i) | b(i); i += 1 }
        w
      case (true, false) =>
        val w = a.clone()
        var i = 0
        while (i < b.length) {
          val v = b(i).toInt; w(v >>> 6) |= 1L << (v & 63); i += 1
        }
        w
      case (false, true) => containerOr(b, a)
      case (false, false) =>
        // sorted-merge union of two value arrays
        val out = new Array[Long](a.length + b.length)
        var i = 0; var j = 0; var k = 0
        while (i < a.length && j < b.length) {
          if (a(i) < b(j)) { out(k) = a(i); i += 1 }
          else if (a(i) > b(j)) { out(k) = b(j); j += 1 }
          else { out(k) = a(i); i += 1; j += 1 }
          k += 1
        }
        while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
        while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
        val trimmed = java.util.Arrays.copyOf(out, k)
        if (k >= BitmapWords) toBitmap(trimmed) else trimmed
    }

  /** |a ∩ b| of two containers (either kind). */
  private[operators] def containerAndCard(a: Array[Long], b: Array[Long]): Long =
    (isBitmap(a), isBitmap(b)) match {
      case (true, true) =>
        var s = 0L; var i = 0
        while (i < a.length) {
          s += java.lang.Long.bitCount(a(i) & b(i)); i += 1
        }
        s
      case (true, false) =>
        var s = 0L; var i = 0
        while (i < b.length) {
          val v = b(i).toInt
          if ((a(v >>> 6) & (1L << (v & 63))) != 0L) s += 1
          i += 1
        }
        s
      case (false, true) => containerAndCard(b, a)
      case (false, false) =>
        var s = 0L; var i = 0; var j = 0
        while (i < a.length && j < b.length) {
          if (a(i) < b(j)) i += 1
          else if (a(i) > b(j)) j += 1
          else { s += 1; i += 1; j += 1 }
        }
        s
    }

  private[operators] def chunksCard(keys: Array[Int], conts: Array[Array[Long]]): Long = {
    var s = 0L; var i = 0
    while (i < keys.length) { s += containerCard(conts(i)); i += 1 }
    s
  }

  private[operators] def chunksAndCard(ka: Array[Int], ca: Array[Array[Long]],
      kb: Array[Int], cb: Array[Array[Long]]): Long = {
    var s = 0L; var i = 0; var j = 0
    while (i < ka.length && j < kb.length) {
      if (ka(i) < kb(j)) i += 1
      else if (ka(i) > kb(j)) j += 1
      else { s += containerAndCard(ca(i), cb(j)); i += 1; j += 1 }
    }
    s
  }

  /** Mergeable roaring-style membership aggregator over member ids in
    * [0, 2^47) — Int chunk keys cover id >>> 16. Memory per segment is
    * O(members), never O(id range). */
  class RoaringAgg extends Aggregator[Long, Chunks, Chunks] {

    override def zero: Chunks = (Array.empty[Int], Array.empty[Array[Long]])

    override def reduce(buf: Chunks, x: Long): Chunks = {
      require(x >= 0 && x < (1L << 47),
        s"member id $x outside [0, 2^47) — roaring chunk keys are Int")
      val (keys, conts) = buf
      val key = (x >>> 16).toInt
      val low = x & 0xFFFFL
      val idx = java.util.Arrays.binarySearch(keys, key)
      if (idx >= 0) {
        val c = conts(idx)
        if (isBitmap(c)) {
          c((low >>> 6).toInt) |= 1L << (low & 63)
          buf
        } else {
          val p = java.util.Arrays.binarySearch(c, low)
          if (p >= 0) buf
          else {
            val at = -p - 1
            val n = new Array[Long](c.length + 1)
            System.arraycopy(c, 0, n, 0, at)
            n(at) = low
            System.arraycopy(c, at, n, at + 1, c.length - at)
            conts(idx) = if (n.length >= BitmapWords) toBitmap(n) else n
            buf
          }
        }
      } else {
        val at = -idx - 1
        val nk = new Array[Int](keys.length + 1)
        System.arraycopy(keys, 0, nk, 0, at)
        nk(at) = key
        System.arraycopy(keys, at, nk, at + 1, keys.length - at)
        val nc = new Array[Array[Long]](conts.length + 1)
        System.arraycopy(conts, 0, nc, 0, at)
        nc(at) = Array(low)
        System.arraycopy(conts, at, nc, at + 1, conts.length - at)
        (nk, nc)
      }
    }

    override def merge(a: Chunks, b: Chunks): Chunks = {
      val (ka, ca) = a; val (kb, cb) = b
      val nk = new Array[Int](ka.length + kb.length)
      val nc = new Array[Array[Long]](ka.length + kb.length)
      var i = 0; var j = 0; var k = 0
      while (i < ka.length && j < kb.length) {
        if (ka(i) < kb(j)) { nk(k) = ka(i); nc(k) = ca(i); i += 1 }
        else if (ka(i) > kb(j)) { nk(k) = kb(j); nc(k) = cb(j); j += 1 }
        else {
          nk(k) = ka(i); nc(k) = containerOr(ca(i), cb(j)); i += 1; j += 1
        }
        k += 1
      }
      while (i < ka.length) { nk(k) = ka(i); nc(k) = ca(i); i += 1; k += 1 }
      while (j < kb.length) { nk(k) = kb(j); nc(k) = cb(j); j += 1; k += 1 }
      (java.util.Arrays.copyOf(nk, k), java.util.Arrays.copyOf(nc, k))
    }

    override def finish(buf: Chunks): Chunks = buf

    override def bufferEncoder: Encoder[Chunks] = ExpressionEncoder[Chunks]()
    override def outputEncoder: Encoder[Chunks] = ExpressionEncoder[Chunks]()
  }

  /** [[segmentOverlap]] over the compressed representation — identical
    * output contract and pairwise algebra, id range [0, 2^47) instead of
    * the dense path's [0, 2^27). The automatic overload dispatches here
    * past [[DenseBitsetMaxBits]]; spec-pinned row-identical to the dense
    * path on the shared range.
    *
    * **Output-sensitive pairing (round 12).** The compressed
    * representation already says which 2^16-id chunks a segment touches,
    * so instead of the seg×seg theta join shipping every bitmap to every
    * pair, candidate pairs come from a shared-container-key equi-join
    * (explode chunk keys → join on key → distinct pairs): only pairs
    * that CAN intersect carry bitmaps through a join. The zero-overlap
    * rows the contract includes are reconstructed from the sizes table
    * alone — segment-count-sized rows with no bitmap payload — so in
    * the many-segment disjoint-id regime (per-tenant id spaces, the
    * sparse path's natural habitat) the heavy work scales with the
    * number of OVERLAPPING pairs, not all C(n,2). A chunk key touches
    * ≤ members/2^16 + 1 chunks per segment, so the exploded key table
    * stays a small fraction of the input. */
  def segmentOverlapSparse(events: DataFrame, segCol: String,
      memberCol: String): DataFrame = {
    val rm = udaf(new RoaringAgg)
    val segs = events
      .groupBy(col(segCol).as("seg"))
      .agg(rm(col(memberCol).cast("long")).as("bits"))
      .select(col("seg"), col("bits._1").as("keys"),
        col("bits._2").as("conts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pop = udf { (keys: Seq[Int], conts: Seq[Seq[Long]]) =>
      chunksCard(keys.toArray, conts.map(_.toArray).toArray)
    }
    val popAnd = udf {
      (ka: Seq[Int], ca: Seq[Seq[Long]], kb: Seq[Int], cb: Seq[Seq[Long]]) =>
        chunksAndCard(ka.toArray, ca.map(_.toArray).toArray,
          kb.toArray, cb.map(_.toArray).toArray)
    }
    // (seg, popcount) — the only per-segment state the full upper
    // triangle needs; bitmap-free, so the all-pairs frame is cheap
    val sizes = segs.select(col("seg"),
      pop(col("keys"), col("conts")).as("n"))
    // candidate pairs: share ≥1 container key ⇒ CAN have n_common > 0
    val segKeys = segs.select(col("seg"), explode(col("keys")).as("ck"))
    val candPairs = segKeys.select(col("ck"), col("seg").as("seg_a"))
      .join(segKeys.select(col("ck"), col("seg").as("seg_b")), Seq("ck"))
      .filter(col("seg_a") < col("seg_b"))
      .select("seg_a", "seg_b").distinct()
    val common = candPairs
      .join(segs.select(col("seg").as("seg_a"), col("keys").as("_ka"),
        col("conts").as("_ca")), Seq("seg_a"))
      .join(segs.select(col("seg").as("seg_b"), col("keys").as("_kb"),
        col("conts").as("_cb")), Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        popAnd(col("_ka"), col("_ca"), col("_kb"), col("_cb"))
          .as("_nc"))
    val result = sizes
      .select(col("seg").as("seg_a"), col("n").as("n_a"))
      .join(sizes.select(col("seg").as("seg_b"), col("n").as("n_b")),
        col("seg_a") < col("seg_b"))
      .join(common, Seq("seg_a", "seg_b"), "left")
      .withColumn("n_common", coalesce(col("_nc"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
      .select("seg_a", "seg_b", "n_a", "n_b", "n_common", "n_union",
        "jaccard")
    // long-lived-JVM storage discipline: the internal bitmap table
    // releases itself once the caller's first action has consumed it
    CacheScope.releaseOnFirstMaterialization(result, Seq(segs))
  }
}
