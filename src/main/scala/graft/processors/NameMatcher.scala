package graft.processors

import org.apache.spark.sql.DataFrame

/** UDF return shape for a name-match. PUBLIC top-level with boxed nullable
  * fields — Janino codegen requirement (see ParsedDate note). */
case class NameHit(
    taxonConceptID: String, acceptedName: String, taxonRank: String,
    kingdom: String, phylum: String, classs: String, family: String,
    genus: String, lft: java.lang.Long, rgt: java.lang.Long,
    homonym: Boolean, fuzzy: Boolean)

/** Broadcast taxon-name matcher: exact → kingdom-resolved homonym →
  * blocked fuzzy (Levenshtein ≤ 2 within a genus-prefix block).
  *
  * Re-expresses the reference's name-matching path
  * (`caches/ClassificationDAO.scala:42-206` in
  * /root/reference/src/main/scala/au/org/ala/biocache/): exact match
  * first; homonyms resolved with the supplied kingdom hint (unresolved →
  * HOMONYM_ISSUE, no match); a fuzzy fallback catches single-edit
  * misspellings the way the ALA taxamatch layer does. The whole names
  * dimension is held in one broadcast structure — the same shape as the
  * reference shipping its Lucene name index to every processing node;
  * names dims are dimension-scale (millions of rows at most), never
  * fact-scale.
  */
final class NameMatcher private (entries: Array[NameMatcher.Entry])
    extends Serializable {
  import NameMatcher._

  private val byName: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, List[Int]]()
    entries.indices.foreach { i =>
      m.merge(entries(i).nameLower, List(i), (a, b) => b ++ a)
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  private val byBlock: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, List[Int]]()
    entries.indices.foreach { i =>
      m.merge(blockKey(entries(i).nameLower), List(i), (a, b) => b ++ a)
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  private def hit(i: Int, homonym: Boolean, fuzzy: Boolean): NameHit = {
    val e = entries(i)
    NameHit(e.taxonConceptID, e.acceptedName, e.taxonRank, e.kingdom,
      e.phylum, e.classs, e.family, e.genus, e.lft, e.rgt, homonym, fuzzy)
  }

  private val homonymHit =
    NameHit(null, null, null, null, null, null, null, null, null, null,
      homonym = true, fuzzy = false)

  /** Resolve a raw scientific name (with optional kingdom hint). None when
    * nothing matches; a hit with homonym=true and null ids when an
    * unresolvable homonym was found. */
  def lookup(rawName: String, kingdomHint: String): Option[NameHit] = {
    if (rawName == null) return None
    val n = rawName.trim.toLowerCase
    if (n.isEmpty) return None
    val exact = byName.get(n)
    if (exact != null) {
      if (exact.length == 1) return Some(hit(exact(0), homonym = false, fuzzy = false))
      // homonym: resolve by kingdom hint; ambiguous or missing hint → flag
      val kh = if (kingdomHint == null) "" else kingdomHint.trim.toLowerCase
      val byKingdom = exact.filter(i => entries(i).kingdom != null &&
        entries(i).kingdom.toLowerCase == kh)
      if (byKingdom.length == 1)
        return Some(hit(byKingdom(0), homonym = false, fuzzy = false))
      return Some(homonymHit)
    }
    // fuzzy: single/double-edit candidates within the genus-prefix block
    val candidates = byBlock.get(blockKey(n))
    if (candidates == null) return None
    var bestIdx = -1
    var bestName: String = null
    var c = 0
    while (c < candidates.length) {
      val i = candidates(c)
      val cand = entries(i).nameLower
      if (graft.functions.HashKernels.levenshteinWithin(n, cand, 2) &&
        (bestName == null || cand < bestName)) {
        bestIdx = i; bestName = cand
      }
      c += 1
    }
    if (bestIdx >= 0) Some(hit(bestIdx, homonym = false, fuzzy = true))
    else None
  }
}

object NameMatcher {
  case class Entry(nameLower: String, taxonConceptID: String,
      acceptedName: String, taxonRank: String, kingdom: String,
      phylum: String, classs: String, family: String, genus: String,
      lft: java.lang.Long, rgt: java.lang.Long)

  /** Blocking key: first 4 chars of the genus word + initial of the
    * epithet — a single edit rarely crosses it, keeping candidate lists
    * tiny while catching the misspellings the reference's fuzzy layer
    * targets. */
  def blockKey(nameLower: String): String = {
    val sp = nameLower.indexOf(' ')
    if (sp < 0) nameLower.take(4)
    else nameLower.take(math.min(4, sp)) + " " +
      (if (sp + 1 < nameLower.length) nameLower.charAt(sp + 1) else ' ')
  }

  def fromDataFrame(dim: DataFrame): NameMatcher = {
    import org.apache.spark.sql.functions.{col, lit}
    // phylum/classs are optional dim columns (used by the taxonomic-hints
    // scope check); absent columns read as null
    def optCol(name: String) =
      if (dim.columns.contains(name)) col(name).cast("string")
      else lit(null).cast("string")
    val rows = dim.select(
      col("nameLower").cast("string"), col("taxonConceptID").cast("string"),
      col("acceptedName").cast("string"), col("taxonRank").cast("string"),
      col("kingdom").cast("string"), optCol("phylum"), optCol("classs"),
      col("family").cast("string"), col("genus").cast("string"),
      col("lft").cast("long"), col("rgt").cast("long"))
      .collect()
    new NameMatcher(rows.map { r =>
      Entry(
        Option(r.getString(0)).map(_.trim.toLowerCase).orNull,
        r.getString(1), r.getString(2), r.getString(3), r.getString(4),
        r.getString(5), r.getString(6), r.getString(7), r.getString(8),
        if (r.isNullAt(9)) null else Long.box(r.getLong(9)),
        if (r.isNullAt(10)) null else Long.box(r.getLong(10)))
    })
  }
}
