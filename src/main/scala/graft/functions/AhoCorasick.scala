package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern substring matcher, built once and broadcast.
  *
  * One pass over the text finds every occurrence of every pattern in
  * O(|text| + matches) — independent of the number of patterns — where a
  * `LIKE '%p1%' OR LIKE '%p2%' …` chain costs O(|text| · patterns). That
  * difference is what makes large blocklists (thousands of phrases)
  * viable as a map-only scan at 100 TB: the automaton is built on the
  * driver (size ∝ total pattern characters), shipped to executors via a
  * broadcast/closure, and each document is scanned exactly once.
  *
  * Matching is case-sensitive exact-substring (callers lowercase both
  * sides for case-insensitive semantics). The automaton is immutable after
  * construction and safe to share across threads.
  */
final class AhoCorasick private (
    next: Array[mutable.LongMap[Int]], // per-state char → state
    fail: Array[Int],
    outputs: Array[List[Int]], // pattern indices ending at this state
    val patterns: IndexedSeq[String]) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !next(s).contains(c.toLong)) s = fail(s)
    next(s).getOrElse(c.toLong, 0)
  }

  /** Distinct matched patterns, in pattern-list order. */
  def matchedPatterns(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val seen = new Array[Boolean](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      var out = outputs(s)
      while (out.nonEmpty) { seen(out.head) = true; out = out.tail }
      i += 1
    }
    patterns.indices.filter(seen).map(patterns)
  }

  /** Total occurrence count across all patterns (overlaps counted). */
  def countMatches(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    var s = 0
    var i = 0
    var n = 0L
    while (i < text.length) {
      s = step(s, text.charAt(i))
      n += outputs(s).length
      i += 1
    }
    n
  }
}

object AhoCorasick {
  def apply(pats: Seq[String]): AhoCorasick = {
    require(pats.nonEmpty && pats.forall(_.nonEmpty), "non-empty patterns")
    val patterns = pats.toIndexedSeq
    val next = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    // goto trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c.toLong, {
          next += mutable.LongMap.empty[Int]
          ends += Nil
          next.length - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    // fail links + output sets by BFS
    val fail = new Array[Int](next.length)
    val outputs = ends.toArray
    val queue = mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (cL, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(cL)) f = fail(f)
        fail(v) = if (next(f).contains(cL) && next(f)(cL) != v) next(f)(cL) else 0
        outputs(v) = outputs(v) ++ outputs(fail(v))
        queue += v
      }
    }
    new AhoCorasick(next.toArray, fail, outputs, patterns)
  }
}
