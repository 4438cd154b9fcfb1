package graft.vocab

/** Porter stemming algorithm — independent implementation of the published
  * algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
  * 14(3), 1980, including the common `bli`→`ble` / `logi`→`log` revisions).
  *
  * Used by [[Vocab.matchTerm]] the way the reference matcher stems lookups
  * (`vocab/Vocab.scala:50-66` + `util/Stemmer.scala` in
  * /root/reference/src/main/scala/au/org/ala/biocache/). Unlike the
  * reference we also stem the variant table at build time, so plural
  * canonical lookups ("Paratypes" → paratype) actually resolve.
  */
object Stemmer extends Serializable {

  private def isCons(b: CharSequence, i: Int): Boolean = b.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(b, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(b: CharSequence): Int = {
    var i = 0; var m = 0; val n = b.length
    while (i < n && isCons(b, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(b, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(b, i)) i += 1 }
    }
    m
  }

  private def hasVowel(b: CharSequence): Boolean =
    (0 until b.length).exists(i => !isCons(b, i))

  private def endsDoubleCons(b: String): Boolean =
    b.length >= 2 && b(b.length - 1) == b(b.length - 2) && isCons(b, b.length - 1)

  /** *o condition: stem ends consonant-vowel-consonant, last not w/x/y. */
  private def endsCvc(b: String): Boolean = {
    val n = b.length
    n >= 3 && isCons(b, n - 3) && !isCons(b, n - 2) && isCons(b, n - 1) &&
      !"wxy".contains(b(n - 1))
  }

  /** Longest-match rule application: first suffix in `rules` that matches
    * ends the step; the rewrite only fires if cond(stem) holds. */
  private def applyRules(b: String, rules: Seq[(String, String)],
      cond: String => Boolean): String = {
    rules.collectFirst {
      case (suf, rep) if b.endsWith(suf) =>
        val stem = b.substring(0, b.length - suf.length)
        if (cond(stem)) stem + rep else b
    }.getOrElse(b)
  }

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "bli" -> "ble", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
    "logi" -> "log")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    var b = word

    // step 1a: plurals
    b = applyRules(b, Seq("sses" -> "ss", "ies" -> "i", "ss" -> "ss", "s" -> ""),
      _ => true)

    // step 1b: -eed/-ed/-ing
    if (b.endsWith("eed")) {
      val stem = b.dropRight(3)
      if (measure(stem) > 0) b = stem + "ee"
    } else {
      val afterEd =
        if (b.endsWith("ed") && hasVowel(b.dropRight(2))) Some(b.dropRight(2))
        else if (b.endsWith("ing") && hasVowel(b.dropRight(3))) Some(b.dropRight(3))
        else None
      afterEd.foreach { s =>
        b = if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (endsDoubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
        else if (measure(s) == 1 && endsCvc(s)) s + "e"
        else s
      }
    }

    // step 1c: y → i after a vowel
    if (b.endsWith("y") && hasVowel(b.dropRight(1)))
      b = b.dropRight(1) + "i"

    // steps 2 and 3: double → single suffixes (m > 0)
    b = applyRules(b, step2Rules, measure(_) > 0)
    b = applyRules(b, step3Rules, measure(_) > 0)

    // step 4: drop residual suffixes (m > 1; -ion needs stem ending s/t)
    b = step4Suffixes.collectFirst {
      case suf if b.endsWith(suf) =>
        val stem = b.substring(0, b.length - suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || stem.endsWith("s") || stem.endsWith("t"))
        if (ok) stem else b
    }.getOrElse(b)

    // step 5a: drop trailing e
    if (b.endsWith("e")) {
      val stem = b.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) b = stem
    }
    // step 5b: -ll → -l when m > 1
    if (measure(b) > 1 && endsDoubleCons(b) && b.endsWith("l"))
      b = b.dropRight(1)

    b
  }
}
