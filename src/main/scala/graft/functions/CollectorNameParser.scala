package graft.functions

/** Collector-name canonicalisation: free-text collector strings →
  * "Surname, Initials FirstName" canonical form (+ list splitting).
  *
  * Behavioural parity target: the reference parser
  * (`parser/CollectorNameParser.scala:41-162` in
  * /root/reference/src/main/scala/au/org/ala/biocache/), covering
  * surname-first and firstname-first orders, initials in either position,
  * surname prefixes (van/von/der/...), titles, bracketed nicknames/numbers,
  * "et al." suppression, hyphenated names, emails passed through, and
  * quoted multi-collector strings.
  */
object CollectorNameParser {

  private val titles = Set("mr", "mrs", "ms", "dr", "prof", "lieutenant",
    "captain", "sir", "lady", "jr", "snr", "sr", "na", "n/a")
  private val surnamePrefixes = Set("van", "von", "der", "de", "den", "du",
    "la", "le", "mac", "mc")
  private val etAlPattern = """(?i)\bet\.?\s*al\.?""".r
  private val bracketPattern = """\([^)]*\)|\[[^\]]*\]""".r
  private val emailPattern = """^[\w.+-]+@[\w.-]+\.\w+$""".r

  private def isInitials(s: String): Boolean = {
    val letters = s.replaceAll("[^A-Za-z]", "").length
    s.matches("""(?:[A-Za-z]\.?[-]?)+""") && letters > 0 &&
      (if (s.contains(".")) letters <= 6
       else letters <= 3 &&
         s.replaceAll("[^A-Z]", "").length == letters)
  }

  private def canonInitials(s: String): String = {
    // "NL" / "N.L" / "A.C" → "N.L." with hyphens preserved ("R.J-P.")
    val sb = new StringBuilder
    s.foreach {
      case c if c.isLetter => sb.append(c.toUpper).append('.')
      case '-' =>
        if (sb.nonEmpty && sb.last == '.') sb.setLength(sb.length - 1)
        sb.append('-')
      case _ => // drop existing dots; rebuilt above
    }
    sb.toString
  }

  private def titleCase(s: String): String =
    s.split("-").map { part =>
      if (part.isEmpty) part
      else if (surnamePrefixes.contains(part.toLowerCase)) part.toLowerCase
      else part.substring(0, 1).toUpperCase + part.substring(1).toLowerCase
    }.mkString("-")

  private def initialOf(firstName: String): String =
    firstName.substring(0, 1).toUpperCase + "."

  /** Parse one collector string → canonical form; None when empty/unknown. */
  def parse(raw: String): Option[String] = {
    if (raw == null) return None
    var s = raw.trim.stripPrefix("\"").stripSuffix("\"").trim
    if (s.isEmpty) return None
    // a name needs at least one letter; pure symbols/digits are unparsable
    // (reference MiscellaneousProcessor → RECORDED_BY_UNPARSABLE)
    if (!s.exists(_.isLetter)) return None
    if (emailPattern.findFirstIn(s).isDefined) return Some(s)
    s = bracketPattern.replaceAllIn(s, " ")
    s = etAlPattern.replaceAllIn(s, " ")
    s = s.replaceAll("\\s+", " ").trim
    if (s.isEmpty) return None

    // "A.G.Gunness" → initials glued to surname
    val glued = """^((?:[A-Za-z]\.){1,3})([A-Za-z][A-Za-z-]+)$""".r
    s match {
      case glued(ini, surname) =>
        return Some(s"${titleCase(surname)}, ${ini.toUpperCase}")
      case _ =>
    }

    if (s.contains(",")) {
      // "Surname, rest" order
      val Array(surPart, rest0) = s.split(",", 2).map(_.trim)
      var rest = rest0.split("\\s+").filter(_.nonEmpty)
        .filterNot(t => titles.contains(t.toLowerCase.replaceAll("[^a-z/]", "")))
      // trailing surname prefix: "Blandowski, J.W.T.L. von"
      var surname = surPart
      if (rest.nonEmpty && surnamePrefixes.contains(rest.last.toLowerCase)) {
        surname = rest.last.toLowerCase + " " + surname
        rest = rest.dropRight(1)
      }
      if (rest.isEmpty) return Some(titleCaseSurname(surname))
      val (inis, firsts) = rest.partition(isInitials)
      val iniStr = inis.map(canonInitials).mkString("")
      val firstName = firsts.headOption.map(titleCase)
      (iniStr.nonEmpty, firstName) match {
        case (true, Some(f)) =>
          Some(s"${titleCaseSurname(surname)}, $iniStr $f")
        case (true, None) => Some(s"${titleCaseSurname(surname)}, $iniStr")
        case (false, Some(f)) =>
          Some(s"${titleCaseSurname(surname)}, ${initialOf(f)} $f")
        case _ => Some(titleCaseSurname(surname))
      }
    } else {
      val toks0 = s.split("\\s+").filter(_.nonEmpty)
        .filterNot(t => titles.contains(t.toLowerCase.replaceAll("[^a-z/]", "")))
      if (toks0.isEmpty) return None
      if (toks0.length == 1) {
        val t = toks0.head
        return Some(titleCaseSurname(t))
      }
      // leading initials: "NL Kirby", "WILSON P.J. N/A" handled via comma-less
      val (inis, words) = toks0.partition(isInitials)
      if (words.isEmpty) return Some(s.trim)
      val iniStr = inis.map(canonInitials).mkString("")
      // ALL-CAPS first word = surname-first form ("DAVIES R.J-P. Richard",
      // "KENNY S.D. Sue"); otherwise surname-last ("Simon Starr")
      val headAllCaps = words.head.length >= 2 &&
        words.head == words.head.toUpperCase && words.head.exists(_.isLetter)
      if (headAllCaps) {
        val surname = titleCase(words.head)
        val firstName = words.tail.headOption.map(titleCase)
        (iniStr.nonEmpty, firstName) match {
          case (true, Some(f)) => Some(s"$surname, $iniStr $f")
          case (true, None) => Some(s"$surname, $iniStr")
          case (false, Some(f)) => Some(s"$surname, ${initialOf(f)} $f")
          case _ => Some(surname)
        }
      } else {
        // surname = last word (with any prefixes attached); first = remaining
        val surnameIdx = words.length - 1
        val surnameParts = scala.collection.mutable.ArrayBuffer(words(surnameIdx))
        var j = surnameIdx - 1
        while (j >= 0 && surnamePrefixes.contains(words(j).toLowerCase)) {
          surnameParts.prepend(words(j).toLowerCase); j -= 1
        }
        val firsts = words.slice(0, j + 1)
        val surname = (surnameParts.init.map(_.toLowerCase) :+
          titleCase(surnameParts.last)).mkString(" ")
        (iniStr.nonEmpty, firsts.headOption) match {
          case (true, Some(f)) =>
            Some(s"$surname, $iniStr ${titleCase(f)}")
          case (true, None) => Some(s"$surname, $iniStr")
          case (false, Some(f)) =>
            Some(s"$surname, ${initialOf(f)} ${titleCase(f)}")
          case _ => Some(surname)
        }
      }
    }
  }

  private def titleCaseSurname(s: String): String =
    s.split("\\s+").map(w =>
      if (surnamePrefixes.contains(w.toLowerCase)) w.toLowerCase
      else titleCase(w)).mkString(" ")

  /** Parse possibly-multiple collectors: quoted segments ("A""B"),
    * semicolon/pipe separated, or a single name. */
  def parseForList(raw: String): Option[List[String]] = {
    if (raw == null || raw.trim.isEmpty) return None
    val quoted = """"([^"]+)"""".r.findAllMatchIn(raw).map(_.group(1)).toList
    val segments =
      if (quoted.nonEmpty) quoted
      else raw.split("[;|]").toList
    val parsed = segments.flatMap(seg => parse(seg))
    if (parsed.isEmpty) None else Some(parsed)
  }
}
