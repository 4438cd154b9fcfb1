package graft.sources

import scala.util.Try

/** Ad-hoc upload support: guess Darwin Core column headers from a row of
  * sample values (reference `parser/AdHocParser.scala:123-282` in
  * /root/reference/src/main/scala/au/org/ala/biocache/ — the backing of the
  * reference's "upload a headerless CSV" flow). Each value runs through the
  * extractor chain in the reference's priority order; the first-two-column
  * heuristics and the duplicate-latitude repair are carried over. */
object AdHocParser {
  import graft.vocab._

  private val imageUrl =
    """^(https?://(?:[a-zA-Z0-9\-]+\.)+[a-zA-Z]{2,6}(?:/[^/#]+)+\.(?:jpg|gif|png|jpeg))$""".r
  private val catalog = """[A-Za-z]+-?[0-9]+""".r

  private def isDouble(s: String): Boolean = Try(s.trim.toDouble).isSuccess
  private def asDouble(s: String): Option[Double] = Try(s.trim.toDouble).toOption
  private def isLatitude(s: String): Boolean =
    asDouble(s).exists(v => v >= -90 && v <= 90)
  private def isLongitude(s: String): Boolean =
    asDouble(s).exists(v => v >= -180 && v <= 180)

  private def dmsDirection(s: String): Option[Char] = {
    val t = s.trim.toUpperCase
    if (t.isEmpty) None
    else t.last match {
      case c @ ('N' | 'S' | 'E' | 'W') => Some(c)
      case _ => None
    }
  }

  /** Best-guess DwC term for one value ("" when nothing fits). Extractor
    * order per reference `AdHocParser.parse:254-280`. */
  def guessType(value: String): String = {
    if (value == null || value.trim.isEmpty) return ""
    val v = value.trim
    // vocab stemming strips symbols/digits, so a pure number could
    // spuriously "match" a term — vocab branches need a letter
    val lettered = v.exists(_.isLetter)
    if (GeodeticDatum.epsg(v).isDefined && !isDouble(v)) "geodeticDatum"
    else if (imageUrl.unapplySeq(v).isDefined) "associatedMedia"
    else if (BasisOfRecord.matchTerm(v).isDefined && !isDouble(v)) "basisOfRecord"
    else if (lettered && TypeStatus.matchTerm(v).isDefined) "typeStatus"
    else if (graft.functions.DateParser.parseDate(v).isDefined && !isDouble(v))
      "eventDate"
    else if (graft.functions.GridRef.parse(v).isDefined && !isDouble(v))
      "gridReference"
    else if (isDouble(v)) {
      if (isLatitude(v)) "decimalLatitude"
      else if (isLongitude(v)) "decimalLongitude"
      else ""
    } else if (graft.functions.CoordinateParsers.parseVerbatimLatLong(v).isDefined) {
      dmsDirection(v) match {
        case Some('E') | Some('W') => "verbatimLongitude"
        case _ => "verbatimLatitude"
      }
    }
    else if (lettered && Countries.matchTerm(v).isDefined) "country"
    else if (lettered && StateProvinces.matchTerm(v).isDefined) "stateProvince"
    else if (v.startsWith("urn") || v.startsWith("http://")) "occurrenceID"
    else if (lettered && LifeStage.matchTerm(v).isDefined) "lifeStage"
    else if (lettered && Sex.matchTerm(v).isDefined) "sex"
    else if (catalog.findFirstIn(v).isDefined) "catalogNumber"
    else if (lettered && OccurrenceStatus.matchTerm(v).isDefined) "occurrenceStatus"
    else ""
  }

  /** First-two-column heuristics (reference `parseHead:238-244`). */
  private def parseHead(c1: String, c2: String): Option[(String, String)] =
    if (isLatitude(c1) && isLatitude(c2)) Some(("decimalLatitude", "decimalLongitude"))
    else if (Try(c1.trim.toInt).isSuccess) Some(("recordNumber", ""))
    else if (c1.startsWith("urn") || c1.startsWith("http://"))
      Some(("occurrenceID", ""))
    else None

  /** Guess a header per value (reference `guessColumnHeaders:182-236`):
    * value-based extraction with the head heuristics, then repair a
    * sequential duplicated decimalLatitude pair into (lat, lon). */
  def guessColumnHeaders(values: Seq[String]): Seq[String] = {
    var guessed = values.map(guessType)
    if (values.size > 1) {
      parseHead(values(0), values(1)).foreach { case (c1, _) =>
        if (c1.nonEmpty) guessed = guessed.updated(0, c1)
      }
    }
    val latIdx = guessed.zipWithIndex.filter(_._1 == "decimalLatitude").map(_._2)
    val seqPair = latIdx.zip(latIdx.drop(1)).find { case (a, b) => b == a + 1 }
    seqPair match {
      case Some((a, b)) =>
        guessed.updated(a, "decimalLatitude").updated(b, "decimalLongitude")
      case None => guessed
    }
  }
}
