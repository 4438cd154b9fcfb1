package graft.vocab

/** Country / state centre-point tables (reference
  * `vocab/CentrePoints.scala`, `CountryCentrePoints.scala`,
  * `StateProvinceCentrePoints.scala` + the *CentrePoints.txt data tables in
  * /root/reference/src/main/resources): detects the data-entry artefact of
  * coordinates equal to the centre of the stated region, at the precision
  * the coordinates were supplied with.
  *
  * File format per row: NAME TAB lat TAB lon TAB northLat TAB eastLon TAB
  * southLat TAB westLon (centre point + bounding box).
  */
trait CentrePoints extends Serializable {
  protected def resource: String
  protected def vocab: Vocab

  /** lowercase canonical name → (lat, lon, north, east, south, west). */
  lazy val map: Map[String, (Double, Double, Double, Double, Double, Double)] =
    VocabData.lines(resource).map { row =>
      val v = row.split("\t")
      val name = v(0).stripPrefix("\"").stripSuffix("\"").toLowerCase
      name -> (v(1).toDouble, v(2).toDouble, v(3).toDouble, v(4).toDouble,
        v(5).toDouble, v(6).toDouble)
    }.toMap

  private def lookup(name: String) =
    vocab.matchTerm(name).flatMap(c => map.get(c.toLowerCase))

  /** True when the supplied coordinates equal the region's centre point at
    * the precision they were supplied with (reference
    * `CentrePoints.coordinatesMatchCentre`: centre truncated to the
    * supplied decimal places, 0-dp uses rounding). */
  def coordinatesMatchCentre(name: String, latStr: String,
      lonStr: String): Boolean =
    lookup(name).exists { case (clat, clon, _, _, _, _) =>
      try {
        val lat = latStr.trim.toDouble
        val lon = lonStr.trim.toDouble
        approx(clat, decimalPlaces(latStr)) == lat &&
          approx(clon, decimalPlaces(lonStr)) == lon
      } catch { case _: Exception => false }
    }

  private def decimalPlaces(s: String): Int = {
    val i = s.indexOf('.')
    if (i < 0) 0 else math.min(10, s.trim.length - i - 1)
  }

  private def approx(v: Double, dp: Int): Double =
    if (dp > 0) { val f = math.pow(10, dp); (v * f).toLong / f }
    else math.round(v).toDouble

  /** Region bounding box (north, east, south, west), vocab-resolved
    * (reference `CountryCentrePoints.matchName` → `BBox`). */
  def boundingBox(name: String): Option[(Double, Double, Double, Double)] =
    lookup(name).map { case (_, _, north, east, south, west) =>
      (north, east, south, west)
    }

  /** Point-in-bbox with date-line handling (reference `vocab/BBox.scala`). */
  def bboxContains(bbox: (Double, Double, Double, Double), lat: Double,
      lon: Double): Boolean = {
    val (north, east, south, west) = bbox
    if (east < west) // crosses the date line
      north >= lat && south <= lat &&
        ((lon >= -180 && lon <= east) || (lon >= west && lon <= 180))
    else
      north >= lat && south <= lat && east >= lon && west <= lon
  }

  /** Hemisphere letters covered by the region's bounding box (reference
    * `CentrePoints.getHemispheres`). */
  def getHemispheres(name: String): Option[Set[Char]] =
    lookup(name).map { case (_, _, north, east, south, west) =>
      Set(
        if (north >= 0) 'N' else 'S',
        if (south > 0) 'N' else 'S',
        if (east >= 0) 'E' else 'W',
        if (west > 0) 'E' else 'W')
    }
}

object CountryCentrePoints extends CentrePoints {
  protected val resource = "/graft/vocab/countryCentrePoints.txt"
  protected val vocab: Vocab = Countries
}

object StateProvinceCentrePoints extends CentrePoints {
  protected val resource = "/graft/vocab/stateProvinceCentrePoints.txt"
  protected val vocab: Vocab = StateProvinces
}
