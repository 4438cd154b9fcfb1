package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

/** UDF return shape for the LOC coordinate kernel. PUBLIC top-level with
  * boxed nullable fields (Janino codegen requirement). */
case class LocationResult(
    lat: java.lang.Double, lon: java.lang.Double,
    datum: String, uncertainty: java.lang.Double,
    codes: Array[Int])

/** Pure-Scala coordinate kernel: a faithful port of the reference's
  * `processor/LocationProcessor.scala` coordinate path (in
  * /root/reference/src/main/scala/au/org/ala/biocache/), invoked once per
  * row as a single UDF.
  *
  * Ported semantics:
  *  - `processLatLong` (`:369-407`) resolution priority: decimal lat/long →
  *    verbatim lat/long (float or DMS, optional verbatimSRS reprojection) →
  *    easting/northing/zone (UTM inverse, GDA94 assumed without a
  *    verbatimSRS) → grid reference;
  *  - `processDecimalCoordinates` (`:419-486`): datum vocab match + EPSG
  *    lookup with verbatimSRS fallback, WGS84 assumption assertion,
  *    reprojection to WGS84 rounded to the coordinates' own precision,
  *    UNRECOGNIZED_GEODETIC_DATUM with a truthful null label;
  *  - `validateCoordinatesValues` (`:792-887`): inverted/out-of-range
  *    repair, zero-coordinate checks, and the country bounding-box
  *    negation repair (NEGATED_LATITUDE / NEGATED_LONGITUDE /
  *    COUNTRY_COORDINATE_MISMATCH);
  *  - `checkCoordinateUncertainty` (`:570-645`): uncertainty parse,
  *    uncertainty-in-precision rescue, precision range + decimal-places
  *    mismatch checks.
  *
  * Engine divergences (documented, both safer at scale): out-of-range and
  * 0,0 coordinates are nulled in the processed columns rather than carried
  * (the reference keeps out-of-range values); a recognised datum without a
  * published Helmert transform keeps its coordinates and truthful EPSG
  * label instead of dropping the point.
  */
object LocationKernel {
  import graft.model.AssertionCodes._
  import graft.vocab.{Countries, CountryCentrePoints, GeodeticDatum, VocabData}

  private lazy val zoneEpsg: Map[String, String] =
    VocabData.keyValues("/graft/vocab/zoneEpsgCodes.txt")

  private def blank(s: String) = s == null || s.trim.isEmpty

  private def floatOpt(s: String): Option[Float] =
    if (blank(s)) None else Try(s.trim.toFloat).toOption

  private def doubleOpt(s: String): Option[Double] =
    if (blank(s)) None else Try(s.trim.toDouble).toOption

  /** Decimal places of a numeric string (reference
    * `getNumberOfDecimalPlacesInDouble`). */
  private def decimalPlaces(s: String): Int = {
    val i = s.indexOf('.')
    if (i < 0) 0 else s.trim.length - i - 1
  }

  /** Plain (non-scientific) rendering of a double, for decimal-place
    * comparisons against the reference's string model. */
  private def plain(d: Double): String =
    java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString

  private def roundTo(v: Double, dp: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(math.max(0, dp), java.math.RoundingMode.HALF_UP).doubleValue

  /** Float → double via the float's shortest decimal rendering — the
    * reference carries `decimalVerbatimLat.get.toString`, so this keeps
    * decimal-place counts (and values) aligned with its string model
    * instead of inheriting float binary noise (-35.126f as a raw double is
    * -35.12599945…). */
  private def f2d(f: Float): Double = f.toString.toDouble

  def process(decimalLat: String, decimalLon: String, geodeticDatum: String,
      verbatimLat: String, verbatimLon: String, verbatimSRS: String,
      easting: String, northing: String, zone: String, gridReference: String,
      uncertainty: String, precision: String, country: String): LocationResult = {

    val codes = ArrayBuffer[Int]()
    var lat: Option[Double] = None
    var lon: Option[Double] = None
    var datum: Option[String] = None
    var uncOut: Option[Double] = None

    def reprojectRounded(la: Double, lo: Double, epsg: String,
        dp: Int): Option[(Double, Double)] =
      graft.geo.DatumTransform.toWgs84(la, lo, epsg)
        .map { case (rla, rlo) => (roundTo(rla, dp), roundTo(rlo, dp)) }

    // ── processLatLong: decimal path (:374-376, :419-486) ──
    if (!blank(decimalLat) && !blank(decimalLon) &&
      floatOpt(decimalLat).isDefined && floatOpt(decimalLon).isDefined) {
      val dLat = doubleOpt(decimalLat).get
      val dLon = doubleOpt(decimalLon).get
      if (geodeticDatum != null) {
        val epsg = GeodeticDatum.epsg(geodeticDatum)
          .orElse(if (verbatimSRS != null) GeodeticDatum.epsg(verbatimSRS) else None)
        epsg match {
          case Some(e) if graft.geo.DatumTransform.wgs84Equivalent.contains(e) =>
            lat = Some(dLat); lon = Some(dLon); datum = Some("EPSG:4326")
          case Some(e) =>
            val dp = math.min(decimalPlaces(decimalLat), decimalPlaces(decimalLon))
            reprojectRounded(dLat, dLon, e, dp) match {
              case Some((rla, rlo)) =>
                codes += DECIMAL_LAT_LONG_CONVERTED.code
                lat = Some(rla); lon = Some(rlo); datum = Some("EPSG:4326")
              case None =>
                // recognised datum without a published transform: keep the
                // coordinates and the truthful label (divergence, see above)
                lat = Some(dLat); lon = Some(dLon); datum = Some(e)
            }
          case None =>
            codes += UNRECOGNIZED_GEODETIC_DATUM.code
            lat = Some(dLat); lon = Some(dLon); datum = None
        }
      } else {
        codes += GEODETIC_DATUM_ASSUMED_WGS84.code
        lat = Some(dLat); lon = Some(dLon); datum = Some("EPSG:4326")
      }
    } else {
      codes += DECIMAL_COORDINATES_NOT_SUPPLIED.code
      // ── verbatim path (:381-394, :497-553) ──
      if (verbatimLat != null && verbatimLon != null) {
        var vLat = floatOpt(verbatimLat)
        var vLon = floatOpt(verbatimLon)
        if (vLat.isEmpty || vLon.isEmpty) {
          vLat = CoordinateParsers.parseVerbatimLatLong(verbatimLat)
          vLon = CoordinateParsers.parseVerbatimLatLong(verbatimLon)
        }
        (vLat, vLon) match {
          case (Some(vla), Some(vlo))
            if math.abs(vla) <= 90 && math.abs(vlo) <= 180 =>
            if (verbatimSRS != null) {
              GeodeticDatum.epsg(verbatimSRS) match {
                case Some(e) if graft.geo.DatumTransform.wgs84Equivalent.contains(e) =>
                  codes += DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM.code
                  lat = Some(f2d(vla)); lon = Some(f2d(vlo))
                  datum = Some("EPSG:4326")
                case Some(e) =>
                  val dp = math.min(decimalPlaces(vla.toString),
                    decimalPlaces(vlo.toString))
                  reprojectRounded(vla, vlo, e, dp) match {
                    case Some((rla, rlo)) =>
                      codes += DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM.code
                      lat = Some(rla); lon = Some(rlo); datum = Some("EPSG:4326")
                    case None =>
                      codes += DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED.code
                  }
                case None =>
                  codes += DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED.code
              }
            } else {
              codes += DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM.code
              lat = Some(f2d(vla)); lon = Some(f2d(vlo))
              datum = Some("EPSG:4326")
            }
          case (Some(_), Some(_)) => // out-of-range verbatim values
            codes += DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED.code
          case _ => ()
        }
      } else if (!blank(easting) && !blank(northing) && !blank(zone)) {
        // ── easting/northing/zone (GridUtil.processNorthingEastingZone) ──
        val key = (if (verbatimSRS != null) verbatimSRS.trim.toUpperCase
        else "GDA94") + "|" + zone.trim
        (zoneEpsg.get(key), doubleOpt(easting), doubleOpt(northing)) match {
          case (Some(projEpsg), Some(e), Some(n)) =>
            graft.geo.Utm.toWgs84(e, n, projEpsg) match {
              case Some((la, lo)) =>
                // metres in, so 5 dp ≈ 1 m out (reference rounds the same)
                codes += DECIMAL_LAT_LONG_CALCULATED_FROM_EASTING_NORTHING.code
                lat = Some(roundTo(la, 5)); lon = Some(roundTo(lo, 5))
                datum = Some("EPSG:4326")
              case None =>
                codes += DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED.code
            }
          case (None, _, _) =>
            codes += DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED.code
          case _ => ()
        }
      } else if (!blank(gridReference)) {
        GridRef.parse(gridReference).foreach { g =>
          codes += DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF.code
          lat = Some(g.lat); lon = Some(g.lon); datum = Some("EPSG:4326")
          uncOut = Some(GridRef.uncertaintyMetres(g.gridSizeMetres))
        }
      }
    }

    // ── validateCoordinatesValues (:792-887) ──
    (lat, lon) match {
      case (Some(la0), Some(lo0)) =>
        var la = la0; var lo = lo0
        if (la < -90 || la > 90 || lo < -180 || lo > 180) {
          if (lo >= -90 && lo <= 90 && la >= -180 && la <= 180) {
            codes += INVERTED_COORDINATES.code
            val t = la; la = lo; lo = t
          } else {
            codes += COORDINATES_OUT_OF_RANGE.code
            // divergence: null rather than carry garbage into downstream
            // spatial joins
            la = Double.NaN; lo = Double.NaN
          }
        }
        if (!la.isNaN) {
          if (la == 0.0 && lo == 0.0) {
            codes += ZERO_COORDINATES.code
            // reference nulls 0,0 in the processed record (:826-828)
          }
          if (la == 0.0) codes += ZERO_LATITUDE_COORDINATES.code
          if (lo == 0.0) codes += ZERO_LONGITUDE_COORDINATES.code

          // country bounding-box negation repair (:841-884); unknown
          // country names assert in the inference stage, not here
          if (!blank(country)) {
            for {
              canonical <- Countries.matchTerm(country)
              bbox <- CountryCentrePoints.boundingBox(canonical)
            } {
              if (!CountryCentrePoints.bboxContains(bbox, la, lo)) {
                var mismatch = true
                if (CountryCentrePoints.bboxContains(bbox, la * -1, lo)) {
                  codes += NEGATED_LATITUDE.code
                  la = la * -1
                  mismatch = false
                }
                if (CountryCentrePoints.bboxContains(bbox, la0, lo * -1)) {
                  codes += NEGATED_LONGITUDE.code
                  lo = lo * -1
                  mismatch = false
                }
                if (mismatch) codes += COUNTRY_COORDINATE_MISMATCH.code
              }
            }
          }
        }
        if (la.isNaN || (la == 0.0 && lo == 0.0)) {
          lat = None; lon = None
        } else {
          lat = Some(la); lon = Some(lo)
        }
      case _ => ()
    }

    // ── checkCoordinateUncertainty (:570-645) ──
    var checkedPrecision = false
    if (!blank(uncertainty)) {
      CoordinateParsers.parseDistanceMetres(uncertainty) match {
        case Some(v) =>
          if (v > 0) uncOut = Some(v.toDouble)
          else codes += UNCERTAINTY_RANGE_MISMATCH.code
        case None =>
          codes += UNCERTAINTY_RANGE_MISMATCH.code
      }
    } else if (precision != null) {
      // uncertainty mistakenly supplied as "precision" in metres
      floatOpt(precision).filter(_ > 1).foreach { v =>
        uncOut = Some(v.toInt.toDouble)
        codes += UNCERTAINTY_IN_PRECISION.code
        checkedPrecision = true
      }
    }

    if (blank(precision)) {
      codes += MISSING_COORDINATEPRECISION.code
    } else if (!checkedPrecision) {
      floatOpt(precision) match {
        case Some(v) if v > 0 && v <= 1 =>
          val pre = decimalPlaces(precision.trim)
          val latp = lat.map(d => decimalPlaces(plain(d))).getOrElse(0)
          val lonp = lon.map(d => decimalPlaces(plain(d))).getOrElse(0)
          if (!(pre == latp && pre == lonp))
            codes += COORDINATE_PRECISION_MISMATCH.code
        case _ =>
          codes += PRECISION_RANGE_MISMATCH.code
      }
    }

    if (uncOut.isEmpty) codes += UNCERTAINTY_NOT_SPECIFIED.code

    def boxD(o: Option[Double]): java.lang.Double = o.map(Double.box).orNull
    LocationResult(boxD(lat), boxD(lon), datum.orNull, boxD(uncOut),
      codes.distinct.sorted.toArray)
  }
}
