package graft.geo

import scala.util.Try

/** Inverse UTM-style projections for the easting/northing/zone path
  * (reference `util/GridUtil.processNorthingEastingZone` +
  * `zoneEpsgCodes.txt` in /root/reference/src/main/scala/au/org/ala/biocache/):
  * a projected-zone EPSG code resolves to its source ellipsoid + transverse
  * Mercator parameters; the inverse projection yields geographic
  * coordinates on the zone's datum, which are then shifted to WGS84 via the
  * published Helmert parameters where the datum needs it (AGD66/AGD84).
  *
  * The TM inverse is the standard OS Guide C.2 series (the same formulas
  * GridRef uses for OSGB/Irish grids, here parametrised by ellipsoid and
  * zone constants).
  */
object Utm {
  import DatumTransform.{ANS, Ellipsoid, Helmert}

  val GRS80 = Ellipsoid(6378137.0, 298.257222101)
  val WGS84E = Ellipsoid(6378137.0, 298.257223563)

  /** Supported projected-zone families. EPSG 283zz = GDA94/MGA (GRS80,
    * WGS84-equivalent at occurrence precision); 202zz/203zz = AGD66/AGD84
    * AMG (ANS + Helmert); 326zz/327zz = WGS84 UTM north/south. */
  private case class Zone(ell: Ellipsoid, zone: Int, southern: Boolean,
      geographicEpsg: String)

  private def zoneOf(projEpsg: String): Option[Zone] = {
    val code = Try(projEpsg.trim.toUpperCase.stripPrefix("EPSG:").toInt).toOption
    code.flatMap {
      case c if c >= 28348 && c <= 28358 =>
        Some(Zone(GRS80, c - 28300, southern = true, "EPSG:4283"))
      case c if c >= 20248 && c <= 20258 =>
        Some(Zone(ANS, c - 20200, southern = true, "EPSG:4202"))
      case c if c >= 20348 && c <= 20358 =>
        Some(Zone(ANS, c - 20300, southern = true, "EPSG:4203"))
      case c if c >= 32601 && c <= 32660 =>
        Some(Zone(WGS84E, c - 32600, southern = false, "EPSG:4326"))
      case c if c >= 32701 && c <= 32760 =>
        Some(Zone(WGS84E, c - 32700, southern = true, "EPSG:4326"))
      case _ => None
    }
  }

  /** Inverse transverse Mercator (OS Guide C.2) on the given ellipsoid. */
  private def tmInverse(E: Double, N: Double, ell: Ellipsoid, f0: Double,
      lat0: Double, lon0: Double, e0: Double, n0: Double): (Double, Double) = {
    val a = ell.a
    val b = a * (1 - ell.f)
    val e2 = (a * a - b * b) / (a * a)
    val n = (a - b) / (a + b)
    val n2 = n * n; val n3 = n2 * n

    var lat = lat0
    var m = 0.0
    var iter = 0
    do {
      lat = (N - n0 - m) / (a * f0) + lat
      val dLat = lat - lat0; val sLat = lat + lat0
      m = b * f0 * (
        (1 + n + 1.25 * n2 + 1.25 * n3) * dLat
          - (3 * n + 3 * n2 + 2.625 * n3) * math.sin(dLat) * math.cos(sLat)
          + (1.875 * n2 + 1.875 * n3) * math.sin(2 * dLat) * math.cos(2 * sLat)
          - (35.0 / 24.0) * n3 * math.sin(3 * dLat) * math.cos(3 * sLat))
      iter += 1
    } while (math.abs(N - n0 - m) >= 0.00001 && iter < 100)

    val sin2 = math.sin(lat) * math.sin(lat)
    val nu = a * f0 / math.sqrt(1 - e2 * sin2)
    val rho = a * f0 * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
    val eta2 = nu / rho - 1
    val tanLat = math.tan(lat)
    val tan2 = tanLat * tanLat; val tan4 = tan2 * tan2
    val sec = 1 / math.cos(lat)
    val vii = tanLat / (2 * rho * nu)
    val viii = tanLat / (24 * rho * math.pow(nu, 3)) *
      (5 + 3 * tan2 + eta2 - 9 * tan2 * eta2)
    val ix = tanLat / (720 * rho * math.pow(nu, 5)) *
      (61 + 90 * tan2 + 45 * tan4)
    val x = sec / nu
    val xi = sec / (6 * math.pow(nu, 3)) * (nu / rho + 2 * tan2)
    val xii = sec / (120 * math.pow(nu, 5)) * (5 + 28 * tan2 + 24 * tan4)
    val xiia = sec / (5040 * math.pow(nu, 7)) *
      (61 + 662 * tan2 + 1320 * tan4 + 720 * tan4 * tan2)
    val dE = E - e0
    val latOut = lat - vii * dE * dE + viii * math.pow(dE, 4) - ix * math.pow(dE, 6)
    val lonOut = lon0 + x * dE - xi * math.pow(dE, 3) +
      xii * math.pow(dE, 5) - xiia * math.pow(dE, 7)
    (math.toDegrees(latOut), math.toDegrees(lonOut))
  }

  /** Projected easting/northing in the given zone EPSG → WGS84 lat/lon
    * degrees (unrounded; the caller applies the reference's 5-dp rounding). */
  def toWgs84(easting: Double, northing: Double, projEpsg: String): Option[(Double, Double)] =
    zoneOf(projEpsg).flatMap { z =>
      val lon0 = math.toRadians(6 * z.zone - 183)
      val n0 = if (z.southern) 1e7 else 0.0
      val (lat, lon) = tmInverse(easting, northing, z.ell, 0.9996, 0.0, lon0,
        500000.0, n0)
      if (lat.isNaN || lon.isNaN || math.abs(lat) > 90 || math.abs(lon) > 180)
        None
      else if (DatumTransform.wgs84Equivalent.contains(z.geographicEpsg))
        Some((lat, lon))
      else
        DatumTransform.toWgs84(lat, lon, z.geographicEpsg).orElse(Some((lat, lon)))
    }
}
