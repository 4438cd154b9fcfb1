package graft.functions

import scala.util.Try

/** OSGB / Irish grid-reference parsing and conversion to WGS84.
  *
  * Capability parity with the reference's grid utilities
  * (`util/GridUtil.scala:75-620` in
  * /root/reference/src/main/scala/au/org/ala/biocache/), re-implemented from
  * the published Ordnance Survey projection formulas (transverse Mercator on
  * Airy 1830 / Airy Modified, then a 7-parameter Helmert shift to WGS84).
  */
object GridRef {

  case class GridReference(
      easting: Int, northing: Int, gridSizeMetres: Int,
      datum: String, // "OSGB36" or "Irish"
      lat: Double, lon: Double) // WGS84 centroid of the grid cell

  // 500km/100km letter pairs: position of each letter in the 5×5 grid (I skipped)
  private def letterIndex(c: Char): Int = {
    val i = c.toUpper - 'A'
    if (c.toUpper > 'I') i - 1 else i
  }

  /** "SP 123 456", "NM39", "TL123456", tetrads "NM39A" → OSGB
    * easting/northing + cell size. */
  def parseOsgb(raw: String): Option[(Int, Int, Int)] = {
    val s = raw.trim.replaceAll("\\s+", "").toUpperCase
    if (s.length < 2 || !s.take(2).forall(_.isLetter)) return None
    if (s.charAt(0) == 'I' || s.charAt(1) == 'I') return None // no I in OSGB
    var digits = s.drop(2)
    // DINTY tetrad suffix: 2 digits + one letter (O excluded) → 2 km cell
    val tetrad: Option[Char] =
      if (digits.length == 3 && digits.take(2).forall(_.isDigit) &&
        digits.last.isLetter && digits.last != 'O') {
        val t = digits.last; digits = digits.take(2); Some(t)
      } else None
    if (!digits.forall(_.isDigit) || digits.length % 2 != 0 ||
      digits.length > 10) return None
    val l1 = letterIndex(s.charAt(0))
    val l2 = letterIndex(s.charAt(1))
    // 500 km square from first letter, 100 km square from second
    val e100 = ((l1 - 2) % 5) * 5 + (l2 % 5)
    val n100 = (19 - (l1 / 5) * 5) - (l2 / 5)
    if (e100 < 0 || e100 > 6 || n100 < 0 || n100 > 12) return None
    val half = digits.length / 2
    val cell = math.pow(10, 5 - half).toInt
    var e = e100 * 100000 + (if (half == 0) 0 else digits.take(half).toInt * cell)
    var n = n100 * 100000 + (if (half == 0) 0 else digits.drop(half).toInt * cell)
    tetrad match {
      case Some(t) if half == 1 =>
        val idx = if (t > 'O') t - 'A' - 1 else t - 'A'
        e += (idx / 5) * 2000
        n += (idx % 5) * 2000
        Some((e, n, 2000))
      case Some(_) => None
      case None => Some((e, n, if (half == 0) 100000 else cell))
    }
  }

  /** Irish grid: single letter + digits ("N8090"), or explicit "I" prefix
    * ("IJ4967"). */
  def parseIrish(raw: String): Option[(Int, Int, Int)] = {
    var s = raw.trim.replaceAll("\\s+", "").toUpperCase
    if (s.length >= 2 && s.charAt(0) == 'I' && s.charAt(1).isLetter)
      s = s.drop(1) // explicit Irish prefix
    if (s.length < 1 || !s.head.isLetter || s.head == 'I') return None
    val digits = s.drop(1)
    if (!digits.forall(_.isDigit) || digits.length % 2 != 0 ||
      digits.length > 10) return None
    val li = letterIndex(s.head)
    val e100 = li % 5
    val n100 = 4 - li / 5
    val half = digits.length / 2
    val cell = math.pow(10, 5 - half).toInt
    val e = e100 * 100000 + (if (half == 0) 0 else digits.take(half).toInt * cell)
    val n = n100 * 100000 + (if (half == 0) 0 else digits.drop(half).toInt * cell)
    Some((e, n, if (half == 0) 100000 else cell))
  }

  private case class Ellipsoid(a: Double, b: Double)
  private case class Projection(
      ell: Ellipsoid, f0: Double, lat0: Double, lon0: Double,
      e0: Double, n0: Double)

  private val airy = Ellipsoid(6377563.396, 6356256.909)
  private val airyModified = Ellipsoid(6377340.189, 6356034.447)
  private val wgs84 = Ellipsoid(6378137.000, 6356752.3141)

  private val osgbProj = Projection(airy, 0.9996012717,
    math.toRadians(49), math.toRadians(-2), 400000, -100000)
  private val irishProj = Projection(airyModified, 1.000035,
    math.toRadians(53.5), math.toRadians(-8), 200000, 250000)

  /** Inverse transverse Mercator: (E, N) → lat/lon on the source ellipsoid
    * (OS Guide C.2 formulas). */
  private def enToLatLon(E: Double, N: Double, p: Projection): (Double, Double) = {
    val Ellipsoid(a, b) = p.ell
    val e2 = (a * a - b * b) / (a * a)
    val n = (a - b) / (a + b)
    val n2 = n * n; val n3 = n2 * n

    var lat = p.lat0
    var m = 0.0
    do {
      lat = (N - p.n0 - m) / (a * p.f0) + lat
      val dLat = lat - p.lat0; val sLat = lat + p.lat0
      m = b * p.f0 * (
        (1 + n + 1.25 * n2 + 1.25 * n3) * dLat
          - (3 * n + 3 * n2 + 2.625 * n3) * math.sin(dLat) * math.cos(sLat)
          + (1.875 * n2 + 1.875 * n3) * math.sin(2 * dLat) * math.cos(2 * sLat)
          - (35.0 / 24.0) * n3 * math.sin(3 * dLat) * math.cos(3 * sLat))
    } while (math.abs(N - p.n0 - m) >= 0.00001)

    val sin2 = math.sin(lat) * math.sin(lat)
    val nu = a * p.f0 / math.sqrt(1 - e2 * sin2)
    val rho = a * p.f0 * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
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
    val dE = E - p.e0
    val latOut = lat - vii * dE * dE + viii * math.pow(dE, 4) - ix * math.pow(dE, 6)
    val lonOut = p.lon0 + x * dE - xi * math.pow(dE, 3) +
      xii * math.pow(dE, 5) - xiia * math.pow(dE, 7)
    (latOut, lonOut)
  }

  /** 7-parameter Helmert transformation between datums (OS Guide 6.6). */
  private def helmertToWgs84(lat: Double, lon: Double, from: Ellipsoid,
      tx: Double, ty: Double, tz: Double, rxSec: Double, rySec: Double,
      rzSec: Double, sPpm: Double): (Double, Double) = {
    val e2 = (from.a * from.a - from.b * from.b) / (from.a * from.a)
    val nu = from.a / math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat))
    val x1 = nu * math.cos(lat) * math.cos(lon)
    val y1 = nu * math.cos(lat) * math.sin(lon)
    val z1 = nu * (1 - e2) * math.sin(lat)
    val s = sPpm / 1e6
    val rx = math.toRadians(rxSec / 3600); val ry = math.toRadians(rySec / 3600)
    val rz = math.toRadians(rzSec / 3600)
    val x2 = tx + (1 + s) * x1 - rz * y1 + ry * z1
    val y2 = ty + rz * x1 + (1 + s) * y1 - rx * z1
    val z2 = tz - ry * x1 + rx * y1 + (1 + s) * z1
    val a2 = wgs84.a; val b2 = wgs84.b
    val e22 = (a2 * a2 - b2 * b2) / (a2 * a2)
    val pr = math.sqrt(x2 * x2 + y2 * y2)
    var latW = math.atan2(z2, pr * (1 - e22))
    var i = 0
    while (i < 10) {
      val nu2 = a2 / math.sqrt(1 - e22 * math.sin(latW) * math.sin(latW))
      latW = math.atan2(z2 + e22 * nu2 * math.sin(latW), pr)
      i += 1
    }
    (latW, math.atan2(y2, x2))
  }

  /** Full pipeline: grid ref string → WGS84 cell centre + cell size.
    * OSGB first; Irish for single-letter refs. */
  def parse(raw: String): Option[GridReference] = Try {
    if (raw == null || raw.trim.isEmpty) return None
    parseOsgb(raw).map { case (e, n, cell) =>
      val (latA, lonA) = enToLatLon(e + cell / 2.0, n + cell / 2.0, osgbProj)
      val (latW, lonW) = helmertToWgs84(latA, lonA, airy,
        446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
      GridReference(e, n, cell, "OSGB36",
        math.toDegrees(latW), math.toDegrees(lonW))
    }.orElse(parseIrish(raw).map { case (e, n, cell) =>
      val (latA, lonA) = enToLatLon(e + cell / 2.0, n + cell / 2.0, irishProj)
      val (latW, lonW) = helmertToWgs84(latA, lonA, airyModified,
        482.5, -130.6, 564.6, 1.042, 0.214, 0.631, 8.15)
      GridReference(e, n, cell, "Irish",
        math.toDegrees(latW), math.toDegrees(lonW))
    })
  }.toOption.flatten

  /** Coordinate uncertainty implied by the grid cell (the reference reports
    * the cell size itself, `util/GridUtil.scala`). */
  def uncertaintyMetres(cellSize: Int): Double = cellSize.toDouble
}
