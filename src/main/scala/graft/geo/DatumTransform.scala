package graft.geo

/** Geodetic datum → WGS84 coordinate transformation via geocentric
  * (ECEF) Helmert transforms — the role GeoTools plays in the reference
  * (`util/GISUtil.scala:1-50` in
  * /root/reference/src/main/scala/au/org/ala/biocache/), implemented from
  * the published formulas and parameters:
  *
  *  - geodetic→geocentric and back: standard ellipsoid conversions,
  *  - AGD66/AGD84 → GDA94 (≈WGS84): ICSM GDA Technical Manual national
  *    7-parameter (position-vector) transformations,
  *  - NZGD49 → WGS84 and NAD27 → WGS84: published DMA/EPSG 3-parameter
  *    translations,
  *  - GDA94 / NAD83 / ETRS89: treated as WGS84-equivalent (sub-2 m, below
  *    occurrence-record uncertainty).
  *
  * Accuracy target is the reference's use case: the AGD66→WGS84 shift is
  * ~200 m — far larger than any residual between these national transforms
  * and a full grid transformation.
  */
object DatumTransform {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = 2 * f - f * f
  }

  val WGS84 = Ellipsoid(6378137.0, 298.257223563)
  val ANS = Ellipsoid(6378160.0, 298.25) // Australian National Spheroid
  val International1924 = Ellipsoid(6378388.0, 297.0)
  val Clarke1866 = Ellipsoid(6378206.4, 294.9786982)

  /** Position-vector 7-parameter transform (translations m, rotations
    * arc-seconds, scale ppm) from `ellipsoid` to WGS84. */
  final case class Helmert(
      tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double,
      ppm: Double, ellipsoid: Ellipsoid)

  /** Source EPSG → transform. Keys match `GeodeticDatum.epsg` output
    * (incl. the reference data table's "ESPG:4267" typo for NAD27 and its
    * EPSG:2230 mapping for NAD83). */
  val transforms: Map[String, Helmert] = Map(
    // AGD66 → GDA94 (ICSM GDA Technical Manual, national parameters)
    "EPSG:4202" -> Helmert(-117.808, -51.536, 137.784,
      -0.303, -0.446, -0.234, -0.290, ANS),
    // AGD84 → GDA94 (ICSM GDA Technical Manual)
    "EPSG:4203" -> Helmert(-117.763, -51.510, 139.061,
      -0.292, -0.443, -0.277, -0.191, ANS),
    // NZGD49 → WGS84 (published 3-parameter)
    "EPSG:4272" -> Helmert(54.4, -20.1, 183.1, 0, 0, 0, 0, International1924),
    // NAD27 → WGS84 (CONUS 3-parameter)
    "EPSG:4267" -> Helmert(-8.0, 160.0, 176.0, 0, 0, 0, 0, Clarke1866),
    "ESPG:4267" -> Helmert(-8.0, 160.0, 176.0, 0, 0, 0, 0, Clarke1866))

  /** EPSG codes already WGS84-equivalent at occurrence precision. */
  val wgs84Equivalent: Set[String] =
    Set("EPSG:4326", "WGS84", "EPSG:4283", "GDA94", "EPSG:2230", "EPSG:4759",
      "EPSG:4258")

  private def geodeticToXyz(latDeg: Double, lonDeg: Double,
      ell: Ellipsoid): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val n = ell.a / math.sqrt(1 - ell.e2 * math.sin(lat) * math.sin(lat))
    (n * math.cos(lat) * math.cos(lon),
      n * math.cos(lat) * math.sin(lon),
      n * (1 - ell.e2) * math.sin(lat))
  }

  private def xyzToGeodetic(x: Double, y: Double, z: Double,
      ell: Ellipsoid): (Double, Double) = {
    val p = math.sqrt(x * x + y * y)
    var lat = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    while (i < 6) {
      val n = ell.a / math.sqrt(1 - ell.e2 * math.sin(lat) * math.sin(lat))
      lat = math.atan2(z + ell.e2 * n * math.sin(lat), p)
      i += 1
    }
    (math.toDegrees(lat), math.toDegrees(math.atan2(y, x)))
  }

  /** Transform (lat, lon) on `sourceEpsg` to WGS84. None when no transform
    * is published here; Some(unchanged) for WGS84-equivalent datums. */
  def toWgs84(latDeg: Double, lonDeg: Double,
      sourceEpsg: String): Option[(Double, Double)] = {
    if (sourceEpsg == null) return None
    if (wgs84Equivalent.contains(sourceEpsg)) return Some((latDeg, lonDeg))
    transforms.get(sourceEpsg).map { h =>
      val (x, y, z) = geodeticToXyz(latDeg, lonDeg, h.ellipsoid)
      val s = 1 + h.ppm * 1e-6
      val rx = math.toRadians(h.rxSec / 3600)
      val ry = math.toRadians(h.rySec / 3600)
      val rz = math.toRadians(h.rzSec / 3600)
      val x2 = h.tx + s * (x - rz * y + ry * z)
      val y2 = h.ty + s * (rz * x + y - rx * z)
      val z2 = h.tz + s * (-ry * x + rx * y + z)
      xyzToGeodetic(x2, y2, z2, WGS84)
    }
  }
}
