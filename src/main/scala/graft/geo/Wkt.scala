package graft.geo

/** Minimal WKT polygon support: parse POLYGON/MULTIPOLYGON, ray-casting
  * point-in-polygon, and point-to-boundary distance.
  *
  * Replaces the reference's layers-service / GeoTools round-trips for the
  * expert-distribution outlier check (`tool/ExpertDistributionOutlierTool
  * .scala:397-455` in /root/reference/src/main/scala/au/org/ala/biocache/)
  * with a broadcast-able pure-Scala geometry — the right shape for a Spark
  * UDF over billions of points.
  */
object Wkt {

  type Ring = Array[(Double, Double)] // (lon, lat)

  /** All rings — outers and holes. Containment uses even-odd parity over
    * the full ring set ([[contains]]), which is exact for valid (O)GC
    * geometries: multipolygon outer rings are disjoint, so a point falls in
    * at most one outer, and each enclosing hole flips it back outside. */
  def parsePolygons(wkt: String): Seq[Ring] = {
    val s = wkt.trim.toUpperCase
    val body = s.substring(s.indexOf('('))
    // ring = innermost (...) group of "lon lat, lon lat, ..."
    val ringPat = """\(([^()]+)\)""".r
    ringPat.findAllMatchIn(body).map(_.group(1)).toSeq.map { r =>
      r.split(",").map { pt =>
        val xy = pt.trim.split("\\s+")
        (xy(0).toDouble, xy(1).toDouble)
      }
    }
  }

  def pointInRing(lon: Double, lat: Double, ring: Ring): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Even-odd rule over all rings: inside an odd number of rings ⇒ inside
    * the geometry (outer ring = in; outer + its hole = out again). */
  def contains(lon: Double, lat: Double, rings: Seq[Ring]): Boolean =
    rings.count(r => pointInRing(lon, lat, r)) % 2 == 1

  private val EarthRadiusM = 6378137.0

  def haversineMetres(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    import math._
    val dLat = toRadians(lat2 - lat1)
    val dLon = toRadians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(toRadians(lat1)) * cos(toRadians(lat2)) * pow(sin(dLon / 2), 2)
    2 * EarthRadiusM * asin(sqrt(a))
  }

  /** Approximate distance (m) from a point to the nearest polygon boundary
    * segment; 0 when inside. */
  def distanceToBoundaryMetres(lon: Double, lat: Double, rings: Seq[Ring]): Double = {
    if (contains(lon, lat, rings)) return 0.0
    var best = Double.MaxValue
    rings.foreach { ring =>
      var i = 0
      while (i < ring.length) {
        val (x1, y1) = ring(i)
        val (x2, y2) = ring((i + 1) % ring.length)
        // project point onto segment in degree space, then haversine
        val dx = x2 - x1; val dy = y2 - y1
        val len2 = dx * dx + dy * dy
        val t = if (len2 == 0) 0.0
          else math.max(0.0, math.min(1.0,
            ((lon - x1) * dx + (lat - y1) * dy) / len2))
        val px = x1 + t * dx; val py = y1 + t * dy
        val d = haversineMetres(lon, lat, px, py)
        if (d < best) best = d
        i += 1
      }
    }
    best
  }
}
