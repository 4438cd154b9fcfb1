package graft.operators

import graft.geo.Wkt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial sampling: intersect distinct coordinates with GIS layers, then
  * join sampled values back onto records.
  *
  * Reference shape (`tool/Sampling.scala:29-616`,
  * `caches/LocationDAO.scala:75-175` in
  * /root/reference/src/main/scala/au/org/ala/biocache/): extract distinct
  * (lon,lat), batch-sample against layers, cache by rounded-coordinate key,
  * load back into records. The distinct-before-expensive-join shape is kept
  * verbatim — Catalyst won't invent it — and the layer set is broadcast, so
  * the expensive intersect runs once per distinct point, not per record.
  */
object Sampling {

  /** Rounded coordinate key: `round(lat,4)+","+round(lon,4)` —
    * `LocationDAO.scala:75-92`. try_cast: a garbage coordinate string must
    * yield a null key, not an ANSI cast crash (Spark 4 default). */
  def latLonKey(lat: org.apache.spark.sql.Column, lon: org.apache.spark.sql.Column) =
    concat_ws(",", format_number(lat.try_cast("double"), 4),
      format_number(lon.try_cast("double"), 4))

  /** A4: distinct coordinates of a record set. Unparseable coordinate
    * strings are dropped (try_cast null), matching the reference's skip of
    * unsampleable points rather than failing the whole scan. */
  def distinctCoordinates(records: DataFrame): DataFrame =
    records
      .select(col("decimalLatitude").try_cast("double").as("lat"),
        col("decimalLongitude").try_cast("double").as("lon"))
      .filter(col("lat").isNotNull && col("lon").isNotNull)
      .distinct()

  /** J3: point→contextual-layer values via a broadcast spatial grid index
    * (`graft.geo.SpatialIndex`): each point ray-casts only the polygons
    * whose bbox shares its grid cell, so per-point cost is flat in the
    * layer count — the Spark analogue of the reference's STRtree cache
    * (`caches/SpatialLayerDAO.scala:120-210`). `layers`: (layerId, value,
    * wkt) — vector layers only; raster layers would use a broadcast grid
    * lookup with the same UDF shape. The layer table is collected to the
    * driver under a documented size contract: layer polygons are dimension
    * data (thousands), never fact-scale. */
  def samplePoints(spark: SparkSession, points: DataFrame,
      layers: DataFrame): DataFrame = {
    val layerPolys: Array[(String, String, Seq[Wkt.Ring])] = layers
      .select("layerId", "value", "wkt").collect()
      .map(r => (r.getString(0), r.getString(1), Wkt.parsePolygons(r.getString(2))))
    val bc = spark.sparkContext.broadcast(
      graft.geo.SpatialIndex.build(layerPolys))
    val sampleUdf = udf { (lat: Double, lon: Double) =>
      bc.value.sample(lon, lat)
    }
    points.withColumn("cl", sampleUdf(col("lat"), col("lon")))
      .withColumn("latLonKey", latLonKey(col("lat"), col("lon")))
      .select("latLonKey", "lat", "lon", "cl")
  }

  /** J4: join sampled values back onto records by rounded-coordinate key
    * (replaces the reference's per-record loc-cache lookup). */
  def loadSamplesIntoRecords(records: DataFrame, samples: DataFrame): DataFrame =
    records.withColumn("latLonKey",
        latLonKey(col("decimalLatitude"), col("decimalLongitude")))
      .join(broadcast(samples.select("latLonKey", "cl")), Seq("latLonKey"), "left")
      .drop("latLonKey")

  /** Raster (environmental, "el*") layer sampling — the grid half of the
    * reference's layer cache (`caches/SpatialLayerDAO.scala`, el layers):
    * a regular grid anchored at (originLat, originLon) with square cells
    * of `cellSize` degrees, carried as rows `(layer, ix, iy, value)`.
    * Points map to cell indices with one floor per axis (map-only), then
    * ONE equi-join on (ix, iy) picks up every layer's value at that cell.
    *
    * Shape at 100 TB: unlike the vector path (driver-built broadcast
    * spatial index under a size contract), rasters can be arbitrarily
    * fine — the equi-join is keyed on the cell, so a continent-scale 1-km
    * raster (~10⁸ cells) just shuffles like any dimension join and never
    * touches the driver; Catalyst broadcasts it when it is small.
    * Returns `(lat, lon, layer, value)`, one row per point × covering
    * layer. */
  def sampleRasters(points: DataFrame, rasters: DataFrame,
      originLat: Double, originLon: Double, cellSize: Double): DataFrame = {
    val ix = floor((col("lon") - lit(originLon)) / lit(cellSize))
      .cast("long")
    val iy = floor((col("lat") - lit(originLat)) / lit(cellSize))
      .cast("long")
    points.select(col("lat"), col("lon"), ix.as("ix"), iy.as("iy"))
      .join(rasters.select(col("layer"), col("ix"), col("iy"),
        col("value")), Seq("ix", "iy"))
      .select("lat", "lon", "layer", "value")
  }
}
