package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Index projection + serving surface.
  *
  * The reference projects each occ row into a ~200-field denormalised SOLR
  * document (`index/IndexDAO.scala:212-470` mapping table, row path
  * `getOccIndexModel:516-899`) and serves facets/distinct/stream/download
  * from it (`index/IndexDAO.scala:24-57`, `index/SolrIndexDAO.scala:299-330`).
  * Here the index is simply a derived DataFrame: the projection is one wide
  * `select` with per-field processed-else-raw `coalesce` (the pattern at
  * `index/IndexDAO.scala:146-153`), "commit/optimise" is Parquet compaction,
  * and every serving query is a filter/groupBy/sort over it.
  */
object IndexSupport {

  /** Processed-over-raw choice for one field. */
  def p(df: DataFrame, field: String): Column = {
    val processedName = s"processed_$field"
    if (df.columns.contains(processedName) && df.columns.contains(field))
      coalesce(col(processedName), col(field))
    else if (df.columns.contains(processedName)) col(processedName)
    else if (df.columns.contains(field)) col(field)
    else lit(null)
  }

  /** P3 shouldIndex filter (reference `SolrIndexDAO.scala:580-607`). */
  def shouldIndex(df: DataFrame): DataFrame = {
    val deleted =
      if (df.columns.contains("deleted")) col("deleted") === true
      else lit(false)
    df.filter(!deleted)
  }

  /** Field-mapping modes, mirroring the reference's RAW / PARSED /
    * RAW_AND_PARSED scheme (`index/IndexDAO.scala:199-209`). */
  sealed trait Mode
  case object RawOnly extends Mode        // raw value under the index name
  case object ParsedOnly extends Mode     // processed value under the index name
  case object RawAndParsed extends Mode   // both: raw_<name> and <name>
  case object Best extends Mode           // processed-else-raw coalesce

  /** The index field table (DwC term → index column(s)): the table-driven
    * core of the ~200-column projection (`index/IndexDAO.scala:212-433`).
    * Fields absent from the input project as nulls, so the index schema is
    * fixed regardless of which columns a resource supplied. */
  val indexFields: Seq[(String, String, Mode)] = Seq(
    ("occurrenceID", "occurrence_id", RawOnly),
    ("catalogNumber", "catalogue_number", RawOnly),
    ("recordNumber", "record_number", RawOnly),
    ("collectionCode", "collection_code", RawOnly),
    ("institutionCode", "institution_code", RawOnly),
    ("dataResourceUid", "data_resource_uid", RawOnly),
    ("datasetName", "dataset_name", RawOnly),
    ("eventID", "event_id", RawOnly),
    ("locationID", "location_id", RawOnly),
    ("locality", "raw_locality", RawOnly),
    ("locationRemarks", "location_remarks", RawOnly),
    ("occurrenceRemarks", "occurrence_remarks", RawOnly),
    ("identifiedBy", "identified_by", RawOnly),
    ("individualCount", "individual_count", RawOnly),
    ("samplingProtocol", "sampling_protocol", Best),
    ("identificationQualifier", "raw_identification_qualifier", RawOnly),
    ("habitat", "raw_habitat", RawOnly),
    ("verbatimEventDate", "verbatim_event_date", RawOnly),
    ("verbatimLatitude", "verbatim_latitude", RawOnly),
    ("verbatimLongitude", "verbatim_longitude", RawOnly),
    ("rights", "rights", RawOnly),
    ("license", "license", Best),
    ("recordedBy", "collector", Best),
    ("scientificName", "taxon_name", Best),
    ("vernacularName", "common_name", Best),
    ("taxonConceptID", "taxon_concept_lsid", ParsedOnly),
    ("taxonRank", "rank", Best),
    ("kingdom", "kingdom", Best),
    ("phylum", "phylum", Best),
    ("classs", "class", Best),
    ("order", "order", Best),
    ("family", "family", Best),
    ("genus", "genus", Best),
    ("specificEpithet", "specific_epithet", RawOnly),
    ("speciesGroups", "species_group", ParsedOnly),
    ("basisOfRecord", "basis_of_record", RawAndParsed),
    ("occurrenceStatus", "occurrence_status", RawAndParsed),
    ("typeStatus", "type_status", RawAndParsed),
    ("sex", "sex", RawAndParsed),
    ("lifeStage", "life_stage", Best),
    ("establishmentMeans", "establishment_means", Best),
    ("eventDate", "occurrence_date", ParsedOnly),
    ("eventDateEnd", "occurrence_date_end_dt", ParsedOnly),
    ("year", "occurrence_year", ParsedOnly),
    ("month", "month", ParsedOnly),
    ("day", "day", ParsedOnly),
    ("dateIdentified", "identified_date", Best),
    ("datePrecision", "date_precision", RawOnly),
    ("decimalLatitude", "latitude", RawAndParsed),
    ("decimalLongitude", "longitude", RawAndParsed),
    ("coordinateUncertaintyInMeters", "coordinate_uncertainty", ParsedOnly),
    ("coordinatePrecision", "coordinate_precision", RawOnly),
    ("geodeticDatum", "datum", RawAndParsed),
    ("gridReference", "grid_reference", RawOnly),
    ("country", "country", Best),
    ("countryCode", "country_code", RawOnly),
    ("stateProvince", "state", Best),
    ("minimumDepthInMeters", "min_depth_d", RawOnly),
    ("maximumDepthInMeters", "max_depth_d", RawOnly),
    ("minimumElevationInMeters", "min_elevation_d", RawOnly),
    ("maximumElevationInMeters", "max_elevation_d", RawOnly),
    ("institutionName", "institution_name", ParsedOnly),
    ("collectionName", "collection_name", ParsedOnly),
    ("dataGeneralizations", "data_generalizations", ParsedOnly),
    ("associatedMedia", "multimedia_url", RawOnly))

  /** P2 projection: enriched record → flat search schema. Table-driven from
    * `indexFields`; derived fields (point rounding grid, latLong string,
    * assertion names, kosher flags) are built once at the end. */
  def project(enriched: DataFrame): DataFrame = {
    val base = shouldIndex(enriched)
    // try_cast at the source: the processed coords are doubles out of the
    // enrichment pipeline, but project() also accepts re-read tables where
    // they may be strings — a garbage value must not ANSI-crash the
    // roundings / concat below (Spark 4 runs ANSI mode by default)
    val lat = col("processed_decimalLatitude").try_cast("double")
    val lon = col("processed_decimalLongitude").try_cast("double")
    def rawOf(f: String): Column =
      if (base.columns.contains(f)) col(f) else lit(null)
    def parsedOf(f: String): Column = {
      val name = s"processed_$f"
      if (base.columns.contains(name)) col(name) else lit(null)
    }
    val mapped: Seq[Column] = indexFields.flatMap { case (dwc, idx, mode) =>
      mode match {
        case RawOnly => Seq(rawOf(dwc).as(idx))
        case ParsedOnly => Seq(parsedOf(dwc).as(idx))
        case Best => Seq(p(base, dwc).as(idx))
        case RawAndParsed =>
          Seq(rawOf(dwc).as(s"raw_$idx"), parsedOf(dwc).as(idx))
      }
    }
    val cols: Seq[Column] =
      col("rowKey").as("id") +: mapped ++: Seq(
        lat.as("decimalLatitude"),
        lon.as("decimalLongitude"),
        concat_ws(",", lat.cast("string"), lon.cast("string")).as("latLong"),
        // point-rounding grid (reference `IndexDAO.scala:170-198`)
        concat_ws(",", round(lat, 0), round(lon, 0)).as("point1"),
        concat_ws(",", round(lat, 1), round(lon, 1)).as("point01"),
        concat_ws(",", round(lat, 2), round(lon, 2)).as("point001"),
        concat_ws(",", round(lat, 3), round(lon, 3)).as("point0001"),
        concat_ws(",", round(lat, 4), round(lon, 4)).as("point00001"),
        col("assertions").getField("name").as("assertions"),
        col("geospatiallyKosher"), col("taxonomicallyKosher"))
    base.select(cols: _*)
  }
}

/** Query surface over the index DataFrame — the `Store`-facade equivalents
  * of A1–A3, W3, S12/S13, S17 (reference `Store.scala:40-771`,
  * `index/SolrIndexDAO.scala:299-330,1439-1532`). */
object Serving {

  /** A1 facet count. */
  def facet(index: DataFrame, field: String,
      predicate: Option[Column] = None): DataFrame =
    predicate.fold(index)(index.filter)
      .groupBy(field).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(field).asc)

  /** A2 facet with minimum count. */
  def facetWithMinCount(index: DataFrame, field: String, minCount: Long,
      predicate: Option[Column] = None): DataFrame =
    facet(index, field, predicate).filter(col("count") >= minCount)

  /** A3 distinct values, capped. */
  def distinctValues(index: DataFrame, field: String, max: Int,
      predicate: Option[Column] = None): DataFrame =
    predicate.fold(index)(index.filter)
      .select(field).distinct().orderBy(field).limit(max)

  /** W3 first-N ids matching a predicate. */
  def idsForQuery(index: DataFrame, predicate: Column, limit: Int): DataFrame =
    index.filter(predicate).select("id").orderBy("id").limit(limit)

  /** S12/S13 filtered (optionally sorted) field scan / streaming export. */
  def scan(index: DataFrame, fields: Seq[String], predicate: Column,
      sortFields: Seq[String] = Nil): DataFrame = {
    val filtered = index.filter(predicate).select(fields.map(col): _*)
    if (sortFields.nonEmpty) filtered.orderBy(sortFields.map(col): _*)
    else filtered
  }

  /** S17 keyed download: selected fields + assertion presence columns for a
    * key set (reference `writeToStream`, `OccurrenceDAOImpl.scala:304-360`).
    * Write the result with `.write.option("sep", d).csv(path)`. */
  def download(index: DataFrame, rowKeys: DataFrame, fields: Seq[String],
      qaFields: Seq[String]): DataFrame = {
    val keyed = index.join(rowKeys, index("id") === rowKeys("rowKey"), "left_semi")
    val qaCols = qaFields.map(qa =>
      array_contains(col("assertions"), qa).as(s"qa_$qa"))
    keyed.select(fields.map(col) ++ qaCols: _*).orderBy("id")
  }
}
