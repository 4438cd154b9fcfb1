package graft.processors

import graft.model.AssertionCodes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-backed enrichment stages: per-resource defaults, attribution,
  * sensitive-species generalisation, species groups, validation rules.
  *
  * Each replaces a per-record HTTP/cache lookup in the reference with a
  * broadcast join (`caches/AttributionDAO.scala:55-222`,
  * `processor/SensitivityProcessor.scala:37-356`,
  * `vocab/SpeciesGroups.scala:207-220`, `qa/ValidationRuleRunner.scala` in
  * /root/reference/src/main/scala/au/org/ala/biocache/).
  */
object DimensionStages {

  /** DEFAULT stage: inject per-resource default DwC values for null fields.
    * `defaultsDim`: (dataResourceUid, field, value) long format. */
  def applyDefaultValues(df: DataFrame, defaultsDim: DataFrame): DataFrame = {
    val fields = defaultsDim.select("field").distinct()
      .collect().map(_.getString(0))
    fields.foldLeft(df) { (acc, field) =>
      val dim = defaultsDim.filter(col("field") === field)
        .select(col("dataResourceUid"), col("value").as(s"_default_$field"))
      val joined = acc.join(broadcast(dim), Seq("dataResourceUid"), "left")
      val withDefault =
        if (acc.columns.contains(field))
          joined.withColumn(field,
            coalesce(col(field), col(s"_default_$field")))
        else joined.withColumn(field, col(s"_default_$field"))
      withDefault.drop(s"_default_$field")
    }
  }

  /** ATTR stage (J2): (institutionCode, collectionCode) → attribution
    * metadata + unrecognised-code assertions. `attributionDim`:
    * (institutionCode, collectionCode, institutionName, collectionName). */
  def processAttribution(df: DataFrame, attributionDim: DataFrame): DataFrame = {
    val hasCodes = df.columns.contains("institutionCode") &&
      df.columns.contains("collectionCode")
    val base =
      if (hasCodes) df
      else df.withColumn("institutionCode", lit(null).cast("string"))
        .withColumn("collectionCode", lit(null).cast("string"))
    val dim = attributionDim.select(
      upper(col("institutionCode")).as("_ic"),
      upper(col("collectionCode")).as("_cc"),
      col("institutionName").as("processed_institutionName"),
      col("collectionName").as("processed_collectionName"))
    base
      .withColumn("_ic", upper(col("institutionCode")))
      .withColumn("_cc", upper(col("collectionCode")))
      .join(broadcast(dim), Seq("_ic", "_cc"), "left")
      .withColumn("assertions_attr", array_compact(array(
        AssertionCodes.assertCodeIf(
          col("institutionCode").isNotNull &&
            col("processed_institutionName").isNull,
          AssertionCodes.UNRECOGNISED_INSTITUTION_CODE),
        AssertionCodes.assertCodeIf(
          col("collectionCode").isNotNull &&
            col("processed_collectionName").isNull,
          AssertionCodes.UNRECOGNISED_COLLECTION_CODE))))
      .drop("_ic", "_cc")
  }

  /** SENSITIVE stage (J6/P5): match against the sensitivity rule table,
    * generalise coordinates to the rule's precision, stash the precise
    * originals (the reference keeps them in `originalSensitiveValues` for
    * authorised download). `sensitivityDim`: (nameLower,
    * generalisationMetres). Requires processed coordinates. */
  def processSensitivity(df: DataFrame, sensitivityDim: DataFrame): DataFrame = {
    val dim = sensitivityDim.select(col("nameLower").as("_sensName"),
      col("generalisationMetres"))
    val nameKey = lower(coalesce(
      if (df.columns.contains("processed_scientificName"))
        col("processed_scientificName") else lit(null),
      if (df.columns.contains("scientificName")) col("scientificName")
      else lit(null)))
    // metres → decimal places: 100m→3, 1km→2, 10km→1, 100km→0.
    // round()'s scale must be foldable, so generalise via scale-factor
    // arithmetic instead of a per-row scale.
    val decimals = when(col("generalisationMetres") <= 100, 3)
      .when(col("generalisationMetres") <= 1000, 2)
      .when(col("generalisationMetres") <= 10000, 1)
      .otherwise(0)
    val factor = pow(lit(10.0), decimals)
    def generalise(c: Column): Column = round(c * factor, 0) / factor
    val lat = col("processed_decimalLatitude")
    val lon = col("processed_decimalLongitude")
    val sensitive = col("generalisationMetres").isNotNull && lat.isNotNull
    df.withColumn("_sensName", nameKey)
      .join(broadcast(dim), Seq("_sensName"), "left")
      .withColumn("originalSensitiveValues",
        when(sensitive, map(
          lit("decimalLatitude"), lat.cast("string"),
          lit("decimalLongitude"), lon.cast("string"))).otherwise(lit(null)))
      .withColumn("processed_decimalLatitude",
        when(sensitive, generalise(lat)).otherwise(lat))
      .withColumn("processed_decimalLongitude",
        when(sensitive, generalise(lon)).otherwise(lon))
      .withColumn("processed_dataGeneralizations",
        when(sensitive, concat(lit("Coordinates generalised to "),
          col("generalisationMetres").cast("string"), lit(" metres")))
          .otherwise(lit(null)))
      .withColumn("isSensitive", sensitive)
      .withColumn("assertions_sensitive", array_compact(array(
        AssertionCodes.assertCodeIf(sensitive,
          AssertionCodes.DATA_ARE_GENERALISED))))
      .drop("_sensName", "generalisationMetres")
  }

  /** P5: masked projection for un-authorised consumers vs full for
    * authorised (reference `Store.scala:107` sensitive-field handling). */
  def maskSensitive(df: DataFrame, includeSensitive: Boolean): DataFrame =
    if (includeSensitive && df.columns.contains("originalSensitiveValues"))
      df.withColumn("processed_decimalLatitude",
          coalesce(element_at(col("originalSensitiveValues"),
            "decimalLatitude").cast("double"),
            col("processed_decimalLatitude")))
        .withColumn("processed_decimalLongitude",
          coalesce(element_at(col("originalSensitiveValues"),
            "decimalLongitude").cast("double"),
            col("processed_decimalLongitude")))
    else df.drop("originalSensitiveValues")

  /** J13: lft/rgt containment join — species-group labels from taxon lft.
    * `groupsDim`: (speciesGroup, lft, rgt); tiny → broadcast theta join.
    * Aggregated by `idCol` then joined back, so arbitrary (incl. map-typed)
    * record columns survive. */
  def speciesGroups(df: DataFrame, groupsDim: DataFrame,
      idCol: String = "rowKey"): DataFrame = {
    val groups = df.select(col(idCol), col("processed_lft"))
      .join(broadcast(groupsDim.select(col("speciesGroup"),
        col("lft").as("_glft"), col("rgt").as("_grgt"))),
        col("processed_lft") >= col("_glft") &&
          col("processed_lft") < col("_grgt"))
      .groupBy(idCol)
      .agg(collect_set("speciesGroup").as("processed_speciesGroups"))
    df.join(groups, Seq(idCol), "left")
      .withColumn("processed_speciesGroups",
        coalesce(col("processed_speciesGroups"),
          array().cast("array<string>")))
  }

  /** F11: coordinates-are-country-centre check (reference
    * `vocab/CountryCentrePoints.scala` + `processor/LocationProcessor
    * .scala:652-790`): a record whose coordinates equal its country's centre
    * point (at 2-dp tolerance, the common data-entry artefact) is flagged.
    * `centresDim`: (country, centreLat, centreLon). */
  def checkCentrePoints(df: DataFrame, centresDim: DataFrame): DataFrame = {
    val dim = centresDim.select(lower(col("country")).as("_cc"),
      col("centreLat"), col("centreLon"))
    val isCentre = col("centreLat").isNotNull &&
      round(col("processed_decimalLatitude"), 2) === round(col("centreLat"), 2) &&
      round(col("processed_decimalLongitude"), 2) === round(col("centreLon"), 2)
    df.withColumn("_cc", lower(
        if (df.columns.contains("country")) col("country") else lit(null)))
      .join(broadcast(dim), Seq("_cc"), "left")
      .withColumn("assertions_centre", array_compact(array(
        AssertionCodes.assertCodeIf(isCentre,
          AssertionCodes.COORDINATES_CENTRE_OF_COUNTRY))))
      .drop("_cc", "centreLat", "centreLon")
  }

  /** OFFLINE stage (reference `processor/OfflineTestProcessor.scala:11-36`):
    * carry the offline-analytics results — outlier layers, duplication
    * status/type, associated occurrences, expert-range distance — and the
    * offline assertion codes forward from the previous processed snapshot.
    * This is a fact-to-fact join on rowKey (NOT broadcast: the snapshot is
    * fact-scale); at cluster scale both sides should be bucketed by rowKey
    * so the join is co-located. */
  def carryForwardOffline(df: DataFrame, lastProcessed: DataFrame): DataFrame = {
    val offline = array(AssertionCodes.offlineAssertionCodes.map(lit): _*)
    def prevCol(name: String): Column =
      if (lastProcessed.columns.contains(name)) col(name)
      else lit(null).cast("string")
    val prev = lastProcessed.select(
      col("rowKey"),
      prevCol("processed_outlierForLayers").as("processed_outlierForLayers"),
      prevCol("processed_duplicationStatus").as("processed_duplicationStatus"),
      prevCol("processed_duplicationType").as("processed_duplicationType"),
      prevCol("processed_associatedOccurrences").as("processed_associatedOccurrences"),
      prevCol("processed_distanceOutsideExpertRange")
        .as("processed_distanceOutsideExpertRange"),
      (if (lastProcessed.columns.contains("assertionCodes"))
        array_intersect(col("assertionCodes"), offline)
      else array().cast("array<int>")).as("assertions_offline"))
    df.join(prev, Seq("rowKey"), "left")
      .withColumn("assertions_offline",
        coalesce(col("assertions_offline"), array().cast("array<int>")))
  }

  /** REPROCESSING stage (reference `ReprocessingProcessor.scala:18-36`):
    * when the processed coordinates are unchanged from the previous
    * snapshot, reuse its el/cl layer-sample maps instead of re-sampling.
    * Same rowKey-join contract as [[carryForwardOffline]]. */
  def reuseSamplesWhenUnchanged(df: DataFrame,
      lastProcessed: DataFrame): DataFrame = {
    if (!lastProcessed.columns.contains("cl")) return df
    val prev = lastProcessed.select(col("rowKey"),
      col("processed_decimalLatitude").as("_prevLat"),
      col("processed_decimalLongitude").as("_prevLon"),
      col("cl").as("_prevCl"))
    val unchanged = col("_prevLat") <=> col("processed_decimalLatitude") &&
      col("_prevLon") <=> col("processed_decimalLongitude") &&
      col("_prevCl").isNotNull
    val existing =
      if (df.columns.contains("cl")) col("cl")
      else lit(null).cast("map<string,string>")
    df.join(prev, Seq("rowKey"), "left")
      .withColumn("cl", when(unchanged, col("_prevCl")).otherwise(existing))
      .drop("_prevLat", "_prevLon", "_prevCl")
  }

  /** Validation-rule application (reference `qa/ValidationRuleRunner`):
    * records matching `predicate` gain a query assertion. */
  def applyValidationRule(df: DataFrame, predicate: Column,
      ruleId: String, comment: String): DataFrame = {
    val qa = struct(lit(ruleId).as("name"), lit(20019).as("code"),
      lit(0).as("qaStatus"), lit(comment).as("comment"))
    df.withColumn("assertions",
      when(predicate, array_union(col("assertions"), array(qa)))
        .otherwise(col("assertions")))
  }

  /** A7: group a record's assertions into failed / unchecked buckets
    * against the full assertion-code dimension (reference
    * `Store.scala:301-317`). Returns one row per (rowKey, bucket, codes). */
  def assertionBuckets(df: DataFrame): DataFrame = {
    val allCodes = AssertionCodes.all.map(_.code)
    val present = df.select(col("rowKey"),
      col("assertions.code").as("present"))
    present.select(col("rowKey"),
      col("present").as("failed"),
      array_except(
        array(allCodes.map(lit): _*), col("present")).as("unchecked"))
  }
}
