package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quality-assertion vocabulary.
  *
  * Codes, names, and fatality flags reproduce the reference's assertion code
  * table (`vocab/AssertionCodes.scala:15-171` in
  * /root/reference/src/main/scala/au/org/ala/biocache/): geospatial codes in
  * [0, 10000), taxonomic [10000, 20000), miscellaneous [20000, 30000),
  * temporal [30000, 40000). `fatal` codes flip the record's
  * geospatially/taxonomically-kosher flag.
  */
case class ErrorCode(name: String, code: Int, fatal: Boolean, description: String)

object AssertionCodes {
  // geospatial
  val GEOSPATIAL_ISSUE = ErrorCode("geospatialIssue", 0, true, "Geospatial issue")
  val NEGATED_LATITUDE = ErrorCode("negatedLatitude", 1, false, "Latitude is negated")
  val NEGATED_LONGITUDE = ErrorCode("negatedLongitude", 2, false, "Longitude is negated")
  val INVERTED_COORDINATES = ErrorCode("invertedCoordinates", 3, false, "Coordinates are transposed")
  val ZERO_COORDINATES = ErrorCode("zeroCoordinates", 4, true, "Supplied coordinates are zero")
  val COORDINATES_OUT_OF_RANGE = ErrorCode("coordinatesOutOfRange", 5, true, "Coordinates are out of range")
  val UNKNOWN_COUNTRY_NAME = ErrorCode("unknownCountry", 6, false, "Supplied country not recognised")
  val COORDINATES_CENTRE_OF_STATEPROVINCE = ErrorCode("coordinatesCentreOfStateProvince", 22, true, "Supplied coordinates centre of state")
  val COORDINATES_CENTRE_OF_COUNTRY = ErrorCode("coordinatesCentreOfCountry", 28, true, "Supplied coordinates centre of country")
  val DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF = ErrorCode("decimalLatLongCalculatedFromGridReference", 55, false, "Decimal latitude and longitude were calculated using grid reference")
  val HABITAT_MISMATCH = ErrorCode("habitatMismatch", 19, true, "Habitat incorrect for species")
  val DETECTED_OUTLIER = ErrorCode("detectedOutlier", 20, true, "Suspected outlier")
  val COUNTRY_INFERRED_FROM_COORDINATES = ErrorCode("countryInferredByCoordinates", 21, false, "Country inferred from coordinates")
  val UNCERTAINTY_RANGE_MISMATCH = ErrorCode("uncertaintyRangeMismatch", 24, false, "Coordinate accuracy not valid")
  val UNCERTAINTY_IN_PRECISION = ErrorCode("uncertaintyInPrecision", 25, false, "Coordinate precision and accuracy transposed")
  val SPECIES_OUTSIDE_EXPERT_RANGE = ErrorCode("speciesOutsideExpertRange", 26, true, "Geographic coordinates are outside the range as defined by expert/s for the taxa")
  val UNCERTAINTY_NOT_SPECIFIED = ErrorCode("uncertaintyNotSpecified", 27, false, "Coordinate uncertainty was not supplied")
  val MISSING_GEODETICDATUM = ErrorCode("missingGeodeticDatum", 30, false, "geodeticDatum not supplied for coordinates")
  val LOCATION_NOT_SUPPLIED = ErrorCode("locationNotSupplied", 43, false, "No location information has been provided with the record")
  val DECIMAL_COORDINATES_NOT_SUPPLIED = ErrorCode("decimalCoordinatesNotSupplied", 44, false, "No decimal longitude and latitude provided")
  val DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM = ErrorCode("decimalLatLongCalculatedFromVerbatim", 47, false, "Decimal latitude and longitude were calculated using verbatimLatitude, verbatimLongitude and verbatimSRS")
  val ZERO_LATITUDE_COORDINATES = ErrorCode("zeroLatitude", 53, true, "Supplied latitude is zero")
  val ZERO_LONGITUDE_COORDINATES = ErrorCode("zeroLongitude", 54, true, "Supplied longitude are zero")
  // taxonomic
  val TAXONOMIC_ISSUE = ErrorCode("taxonomicIssue", 10000, false, "Taxonomic issue")
  val INVALID_SCIENTIFIC_NAME = ErrorCode("invalidScientificName", 10001, false, "Invalid scientific name")
  val UNKNOWN_KINGDOM = ErrorCode("unknownKingdom", 10002, false, "Kingdom not recognised")
  val NAME_NOT_RECOGNISED = ErrorCode("nameNotRecognised", 10004, false, "Name not recognised")
  val NAME_NOT_SUPPLIED = ErrorCode("nameNotSupplied", 10015, false, "No scientific name or vernacular name was supplied")
  // miscellaneous
  val MISSING_BASIS_OF_RECORD = ErrorCode("missingBasisOfRecord", 20001, true, "Basis of record not supplied")
  val BADLY_FORMED_BASIS_OF_RECORD = ErrorCode("badlyFormedBasisOfRecord", 20002, true, "Basis of record badly formed")
  val UNRECOGNISED_TYPESTATUS = ErrorCode("unrecognisedTypeStatus", 20004, false, "Type status not recognised")
  val UNRECOGNISED_COLLECTION_CODE = ErrorCode("unrecognisedCollectionCode", 20005, false, "Collection code not recognised")
  val UNRECOGNISED_INSTITUTION_CODE = ErrorCode("unrecognisedInstitutionCode", 20006, false, "Institution code not recognised")
  val DATA_ARE_GENERALISED = ErrorCode("dataAreGeneralised", 20009, false, "The data has been supplied generalised")
  val USER_ASSERTION_OTHER = ErrorCode("userAssertionOther", 20019, false, "Other error")
  val INFERRED_DUPLICATE_RECORD = ErrorCode("inferredDuplicateRecord", 20014, false, "The occurrence appears to be a duplicate")
  val UNRECOGNISED_OCCURRENCE_STATUS = ErrorCode("unrecognisedOccurrenceStatus", 20017, false, "Occurrence status not recognised")
  val ASSUMED_PRESENT_OCCURRENCE_STATUS = ErrorCode("assumedPresentOccurrenceStatus", 20018, false, "Occurrence status assumed to be present")
  // temporal
  val TEMPORAL_ISSUE = ErrorCode("temporalIssue", 30000, false, "Temporal issue")
  val ID_PRE_OCCURRENCE = ErrorCode("idPreOccurrence", 30001, false, "Identification date before occurrence date")
  val FIRST_OF_MONTH = ErrorCode("firstOfMonth", 30003, false, "First of the month")
  val FIRST_OF_YEAR = ErrorCode("firstOfYear", 30004, false, "First of the year")
  val FIRST_OF_CENTURY = ErrorCode("firstOfCentury", 30005, false, "First of the century")
  val INVALID_COLLECTION_DATE = ErrorCode("invalidCollectionDate", 30007, false, "Invalid collection date")
  val MISSING_COLLECTION_DATE = ErrorCode("missingCollectionDate", 30008, false, "Missing collection date")
  val DAY_MONTH_TRANSPOSED = ErrorCode("dayMonthTransposed", 30009, false, "Day and month transposed")
  val INCOMPLETE_COLLECTION_DATE = ErrorCode("incompleteCollectionDate", 30010, false, "The date supplied was incomplete, missing the day and/or month component")

  val all: Seq[ErrorCode] = Seq(
    GEOSPATIAL_ISSUE, NEGATED_LATITUDE, NEGATED_LONGITUDE,
    INVERTED_COORDINATES, ZERO_COORDINATES, COORDINATES_OUT_OF_RANGE,
    UNKNOWN_COUNTRY_NAME, COORDINATES_CENTRE_OF_STATEPROVINCE,
    COORDINATES_CENTRE_OF_COUNTRY,
    DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF,
    UNRECOGNISED_COLLECTION_CODE, UNRECOGNISED_INSTITUTION_CODE,
    DATA_ARE_GENERALISED, USER_ASSERTION_OTHER,
    HABITAT_MISMATCH, DETECTED_OUTLIER,
    COUNTRY_INFERRED_FROM_COORDINATES, UNCERTAINTY_RANGE_MISMATCH,
    UNCERTAINTY_IN_PRECISION, SPECIES_OUTSIDE_EXPERT_RANGE,
    UNCERTAINTY_NOT_SPECIFIED, MISSING_GEODETICDATUM, LOCATION_NOT_SUPPLIED,
    DECIMAL_COORDINATES_NOT_SUPPLIED,
    DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM, ZERO_LATITUDE_COORDINATES,
    ZERO_LONGITUDE_COORDINATES, TAXONOMIC_ISSUE, INVALID_SCIENTIFIC_NAME,
    UNKNOWN_KINGDOM, NAME_NOT_RECOGNISED, NAME_NOT_SUPPLIED,
    MISSING_BASIS_OF_RECORD, BADLY_FORMED_BASIS_OF_RECORD,
    UNRECOGNISED_TYPESTATUS, INFERRED_DUPLICATE_RECORD,
    UNRECOGNISED_OCCURRENCE_STATUS, ASSUMED_PRESENT_OCCURRENCE_STATUS,
    TEMPORAL_ISSUE, ID_PRE_OCCURRENCE, FIRST_OF_MONTH, FIRST_OF_YEAR,
    FIRST_OF_CENTURY, INVALID_COLLECTION_DATE, MISSING_COLLECTION_DATE,
    DAY_MONTH_TRANSPOSED, INCOMPLETE_COLLECTION_DATE)

  def byCode(code: Int): Option[ErrorCode] = all.find(_.code == code)

  def isGeospatial(code: Int): Boolean = code >= 0 && code < 10000
  def isTaxonomic(code: Int): Boolean = code >= 10000 && code < 20000
  def isTemporal(code: Int): Boolean = code >= 30000 && code < 40000

  private val fatalGeoCodes = all.filter(c => c.fatal && isGeospatial(c.code)).map(_.code)
  private val fatalTaxonCodes = all.filter(c => c.fatal && isTaxonomic(c.code)).map(_.code)

  /** Column helpers: build one assertion struct (schema: name, code,
    * qaStatus, comment); reference model `model/QualityAssertion.scala:20-57`.
    * qaStatus 0 = failed test, 1 = passed. */
  def assertion(ec: ErrorCode, comment: String = ""): Column =
    struct(lit(ec.name).as("name"), lit(ec.code).as("code"),
      lit(0).as("qaStatus"), lit(comment).as("comment"))

  /** Conditional assertion: struct when `cond`, else null (compacted later). */
  def assertIf(cond: Column, ec: ErrorCode, comment: String = ""): Column =
    when(cond, assertion(ec, comment)).otherwise(lit(null))

  /** Compact form: pipeline stages carry assertion CODES (array<int>) and
    * the struct array is materialised once at the end — per-stage struct
    * construction is interpreted (no codegen for array-of-struct building)
    * and dominated enrichment cost when done eight times per row. */
  def assertCodeIf(cond: Column, ec: ErrorCode): Column =
    when(cond, lit(ec.code)).otherwise(lit(null))

  /** The public assertion record shape (reference
    * `model/QualityAssertion.scala:20-53`). */
  case class QualityAssertion(name: String, code: Int, qaStatus: Int,
      comment: String)

  private val nameByCode: Map[Int, String] = all.map(ec => ec.code -> ec.name).toMap

  /** array<int> codes → the public array<struct> assertion column, built in
    * one kernel pass (a per-element CASE-chain expression is interpreted and
    * costs ~65µs/row at 44 codes). */
  val structsFromCodes: Column => Column = {
    val u = udf((codes: Seq[Int]) => codes.map(c =>
      QualityAssertion(nameByCode.getOrElse(c, "unknown"), c, 0, "")))
    (codes: Column) => u(codes)
  }

  /** geospatiallyKosher = no fatal geospatial assertion present
    * (reference `load/FullRecordMapper.scala` kosher computation). */
  def geospatiallyKosher(assertions: Column): Column =
    !exists(assertions, a => a.getField("code").isin(fatalGeoCodes.map(Integer.valueOf): _*))

  def taxonomicallyKosher(assertions: Column): Column =
    !exists(assertions, a => a.getField("code").isin(fatalTaxonCodes.map(Integer.valueOf): _*))

  /** Kosher flags over the compact code array. */
  def geospatiallyKosherCodes(codes: Column): Column =
    !arrays_overlap(codes, array(fatalGeoCodes.map(lit): _*))

  def taxonomicallyKosherCodes(codes: Column): Column =
    !arrays_overlap(codes, array(fatalTaxonCodes.map(lit): _*))
}
