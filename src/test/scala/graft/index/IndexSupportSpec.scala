package graft.index

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexSupportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("index schema is fixed and broad even with minimal input") {
    val raw = Seq(("r1", "Macropus rufus"))
      .toDF("occurrenceID", "scientificName")
      .withColumn("rowKey", col("occurrenceID"))
    val index = IndexSupport.project(graft.processors.Processors.enrich(raw))
    val cols = index.columns
    assert(cols.length >= 150, s"only ${cols.length} index columns")
    assert(cols.distinct.length == cols.length,
      "duplicate index column names: " +
        cols.groupBy(identity).filter(_._2.length > 1).keys.mkString(", "))
    // reference-scheme spot checks
    for (c <- Seq("id", "occurrence_id", "taxon_name", "raw_taxon_name",
      "common_name", "names_and_lsid", "occurrence_year",
      "occurrence_decade_i", "raw_state", "state", "raw_datum", "datum",
      "assertions", "assertions_unchecked", "sensitive",
      "geospatial_kosher", "taxonomic_kosher", "species_list_uid",
      "country_conservation", "point00001"))
      assert(cols.contains(c), s"missing index column $c")
    // absent inputs project as nulls, not errors
    assert(index.count() == 1)
    assert(index.select("loan_date").head().isNullAt(0))
  }

  test("dynamic el/cl layer columns from the sample map, typed by prefix") {
    val raw = Seq(("r1", "-33.8", "151.2"))
      .toDF("occurrenceID", "decimalLatitude", "decimalLongitude")
      .withColumn("rowKey", col("occurrenceID"))
    val layers = Seq(
      ("cl927", "New South Wales",
        "POLYGON((140 -38, 154 -38, 154 -28, 140 -28, 140 -38))"),
      ("el874", "21.5",
        "POLYGON((140 -38, 154 -38, 154 -28, 140 -28, 140 -38))"))
      .toDF("layerId", "value", "wkt")
    val enriched = graft.processors.Processors.enrichAll(raw,
      graft.processors.Processors.Dimensions(layers = Some(layers)))
    val index = IndexSupport.project(enriched, layerIds = Seq("cl927", "el874"))
    val row = index.select("cl927", "el874").head()
    assert(row.getString(0) == "New South Wales")
    assert(row.getDouble(1) == 21.5)
    assert(index.schema("el874").dataType.typeName == "double")
  }

  test("occurrence decade and year derived from processed year") {
    val raw = Seq(("r1", "1987-06-05")).toDF("occurrenceID", "eventDate")
      .withColumn("rowKey", col("occurrenceID"))
    val index = IndexSupport.project(graft.processors.Processors.enrich(raw))
    val row = index.select("occurrence_year", "occurrence_decade_i").head()
    assert(row.getInt(0) == 1987 && row.getInt(1) == 1980)
  }
  test("shouldIndex honours the modified-since cutoff (reference IndexTest)") {
    val df = Seq(
      ("a", "2011-07-07T10:00:00Z", "2011-07-17T10:00:00Z"),
      ("b", "2011-07-07T10:00:00Z", null))
      .toDF("rowKey", "lastModifiedTime", "lastModifiedTime_p")
    def keys(cutoff: Option[String]) =
      IndexSupport.shouldIndex(df, cutoff).select("rowKey")
        .collect().map(_.getString(0)).toSet
    assert(keys(None) == Set("a", "b"))
    assert(keys(Some("2011-07-10T10:00:00Z")) == Set("a"))
    assert(keys(Some("2011-07-20T10:00:00Z")) == Set.empty[String])
    assert(keys(Some("2011-07-01T10:00:00Z")) == Set("a", "b"))
  }

  test("raw scientific name construction (reference IndexTest:39)") {
    def nameOf(cols: Map[String, String]): String = {
      val df0 = Seq(("k1")).toDF("rowKey")
      val df = cols.foldLeft(df0) { case (acc, (k, v)) => acc.withColumn(k, lit(v)) }
      val r = df.select(IndexSupport.rawScientificName(df).as("n")).head()
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(nameOf(Map("scientificName" -> "Aus bus")) == "Aus bus")
    assert(nameOf(Map("genus" -> "Aus")) == "Aus")
    assert(nameOf(Map("genus" -> "Aus", "species" -> "bus")) == "Aus bus")
    assert(nameOf(Map("genus" -> "Aus", "species" -> "bus",
      "subspecies" -> "cus")) == "Aus bus cus")
    assert(nameOf(Map("scientificName" -> "Aus", "genus" -> "Dus")) == "Aus")
    assert(nameOf(Map("genus" -> "Aus", "specificEpithet" -> "bus")) == "Aus bus")
    assert(nameOf(Map("genus" -> "Aus", "specificEpithet" -> "bus",
      "infraspecificEpithet" -> "cus")) == "Aus bus cus")
    assert(nameOf(Map("family" -> "Family")) == "Family")
  }
}
