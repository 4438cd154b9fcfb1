package graft.model

import graft.SparkTestSession
import graft.processors.Processors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OccurrenceSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val enriched = Processors.enrich(Seq(
    ("dr1|r1", "2012-03-05", "-35.2", "149.1", "specimen"),
    ("dr1|r2", "bad-date", "200.0", "149.1", null: String))
    .toDF("rowKey", "eventDate", "decimalLatitude", "decimalLongitude",
      "basisOfRecord"))

  test("nest/flatten round-trip preserves values") {
    val nested = OccurrenceSchema.nest(enriched)
    assert(nested.columns.toSet.contains("raw") &&
      nested.columns.toSet.contains("processed"))
    val flat = OccurrenceSchema.flatten(nested)
    val before = enriched.select("rowKey", "processed_basisOfRecord",
      "eventDate").orderBy("rowKey").collect().toSeq
    val after = flat.select("rowKey", "processed_basisOfRecord", "eventDate")
      .orderBy("rowKey").collect().toSeq
    assert(before == after)
  }

  test("comparison lists fields where processed differs from raw") {
    val nested = OccurrenceSchema.nest(enriched)
    // basisOfRecord: "specimen" raw vs "PreservedSpecimen" processed
    val rows = OccurrenceSchema.comparison(nested, "dr1|r1").collect()
    assert(rows.exists(r => r.getString(0) == "basisOfRecord" &&
      r.getString(2) == "PreservedSpecimen"))
  }
}
