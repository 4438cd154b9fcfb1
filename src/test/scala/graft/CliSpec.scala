package graft

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("load-csv → process → index → facet lifecycle through the CLI") {
    val dir = Files.createTempDirectory("cli").toString
    val csv = s"$dir/occ.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      """occurrenceID,scientificName,eventDate,decimalLatitude,decimalLongitude,basisOfRecord
        |o1,Aus bus,2001-03-04,-35.2,149.1,PreservedSpecimen
        |o2,Cus dus,2002-05-06,-27.5,153.0,HumanObservation
        |o3,Cus dus,2003-07-08,-31.9,115.9,PreservedSpecimen
        |""".stripMargin)
    Cli.run(spark, Seq("load-csv", csv, "dr9", s"$dir/records"))
    Cli.run(spark, Seq("process", s"$dir/records", s"$dir/processed"))
    Cli.run(spark, Seq("index", s"$dir/processed", s"$dir/index"))
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() == 3)
    val facet = Store.facet(idx, "basis_of_record")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(facet == Map("PreservedSpecimen" -> 2L, "HumanObservation" -> 1L))
    // export → connector read round trip through the CLI verbs
    Cli.run(spark, Seq("export-dwca", s"$dir/records", "dr9", "res",
      s"$dir/out.zip"))
    assert(spark.read.format("dwca").load(s"$dir/out.zip").count() == 3)
    // delete-keys removes the named row
    Files.writeString(java.nio.file.Paths.get(s"$dir/doomed.csv"),
      "rowKey\n" + spark.read.parquet(s"$dir/records")
        .select("rowKey").limit(1).collect()(0).getString(0) + "\n")
    Cli.run(spark, Seq("delete-keys", s"$dir/records", s"$dir/doomed.csv",
      s"$dir/kept"))
    assert(spark.read.parquet(s"$dir/kept").count() == 2)
    // unknown verb fails loudly with usage
    val e = intercept[IllegalArgumentException](
      Cli.run(spark, Seq("frobnicate")))
    assert(e.getMessage.contains("usage"))
  }
}
