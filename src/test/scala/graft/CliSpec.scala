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

  test("avro export and the duplicates verbs through the CLI") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cli2").toString
    // avro round trip of a processed-record-ish table
    Seq(("r1", "Aus bus", Seq("x")), ("r2", "Cus dus", Seq.empty[String]))
      .toDF("rowKey", "scientificName", "tags")
      .write.parquet(s"$dir/recs")
    Cli.run(spark, Seq("export-avro", s"$dir/recs", s"$dir/avro"))
    assert(sources.AvroExport.read(spark, s"$dir/avro").count() == 2)

    // duplicates: two co-located records cluster; then one arrives later
    // and the incremental verb splices it in
    def cand(rows: Seq[(String, String)]) = rows.map { case (rk, taxon) =>
      (rk, taxon, "2000", "01", "02", "-35.2", "149.1",
        null: String, null: String, null: String, "dr1")
    }.toDF("rowKey", "taxonGuid", "year", "month", "day", "lat", "lon",
      "collector", "recordNumber", "catalogueNumber", "druid")
    cand(Seq("a" -> "t1", "b" -> "t1", "c" -> "t2"))
      .write.parquet(s"$dir/cand0")
    Cli.run(spark, Seq("duplicates", s"$dir/cand0", s"$dir/dup0"))
    assert(spark.read.parquet(s"$dir/dup0").count() == 2) // a+b cluster
    cand(Seq("a" -> "t1", "b" -> "t1", "c" -> "t2", "d" -> "t2"))
      .write.parquet(s"$dir/cand1")
    Files.writeString(java.nio.file.Paths.get(s"$dir/changed.csv"),
      "rowKey\nd\n")
    Cli.run(spark, Seq("duplicates-incr", s"$dir/cand1",
      s"$dir/changed.csv", s"$dir/dup0", s"$dir/dup1"))
    val dup1 = spark.read.parquet(s"$dir/dup1")
    assert(dup1.count() == 4) // t1 kept from prev, t2 freshly clustered
    assert(dup1.filter($"taxonGuid" === "t2").count() == 2)
  }

  test("compact verb executes the maintenance swap through the CLI") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_compact")
      .resolve("tbl").toString
    (1L to 6L).foreach { i =>
      Seq((i, s"row$i")).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    def nFiles() = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(nFiles() >= 6)
    Cli.run(spark, Seq("compact", dir, (1L << 40).toString))
    assert(nFiles() == 1)
    assert(spark.read.parquet(dir).count() == 6)
  }
}
