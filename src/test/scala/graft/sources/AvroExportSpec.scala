package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("round-trips mixed primitive types with nulls") {
    val df = Seq(
      ("r1", Some(42), Some(1234567890123L), Some(3.5), Some(true)),
      ("r2", None, None, None, None),
      ("r3", Some(-7), Some(-1L), Some(-0.25), Some(false)),
    ).toDF("id", "i", "l", "d", "b")
    val dir = Files.createTempDirectory("avro1").toString + "/out"
    AvroExport.write(df, dir)
    val back = AvroExport.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "i", "l", "d", "b"))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("round-trips arrays, binary, date, and timestamp") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("blob", BinaryType),
      StructField("day", DateType),
      StructField("at", TimestampType)))
    val rows = Seq(
      Row("a", Seq("x", "y"), Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2001-02-03"),
        java.sql.Timestamp.valueOf("2001-02-03 04:05:06.789")),
      Row("b", Seq.empty[String], Array.empty[Byte], null, null),
      Row("c", null, null, java.sql.Date.valueOf("1969-12-31"), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro2").toString + "/out"
    AvroExport.write(df, dir)
    val back = AvroExport.read(spark, dir).orderBy("id").collect()
    // dates come back as ISO strings, timestamps as epoch micros (documented)
    assert(back(0).getSeq[String](back(0).fieldIndex("tags")) == Seq("x", "y"))
    assert(back(0).getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    assert(back(0).getAs[String]("day") == "2001-02-03")
    assert(back(0).getAs[Long]("at") ==
      java.sql.Timestamp.valueOf("2001-02-03 04:05:06.789").getTime * 1000 + 789000 % 1000)
    assert(back(1).getSeq[String](back(1).fieldIndex("tags")).isEmpty)
    assert(back(2).isNullAt(back(2).fieldIndex("tags")))
    assert(back(2).getAs[String]("day") == "1969-12-31")
  }

  test("round-trips nested structs and the multivalue-field shape") {
    // the reference's export rows: single-value strings + array multivalues
    val df = spark.range(0, 100, 1, 4).select(
      concat(lit("row"), col("id")).as("rowKey"),
      struct(col("id").as("lft"), (col("id") + 1).as("rgt")).as("taxon"),
      array(lit("ASSERT_A"), concat(lit("code"), col("id") % 3))
        .as("assertions"))
    val dir = Files.createTempDirectory("avro3").toString + "/out"
    AvroExport.write(df, dir)
    val back = AvroExport.read(spark, dir)
    assert(back.count() == 100)
    val r = back.filter(col("rowKey") === "row7").collect()(0)
    assert(r.getAs[Row]("taxon").getAs[Long]("lft") == 7L)
    assert(r.getSeq[String](r.fieldIndex("assertions")) == Seq("ASSERT_A", "code1"))
    // aggregate equivalence through the container round trip
    val a = back.select(explode(col("assertions")).as("a"))
      .groupBy("a").count().collect()
      .map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
    assert(a("ASSERT_A") == 100 && a("code0") + a("code1") + a("code2") == 100)
  }

  test("column names are sanitised to valid Avro identifiers") {
    val df = Seq((1, "x")).toDF("2weird col!", "ok_name")
    val dir = Files.createTempDirectory("avro4").toString + "/out"
    AvroExport.write(df, dir)
    val back = AvroExport.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("_2weird_col_", "ok_name"))
    assert(back.collect()(0).getInt(0) == 1)
  }
}
