package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DwcaConnectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val metaXml =
    """<archive xmlns="http://rs.tdwg.org/dwc/text/">
      | <core encoding="UTF-8" fieldsTerminatedBy="\t" linesTerminatedBy="\n"
      |   ignoreHeaderLines="1" rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
      |  <files><location>occurrence.txt</location></files>
      |  <id index="0"/>
      |  <field index="1" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
      |  <field index="2" term="http://rs.tdwg.org/dwc/terms/decimalLatitude"/>
      |  <field index="3" term="http://rs.tdwg.org/dwc/terms/class"/>
      | </core>
      |</archive>""".stripMargin

  private def writeArchive(rows: Seq[String]): String = {
    val f = Files.createTempFile("dwca", ".zip").toFile
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(f)))
    zos.putNextEntry(new ZipEntry("meta.xml"))
    zos.write(metaXml.getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("occurrence.txt"))
    val body = ("id\tscientificName\tdecimalLatitude\tclass" +: rows)
      .mkString("", "\n", "\n")
    zos.write(body.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    f.getAbsolutePath
  }

  test("schema comes from meta.xml; rows parse; keyword column renamed") {
    val path = writeArchive(Seq(
      "r1\tAus bus\t-35.2\tAves",
      "r2\tCus dus\t\tMammalia",
      "r3\tEus fus\t-27.1\t"))
    val df = spark.read.format("dwca").load(path)
    assert(df.columns.toSeq ==
      Seq("id", "scientificName", "decimalLatitude", "classs"))
    val got = df.orderBy("id")
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("r1", "Aus bus", "-35.2", "Aves"),
      ("r2", "Cus dus", null, "Mammalia"),
      ("r3", "Eus fus", "-27.1", null)))
  }

  test("column pruning reaches the reader (scan lists only required columns)") {
    val path = writeArchive(Seq("r1\tAus bus\t-35.2\tAves"))
    val pruned = spark.read.format("dwca").load(path)
      .select("scientificName")
    assert(pruned.as[String].collect().toSeq == Seq("Aus bus"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadColumns: scientificName"),
      s"pruned columns not pushed to the dwca scan:\n$plan")
    assert(!plan.contains("ReadColumns: id,"),
      "scan still reads unrequired columns")
  }

  test("quoted CSV archives parse: enclosed separators and escaped quotes") {
    val quotedMeta = metaXml
      .replace("fieldsTerminatedBy=\"\\t\"",
        "fieldsTerminatedBy=\",\" fieldsEnclosedBy=\"&quot;\"")
    val f = Files.createTempFile("dwcaq", ".zip").toFile
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(f)))
    zos.putNextEntry(new ZipEntry("meta.xml"))
    zos.write(quotedMeta.getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("occurrence.txt"))
    // r2 is the case that makes backslash-escape rules ambiguous: a JSON
    // cell's own \" sequence quote-doubles to \"" — RFC 4180 reads the
    // backslash literally and the doubled quote as one quote
    zos.write(("\"id\",\"scientificName\",\"decimalLatitude\",\"class\"\n" +
      "\"r1\",\"Aus, comma bus\",\"-35.2\",\"Aves\"\n" +
      "\"r2\",\"{\"\"k\"\":\"\"a\\\"\"b\"\"}\",\"1.0\",\"Aves\"\n" +
      "\"r3\",\"Eus \"\"doubled\"\" fus\",\"2.0\",\"Aves\"\n")
      .getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val got = spark.read.format("dwca").load(f.getAbsolutePath)
      .orderBy("id").select("scientificName").as[String].collect().toSeq
    assert(got == Seq("Aus, comma bus", "{\"k\":\"a\\\"b\"}",
      "Eus \"doubled\" fus"))
  }

  test("export sink → connector read round-trips rows exactly") {
    val src = Seq(("k1", "Aus bus", "loc,with comma"),
      ("k2", "Cus dus", "plain")).toDF("rowKey", "scientificName", "locality")
    val zip = Files.createTempDirectory("rt").resolve("dr.zip").toString
    DwcaExport.`export`(src, "drX", "round trip", zip)
    val back = spark.read.format("dwca").load(zip)
    assert(back.columns.toSeq == Seq("id", "scientificName", "locality"))
    val got = back.orderBy("id")
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(("k1", "Aus bus", "loc,with comma"),
      ("k2", "Cus dus", "plain")))
  }

  test("export with a JSON map cell round-trips through the connector") {
    // the miscProperties shape: the export's quote-doubling must agree
    // with the connector's RFC 4180 parse, including a quote INSIDE a
    // JSON string value (the \" case that breaks backslash-aware parsers)
    val src = Seq(
      ("k1", "Aus bus", Map("note" -> "said \"hi\"", "src" -> "legacy")),
      ("k2", "Cus dus", Map.empty[String, String]))
      .toDF("rowKey", "scientificName", "miscProperties")
    val zip = Files.createTempDirectory("rtj").resolve("dr.zip").toString
    DwcaExport.`export`(src, "drJ", "json cells", zip)
    val back = spark.read.format("dwca").load(zip)
      .withColumn("m", from_json(col("miscProperties"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
    val m = back.filter(col("id") === "k1")
      .select("m").as[Map[String, String]].head()
    assert(m == Map("note" -> "said \"hi\"", "src" -> "legacy"))
  }

  test("string predicates push into the reader and are not re-filtered away") {
    val path = writeArchive(Seq(
      "r1\tAus bus\t-35.2\tAves",
      "r2\tCus dus\t\tMammalia",
      "r3\tAus bus\t-27.1\tAves"))
    val df = spark.read.format("dwca").load(path)
      .filter(col("scientificName") === "Aus bus" &&
        col("decimalLatitude").isNotNull)
      .select("id")
    assert(df.as[String].collect().sorted.toSeq == Seq("r1", "r3"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches(
      "(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(scientificName,Aus bus\\)[^\\]]*\\].*"),
      s"equality not pushed to the dwca scan:\n$plan")
    assert(plan.matches(
      "(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(decimalLatitude\\)[^\\]]*\\].*"),
      s"null test not pushed to the dwca scan:\n$plan")
  }

  test("varargs load(p1, p2) resolves Spark's JSON-encoded paths option") {
    val p1 = writeArchive(Seq("a1\tAus bus\t1.0\tAves"))
    val p2 = writeArchive(Seq("b1\tCus dus\t2.0\tAves"))
    val df = spark.read.format("dwca").load(p1, p2)
    assert(df.count() == 2 && df.rdd.getNumPartitions == 2)
  }

  test("load(dir) expands to every zip archive in the directory") {
    val dir = Files.createTempDirectory("dwcadir")
    def copyIn(src: String, name: String): Unit =
      Files.copy(new File(src).toPath, dir.resolve(name))
    copyIn(writeArchive(Seq("a1\tAus bus\t1.0\tAves")), "one.zip")
    copyIn(writeArchive(Seq("b1\tCus dus\t2.0\tAves")), "two.zip")
    val df = spark.read.format("dwca").load(dir.toString)
    assert(df.count() == 2 && df.rdd.getNumPartitions == 2)
  }

  test("reported statistics let a small archive broadcast in a join") {
    val path = writeArchive(Seq(
      "r1\tAus bus\t1.0\tAves", "r2\tCus dus\t2.0\tMammalia"))
    val dim = spark.read.format("dwca").load(path)
      .select(col("scientificName"), col("classs"))
    // drop the threshold so the 10k-row fact side is NOT broadcastable:
    // the only way a BroadcastHashJoin can appear is the dwca scan's own
    // reported statistics (without estimateStatistics it reports
    // defaultSizeInBytes ≈ Long.Max and this degrades to sort-merge)
    val fact = (1 to 10000).map(i =>
      (s"row-$i-${"x" * 30}", if (i % 2 == 0) "Aus bus" else "Cus dus"))
      .toDF("payload", "scientificName")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val joined = fact.join(dim, "scientificName")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"kilobyte-sized dwca dim should be the broadcast side:\n$plan")
      assert(!plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multiple archives scan as one table with per-archive partitions") {
    val p1 = writeArchive(Seq("a1\tAus bus\t1.0\tAves"))
    val p2 = writeArchive(Seq("b1\tCus dus\t2.0\tAves",
      "b2\tEus fus\t3.0\tAves"))
    val df = spark.read.format("dwca")
      .option("paths", s"$p1,$p2").load()
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 2)
    // feeds the normal curation surface: a facet over the union
    val facet = df.groupBy("scientificName").count()
      .as[(String, Long)].collect().toMap
    assert(facet == Map("Aus bus" -> 1L, "Cus dus" -> 1L, "Eus fus" -> 1L))
  }
}
