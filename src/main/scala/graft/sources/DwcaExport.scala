package graft.sources

import org.apache.spark.sql.DataFrame
import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S19: Darwin Core Archive export — occurrence CSV + meta.xml + eml.xml
  * zipped per data resource (reference `export/DwCACreator.scala:24,298-486`
  * in /root/reference/src/main/scala/au/org/ala/biocache/).
  *
  * The record CSV is written distributed (`df.write.csv`); the archive
  * assembly (meta.xml, eml.xml, zip) is inherently a driver-side, per-
  * resource finalisation step — small and sequential by design.
  */
object DwcaExport {

  private val dwcNs = "http://rs.tdwg.org/dwc/terms"

  def metaXml(fields: Seq[String]): String = {
    val fieldRows = fields.zipWithIndex.drop(1).map { case (f, i) =>
      s"""    <field index="$i" term="$dwcNs/$f"/>"""
    }.mkString("\n")
    s"""<archive xmlns="http://rs.tdwg.org/dwc/text/">
       |  <core encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
       |        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1"
       |        rowType="$dwcNs/Occurrence">
       |    <files><location>occurrence.csv</location></files>
       |    <id index="0"/>
       |$fieldRows
       |  </core>
       |</archive>
       |""".stripMargin
  }

  def emlXml(dataResourceUid: String, name: String): String =
    s"""<eml:eml xmlns:eml="eml://ecoinformatics.org/eml-2.1.1">
       |  <dataset>
       |    <title>$name</title>
       |    <alternateIdentifier>$dataResourceUid</alternateIdentifier>
       |  </dataset>
       |</eml:eml>
       |""".stripMargin

  /** Export one resource's records as a DwC-A zip. `df` must include
    * `rowKey` (the core id) first, then DwC-term columns. */
  def `export`(df: DataFrame, dataResourceUid: String, resourceName: String,
      outZip: String): Unit = {
    val tmpDir = java.nio.file.Files.createTempDirectory("dwca").toString
    val fields = df.columns.toSeq
    // complex columns (miscProperties map, assertion arrays) → JSON
    // strings: the archive's occurrence.txt is flat CSV, and a JSON cell
    // keeps the export lossless (same shape Store.writeCsv uses)
    val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType =>
          acc.withColumn(f.name, org.apache.spark.sql.functions.to_json(
            org.apache.spark.sql.functions.col(f.name)))
        case _ => acc
      }
    }
    // quote-doubling (escape = quote), the same convention Store.writeCsv
    // and the loaders use — Spark's default backslash escape would corrupt
    // the JSON cells on an export→loadCsv roundtrip
    flat.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(s"$tmpDir/occurrence")

    val csvPart = new File(s"$tmpDir/occurrence").listFiles()
      .find(_.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException("no csv part written"))

    val zos = new ZipOutputStream(new FileOutputStream(outZip))
    try {
      zos.putNextEntry(new ZipEntry("meta.xml"))
      zos.write(metaXml(fields).getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new ZipEntry("eml.xml"))
      zos.write(emlXml(dataResourceUid, resourceName).getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new ZipEntry("occurrence.csv"))
      java.nio.file.Files.copy(csvPart.toPath, zos)
      zos.closeEntry()
    } finally {
      zos.close()
      // the staging CSV is inside the zip now — remove the temp tree
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new File(tmpDir))
    }
  }
}
