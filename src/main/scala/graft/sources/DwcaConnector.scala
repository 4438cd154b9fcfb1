package graft.sources

import java.util.zip.ZipFile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull, IsNull, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Darwin Core Archive as a REAL DataSource V2 connector:
  * `spark.read.format("dwca").load("/path/to/archive.zip")`.
  *
  * The reference's loader opens archives imperatively and pages rows into
  * storage (`load/DwCALoader.scala` in /root/reference); here the archive
  * IS a table: schema inferred from `meta.xml` (core row type, field
  * index→term map, delimiter, header count), Catalyst column pruning
  * pushed INTO the reader (a projected scan parses only the required
  * columns out of each line — `SupportsPushDownRequiredColumns`), and
  * partition planning at the archive granularity.
  *
  * Scale model: a zip's deflated entries have no sync points, so a single
  * archive is not byte-range splittable — parallelism is per archive (load
  * many at once: comma-separated paths / a directory of archives), which
  * matches the unit of work of real aggregator pipelines (one archive per
  * data resource). After ingest the data lives in parquet and all further
  * scans split normally; this connector is the ingest edge only.
  */
class DwcaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dwca"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DwcaMeta.read(DwcaDataSource.paths(options).head).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DwcaTable(schema,
      DwcaDataSource.paths(new CaseInsensitiveStringMap(properties)))
}

object DwcaDataSource {
  /** `load(p1, p2, …)` arrives as a JSON-encoded array in the `paths`
    * option (that is how DataFrameReader serialises varargs); a bespoke
    * `.option("paths", "a,b")` is comma-separated; `load(dir)` on a
    * directory expands to every `*.zip` inside it. */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { raw =>
      val t = raw.trim
      if (t.startsWith("[")) parseJsonStringArray(t)
      else t.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val all = (single ++ multi).distinct.flatMap(expandDir)
    require(all.nonEmpty, "dwca source requires a path")
    all
  }

  private def expandDir(p: String): Seq[String] = {
    val f = new java.io.File(p)
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten
        .filter(_.getName.toLowerCase.endsWith(".zip"))
        .map(_.getAbsolutePath).sorted.toSeq
    else Seq(p)
  }

  /** Minimal parser for the JSON string array Spark hands over —
    * ["a","b"] with \" and \\ escapes inside elements. */
  private def parseJsonStringArray(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') { out += sb.toString; sb.setLength(0); inStr = false }
        else sb.append(c)
      } else if (c == '"') inStr = true
      i += 1
    }
    out.toSeq
  }
}

/** meta.xml contract: core entry name, delimiter, optional field quote,
  * header lines, and the ordered column list (index 0 carries the record
  * id). */
private[sources] final case class DwcaMeta(coreEntry: String, sep: Char,
    quote: Option[Char], headerLines: Int, columns: IndexedSeq[String]) {
  def schema: StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))
}

private[sources] object DwcaMeta {
  /** Short Darwin Core term name from a term URI. */
  private def shortTerm(uri: String): String = {
    val cut = math.max(uri.lastIndexOf('/'), uri.lastIndexOf('#'))
    val s = if (cut >= 0) uri.substring(cut + 1) else uri
    if (s == "class") "classs" else s // Scala/SQL keyword, as in DwcSource
  }

  def read(archivePath: String): DwcaMeta = {
    val zip = new ZipFile(archivePath)
    try readFrom(zip, archivePath) finally zip.close()
  }

  /** Parse meta.xml from an already-open archive (the partition reader
    * reuses its data handle instead of opening the zip twice). */
  def readFrom(zip: ZipFile, archivePath: String): DwcaMeta = {
    {
      val metaEntry = Option(zip.getEntry("meta.xml")).getOrElse(
        throw new IllegalArgumentException(s"no meta.xml in $archivePath"))
      val xml = scala.xml.XML.load(zip.getInputStream(metaEntry))
      val core = (xml \ "core").headOption.getOrElse(
        throw new IllegalArgumentException("meta.xml has no <core>"))
      val coreEntry = (core \ "files" \ "location").text.trim
      val sepAttr = (core \@ "fieldsTerminatedBy")
      val sep = sepAttr match {
        case "" | "\\t" => '\t'
        case s => s.head
      }
      val headerLines = (core \@ "ignoreHeaderLines") match {
        case "" => 0
        case s => s.trim.toInt
      }
      // XML attribute entities (&quot;) arrive decoded from the parser
      val quote = (core \@ "fieldsEnclosedBy") match {
        case "" => None
        case s => Some(s.head)
      }
      val idIndex = (core \ "id").headOption
        .map(n => (n \@ "index").trim.toInt).getOrElse(0)
      val fields = (core \ "field").map { f =>
        ((f \@ "index").trim.toInt, shortTerm((f \@ "term").trim))
      }
      val maxIdx = (idIndex +: fields.map(_._1)).max
      val names = Array.tabulate(maxIdx + 1)(i => s"_c$i")
      names(idIndex) = "id"
      fields.foreach { case (i, t) => if (i != idIndex) names(i) = t }
      DwcaMeta(coreEntry, sep, quote, headerLines, names.toIndexedSeq)
    }
  }
}

private final class DwcaTable(fullSchema: StructType, paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"dwca(${paths.mkString(",")})"
  override def schema(): StructType = fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DwcaScanBuilder(fullSchema, paths)
}

private final class DwcaScanBuilder(fullSchema: StructType, paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Catalyst hands the pruned schema here; the reader parses only these. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the string predicates the line parser can evaluate before a
    * row is materialised; everything else stays a Spark-side residual.
    * Accepted filters are evaluated against the split line buffer, so a
    * selective filter skips both row materialisation and downstream
    * processing — the DSv2 analogue of parquet row-group filtering for a
    * format with no statistics. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case _: EqualTo | _: IsNotNull | _: IsNull | _: StringStartsWith => true
      case _ => false
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DwcaScan(required, paths, pushed)
}

private final class DwcaScan(required: StructType, paths: Seq[String],
    pushed: Array[Filter]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DwcaScan ReadColumns: ${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** Real data size instead of the engine's pessimistic default
    * (spark.sql.defaultSizeInBytes ≈ Long.Max): a small archive joined
    * against a big fact table can now be planned as the BROADCAST side.
    * The size reported is the UNCOMPRESSED core-entry length from the zip
    * central directory — compressed size would understate materialised row
    * width by the compression ratio (10-20× for repetitive CSV text) and
    * bias the planner TOWARD broadcasting oversized data. Falls back to
    * 8× the compressed archive when an entry does not declare its length.
    * One driver-side central-directory read per archive, archive counts
    * are config-scale. */
  private lazy val coreBytes: Long = paths.map { p =>
    try {
      val zip = new ZipFile(p)
      try {
        val m = DwcaMeta.readFrom(zip, p)
        val len = Option(zip.getEntry(m.coreEntry)).map(_.getSize).getOrElse(-1L)
        if (len >= 0) len else new java.io.File(p).length() * 8
      } finally zip.close()
    } catch { case _: Exception => new java.io.File(p).length() * 8 }
  }.sum

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes: java.util.OptionalLong =
      java.util.OptionalLong.of(coreBytes)
    override def numRows: java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  /** One partition per archive — the zip format's split unit (see class
    * doc); a directory of N archives scans with N-way parallelism. */
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => DwcaPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DwcaReaderFactory(required.fieldNames, pushed)
}

private final case class DwcaPartition(path: String) extends InputPartition

private final class DwcaReaderFactory(requiredCols: Array[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DwcaPartitionReader(p.asInstanceOf[DwcaPartition].path, requiredCols,
      pushed)
}

/** Streams the core entry line by line, materialising ONLY the required
  * columns (projection pushed below the parse: untouched columns are never
  * copied out of the line buffer). */
private final class DwcaPartitionReader(path: String,
    requiredCols: Array[String], pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  // ONE zip handle for meta + data; if any of the setup below throws
  // (missing meta.xml / core entry), close it before propagating — Spark
  // never sees a half-built reader, so close() would never run
  private val zip = new ZipFile(path)
  private val (meta, lines) =
    try {
      val m = DwcaMeta.readFrom(zip, path)
      val entry = Option(zip.getEntry(m.coreEntry)).getOrElse(
        throw new IllegalArgumentException(
          s"core entry ${m.coreEntry} missing in $path"))
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(
        zip.getInputStream(entry), "UTF-8"))
      (1 to m.headerLines).foreach(_ => br.readLine())
      (m, br)
    } catch { case e: Throwable => zip.close(); throw e }
  // required column name → source field index (missing → constant null)
  private val srcIdx: Array[Int] =
    requiredCols.map(c => meta.columns.indexOf(c))
  // pushed filters compiled to (source index, predicate on the cell value,
  // where a missing/empty cell arrives as null)
  private val tests: Array[(Int, String => Boolean)] = pushed.map {
    case EqualTo(a, v) =>
      (meta.columns.indexOf(a), (s: String) => s != null && s == String.valueOf(v))
    case IsNotNull(a) => (meta.columns.indexOf(a), (s: String) => s != null)
    case IsNull(a) => (meta.columns.indexOf(a), (s: String) => s == null)
    case StringStartsWith(a, p) =>
      (meta.columns.indexOf(a), (s: String) => s != null && s.startsWith(p))
    case f => throw new IllegalStateException(s"unpushable filter $f")
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    // iterative: blank lines and filter-rejected rows must not recurse —
    // a selective pushed filter can reject unboundedly long runs
    while (true) {
      val line = lines.readLine()
      if (line == null) { current = null; return false }
      if (!line.isEmpty) {
        val parts = splitLine(line)
        def cell(idx: Int): String =
          if (idx < 0 || idx >= parts.length || parts(idx).isEmpty) null
          else parts(idx)
        var t = 0
        var pass = true
        while (pass && t < tests.length) {
          pass = tests(t)._2(cell(tests(t)._1)); t += 1
        }
        if (pass) { // row survives every pushed filter → materialise
          val vals = new Array[Any](srcIdx.length)
          var i = 0
          while (i < srcIdx.length) {
            val s = cell(srcIdx(i))
            vals(i) = if (s == null) null else UTF8String.fromString(s)
            i += 1
          }
          current = new GenericInternalRow(vals)
          return true
        }
      }
    }
    false
  }

  /** Plain split when meta.xml declares no field quote (the common
    * tab-separated form); a quote-aware RFC 4180 scan otherwise — enclosed
    * separators and DOUBLED quotes, the one convention every graft sink
    * (`DwcaExport`, `Store.writeCsv`) writes. Backslash is a literal
    * character: a backslash-escape rule here would be ambiguous against
    * quote-doubled JSON cells (`\"` inside a JSON string doubles to `\""`,
    * which a backslash-aware parser mis-reads as escaped-quote + closing
    * quote). Quoted fields spanning lines are out of contract. -1 keeps
    * trailing empty columns. */
  private def splitLine(line: String): Array[String] = meta.quote match {
    case None =>
      line.split(java.util.regex.Pattern.quote(meta.sep.toString), -1)
    case Some(q) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new java.lang.StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (inQ) {
          if (c == q) {
            if (i + 1 < line.length && line.charAt(i + 1) == q) {
              sb.append(q); i += 1
            } else inQ = false
          } else sb.append(c)
        } else {
          if (c == q && sb.length == 0) inQ = true
          else if (c == meta.sep) { out += sb.toString; sb.setLength(0) }
          else sb.append(c)
        }
        i += 1
      }
      out += sb.toString
      out.toArray
  }

  override def get(): InternalRow = current
  override def close(): Unit = { lines.close(); zip.close() }
}
