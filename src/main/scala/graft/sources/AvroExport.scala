package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** S22: Avro container export + read-back (reference
  * `util/AvroUtil.scala:1-120` — flat records of nullable single-value
  * fields plus array-of-string multivalue fields, one Avro container file
  * per export).
  *
  * The image ships avro + avro-mapred but not the spark-avro DataSource,
  * so this goes through the Hadoop mapreduce formats: each task writes its
  * partition as one `.avro` container via `AvroKeyOutputFormat`
  * (distributed, no driver funnel), and reads stream through
  * `AvroKeyInputFormat`, which splits on Avro sync markers — so one big
  * container file still fans out across tasks, unlike the DwC-A zip whose
  * deflate stream has no sync points.
  *
  * Types are carried representation-free: string/int/long/double/float/
  * boolean/bytes map 1:1, date/timestamp export as ISO-8601 / epoch-micros
  * (documented, lossless), arrays as avro arrays, structs as nested
  * records. Every field is a `union(null, T)` like the reference's
  * optional columns.
  */
object AvroExport {

  // ── Spark → Avro schema ──
  def avroSchema(st: StructType, name: String = "GraftRecord"): Schema = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      new Schema.Field(avroName(f.name), nullable(avroType(f.dataType,
        s"${name}_f$i")), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  /** Avro names are [A-Za-z0-9_] and can't start with a digit. */
  private def avroName(c: String): String = {
    val s = c.map(ch => if (ch.isLetterOrDigit || ch == '_') ch else '_')
    if (s.isEmpty || s.head.isDigit) "_" + s else s
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def avroType(dt: DataType, recName: String): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => Schema.create(Schema.Type.STRING) // ISO yyyy-MM-dd
    case TimestampType => Schema.create(Schema.Type.LONG) // epoch micros
    case ArrayType(elem, _) => Schema.createArray(avroType(elem, recName))
    case st: StructType => avroSchema(st, recName)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro export type: $other")
  }

  // ── Avro → Spark schema (for read-back without a caller schema) ──
  def sparkSchema(s: Schema): StructType = StructType(
    s.getFields.asScala.map { f =>
      StructField(f.name, sparkType(unwrap(f.schema)), nullable = true)
    }.toArray)

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(unwrap(s.getElementType)))
    case Schema.Type.RECORD => sparkSchema(s)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro read type: $other")
  }

  // ── value conversion (runs inside tasks; schemas travel as JSON) ──
  private def toAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case r: Row =>
      val rec = new GenericData.Record(s)
      var i = 0
      while (i < r.length) {
        val fs = unwrap(s.getFields.get(i).schema)
        rec.put(i, toAvro(r.get(i), fs)); i += 1
      }
      rec
    case seq: scala.collection.Seq[_] =>
      val elem = unwrap(s.getElementType)
      new GenericData.Array(s, seq.map(x => toAvro(x, elem)).asJava)
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s0: Short => s0.toInt
    case b0: Byte => b0.toInt
    case other => other
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case r: GenericRecord =>
      Row.fromSeq((0 until r.getSchema.getFields.size)
        .map(i => fromAvro(r.get(i))))
    case a: java.util.Collection[_] => a.asScala.map(fromAvro).toSeq
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining); b.duplicate.get(arr); arr
    case other => other
  }

  /** Write `df` as Avro container files, one per partition. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = avroSchema(df.schema)
    val schemaJson = schema.toString
    val job = Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(job.getConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.rdd.mapPartitions { rows =>
      val s = new Schema.Parser().parse(schemaJson)
      rows.map { row =>
        (new AvroKey[GenericRecord](
          toAvro(row, s).asInstanceOf[GenericRecord]), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files back to a DataFrame; the schema comes from
    * the container header of the first file (all files of one export share
    * it). Hadoop record readers REUSE the key object, so each record is
    * converted to a Row inside the iterator before the next advance. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val glob = new org.apache.hadoop.fs.Path(path + "/part-*")
    val fs = glob.getFileSystem(conf)
    val first = fs.globStatus(glob).head.getPath
    val reader = new org.apache.avro.file.DataFileStream[GenericRecord](
      fs.open(first),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val writerSchema = try reader.getSchema finally reader.close()
    val st = sparkSchema(writerSchema)
    val rows = spark.sparkContext.newAPIHadoopFile(
      path, classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .map { case (k, _) => fromAvro(k.datum).asInstanceOf[Row] }
    spark.createDataFrame(rows, st)
  }
}
