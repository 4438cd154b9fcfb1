package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data pipelines.
  *
  * Design: media payloads are opaque `binary` columns carried next to a typed
  * metadata struct; decode / feature-extraction / resize / frame-sampling run
  * as partition-parallel kernels over the binary bytes. The decode step is a
  * DETERMINISTIC STUB (this environment ships no image/audio codecs): it
  * derives pseudo-features from the bytes. Everything around it — schema,
  * batching, partitioning, UDF signatures, output shapes — is the real
  * plumbing a production decode (JNI codec, ONNX encoder) would drop into.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sampleRate", IntegerType),
    StructField("durationMs", LongType)))

  /** Split an associatedMedia value into its media URLs (reference
    * `load/DownloadMedia.unpackAssociatedMedia:40-63`): pipe is the DwC
    * default delimiter, then semicolon, then comma; a split is only
    * accepted when the parts are uniformly URL-like or uniformly not
    * (a comma inside a single filename must not split it). */
  def unpackAssociatedMedia(associatedMedia: String): Seq[String] = {
    def mediaUrl(u: String) = u.startsWith("http") || u.startsWith("ftp") ||
      u.startsWith("file:")
    def splitBy(c: Char): Seq[String] = {
      val parts = associatedMedia.split(c).map(_.trim).filter(_.nonEmpty).toSeq
      if (parts.forall(mediaUrl) || parts.forall(!mediaUrl(_))) parts
      else Seq(associatedMedia)
    }
    if (associatedMedia == null || associatedMedia.trim.isEmpty) Seq()
    else if (associatedMedia.indexOf('|') > 0) splitBy('|')
    else if (associatedMedia.indexOf(';') > 0) splitBy(';')
    else if (associatedMedia.indexOf(',') > 0) splitBy(',')
    else Seq(associatedMedia)
  }

  /** Media MIME type from DC format/identifier metadata (reference
    * `model/Multimedia.findMimeType:35-54` + MultimediaTest): the format
    * term resolves through the MIME vocab ("jpeg" → "image/jpeg", full
    * types pass through, unknowns stay as supplied); without a format the
    * identifier's extension decides, defaulting to the generic image
    * wildcard type. */
  def findMimeType(format: Option[String], identifier: Option[String]): String = {
    val extensionPattern = raw"(\.[\d\w\-_]+)(\?.*)?$$".r
    val extensionMap = Map(".jpg" -> "image/jpeg", ".gif" -> "image/gif",
      ".png" -> "image/png")
    val f = format.getOrElse {
      identifier.flatMap(id => extensionPattern.findFirstMatchIn(id)
        .map(m => extensionMap.getOrElse(m.group(1).toLowerCase, "image/*")))
        .getOrElse("image/*")
    }
    graft.vocab.MimeType.matchTerm(f).getOrElse(f)
  }

  /** Image-URL shape check (reference `MediaStore.isValidImageURL`). */
  private val imageUrlPattern =
    """(?i)^(https?|ftp|file)://.*\.(jpg|jpeg|gif|png)$""".r

  def isValidImageUrl(url: String): Boolean =
    url != null && imageUrlPattern.findFirstIn(url.trim).isDefined

  /** Attach a deterministic fake binary payload + metadata to a DataFrame —
    * stands in for reading real media files alongside records (the reference
    * stores media paths per record, `load/MediaStore.scala`). */
  def withFakeImageColumn(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("image",
        sha2(col(idCol).cast("string"), 256).cast("binary"))
      .withColumn("imageMeta", struct(
        lit("fake/raw").as("format"),
        (pmod(crc32(col(idCol).cast("string")), lit(1920)) + 32).cast("int").as("width"),
        (pmod(crc32(col(idCol).cast("string")) * 7, lit(1080)) + 32).cast("int").as("height"),
        lit(3).as("channels")))

  /** STUBBED image decode → fixed-length feature vector. A real
    * implementation decodes `bytes` with a codec and runs an encoder; shape
    * and determinism are what the pipeline depends on, and those are real. */
  def imageFeatureKernel(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) {
      h = graft.functions.HashKernels.mix64(h ^ bytes(i))
      out(i % dim) += ((h & 0xFFFF).toFloat / 65535f - 0.5f)
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / math.max(1, bytes.length / dim); d += 1 }
    out
  }

  /** Feature-extraction column over a binary media column: the batch shape is
    * one vector per row, partition-parallel, no shuffle. */
  def imageFeatures(bytesCol: Column, dim: Int = 64): Column =
    udf((b: Array[Byte]) => imageFeatureKernel(b, dim)).apply(bytesCol)

  /** STUBBED resize: a real kernel rescales pixels; the stub rescales the
    * byte payload deterministically so output size tracks (w, h). */
  def resizeImage(bytesCol: Column, metaCol: Column, w: Int, h: Int): Column = {
    val resized = udf { (b: Array[Byte]) =>
      val targetLen = math.max(16, (w * h) / 1024)
      Array.tabulate[Byte](targetLen)(i => b(i % b.length))
    }
    struct(resized(bytesCol).as("bytes"),
      struct(metaCol.getField("format").as("format"),
        lit(w).as("width"), lit(h).as("height"),
        metaCol.getField("channels").as("channels")).as("meta"))
  }

  /** Frame sampling plumbing for video-like payloads: split the payload into
    * `frameCount` deterministic "frames" → one output row per frame via
    * explode. A real kernel seeks keyframes; the row-explosion shape, frame
    * index column, and per-frame feature hook are the real pipeline. */
  def sampleFrames(df: DataFrame, bytesCol: String, frameCount: Int): DataFrame = {
    val splitUdf = udf { (b: Array[Byte]) =>
      val n = math.max(1, math.min(frameCount, b.length))
      val step = math.max(1, b.length / n)
      (0 until n).map(i =>
        (i, b.slice(i * step, math.min(b.length, i * step + step)))).toArray
    }
    df.withColumn("_frames", splitUdf(col(bytesCol)))
      .select(col("*"), posexplode(col("_frames")).as(Seq("framePos", "frame")))
      .drop("_frames")
      .withColumn("frameIndex", col("frame._1"))
      .withColumn("frameBytes", col("frame._2"))
      .drop("frame", "framePos")
  }
}
