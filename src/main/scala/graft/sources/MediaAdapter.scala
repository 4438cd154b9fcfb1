package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin remote-media ingestion adapter — the S5-style story for the
  * reference's media store (`load/MediaStore.scala`: remote fetch of
  * `associatedMedia` URLs, idempotent `alreadyStored` check, a
  * deterministic on-disk path per media item, then downstream processing
  * reads the stored bytes).
  *
  * Same split as [[WsAdapter]]: the FETCH is driver-side and
  * dimension-scale (a load batch's media list, re-runnable and auditable
  * against the landing dir), while everything at data scale — decode,
  * feature extraction, dedup, thumbnails — is Spark over
  * `spark.read.format("binaryFile")`.
  *
  * Content addressing replaces the reference's uid/filename directory
  * scheme: the landed file name is `sha256(url) + extension`, so
  *  - re-fetch is a cheap existence check (the `alreadyStored` semantics,
  *    `load/MediaStore.scala` RemoteMediaStore.alreadyStored) with no
  *    index file to maintain, and
  *  - the Spark side recomputes the same name as a column expression and
  *    meets the binaryFile scan in a plain equi-join — no driver-side
  *    url→path map ships anywhere.
  */
object MediaAdapter {

  /** Landed file name for a URL: sha256 hex + the URL's extension (query
    * string stripped; no/unknown extension → `.bin`). Pure — the Spark
    * side mirrors it in [[mediaFileNameCol]]. */
  def mediaFileName(url: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(url.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    hex + extensionOf(url)
  }

  /** Extension rule, shared bit-for-bit with [[mediaFileNameCol]]'s regex:
    * 1-5 ALPHANUMERIC chars after the final dot (`.a_b`, `.tar-1` → `.bin`)
    * — any divergence here silently unlinks a landed file from its join
    * key, so both sides apply the same `\.[A-Za-z0-9]{1,5}$` test. */
  private val extRe = java.util.regex.Pattern.compile("(\\.[A-Za-z0-9]{1,5})$")

  private def extensionOf(url: String): String = {
    val noQuery = url.takeWhile(c => c != '?' && c != '#')
    val last = noQuery.substring(noQuery.lastIndexOf('/') + 1)
    val m = extRe.matcher(last)
    if (m.find()) m.group(1).toLowerCase else ".bin"
  }

  /** The same file name as a column expression, for joining occurrence
    * rows to landed bytes without any driver-side mapping. */
  def mediaFileNameCol(urlCol: Column): Column = {
    val noQuery = regexp_extract(urlCol, "^([^?#]*)", 1)
    val last = element_at(split(noQuery, "/"), -1)
    val ext = lower(regexp_extract(last, "(\\.[A-Za-z0-9]{1,5})$", 1))
    concat(sha2(urlCol.cast("binary"), 256),
      when(ext === "", lit(".bin")).otherwise(ext))
  }

  /** One fetch outcome; `status` ∈ fetched | cached | failed. */
  case class MediaFetch(url: String, file: String, status: String,
      error: String)

  /** Driver-side fetch of `urls` into `mediaDir`, content-addressed and
    * idempotent: an already-landed file is never re-fetched (the
    * reference's alreadyStored check), and a failing URL is reported, not
    * thrown — one dead link must not abort a million-record load batch
    * (the reference logs and continues, `load/MediaStore.scala` download
    * error handling). Failures leave no partial file behind (download to
    * `.part`, atomic rename on success). */
  def fetchMedia(urls: Seq[String], mediaDir: String): Seq[MediaFetch] = {
    val dir = new java.io.File(mediaDir)
    dir.mkdirs()
    urls.distinct.map { url =>
      val name = mediaFileName(url)
      val target = new java.io.File(dir, name)
      if (target.exists()) MediaFetch(url, name, "cached", null)
      else {
        val part = new java.io.File(dir, name + ".part")
        try {
          val in = java.net.URI.create(url).toURL.openStream()
          try java.nio.file.Files.copy(in, part.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          java.nio.file.Files.move(part.toPath, target.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          MediaFetch(url, name, "fetched", null)
        } catch {
          case e: Exception =>
            part.delete()
            MediaFetch(url, name, "failed", String.valueOf(e.getMessage))
        }
      }
    }
  }

  /** Spark side: the landed media as (media_file, media_bytes, media_len).
    * A plain binaryFile scan — at real scale this is the distributed read
    * of the media store, partitioned by Spark over the files. `.part`
    * leftovers from a killed fetch are excluded by pattern. */
  def loadMedia(spark: SparkSession, mediaDir: String): DataFrame =
    spark.read.format("binaryFile").load(mediaDir)
      .filter(!col("path").endsWith(".part"))
      .select(
        element_at(split(col("path"), "/"), -1).as("media_file"),
        col("content").as("media_bytes"),
        col("length").as("media_len"))

  /** Join occurrence rows to their landed media bytes: `urlCol` may hold
    * multiple URLs in the reference's `associatedMedia` conventions
    * (";", "|" or "," separated — `Multimodal.unpackAssociatedMedia`);
    * each URL becomes one output row with `media_url` + the loadMedia
    * columns (left join: a never-landed/failed URL keeps its row with
    * null bytes, mirroring the reference's tolerance of dead links).
    * Content-addressed equi-join — both sides scale out; nothing
    * broadcasts except what AQE chooses to. */
  def withMediaContent(df: DataFrame, urlCol: String,
      mediaDir: String): DataFrame = {
    val spark = df.sparkSession
    val unpack = udf((s: String) =>
      if (s == null) Seq.empty[String]
      else graft.multimodal.Multimodal.unpackAssociatedMedia(s))
    val exploded = df
      .withColumn("media_url", explode_outer(unpack(col(urlCol))))
      .withColumn("media_file", mediaFileNameCol(col("media_url")))
    exploded.join(loadMedia(spark, mediaDir), Seq("media_file"), "left")
  }
}
