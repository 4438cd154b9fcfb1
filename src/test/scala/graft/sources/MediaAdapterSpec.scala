package graft.sources

import graft.SparkTestSession
import graft.multimodal.{AudioCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remote media fetch (reference `load/MediaStore.scala`): content-
  * addressed driver-side landing + Spark binaryFile join-back. */
class MediaAdapterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val png = Multimodal.syntheticPngStream(7L, 1, 8, 8)
  private val wav = AudioCodec.encodeWav(AudioCodec.syntheticAudio(3L, 400), 8000)

  private def withServer[A](f: (String, java.util.concurrent.atomic.AtomicInteger) => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger
    server.createContext("/m", { exchange =>
      hits.incrementAndGet()
      val body = exchange.getRequestURI.getPath match {
        case p if p.endsWith("img1.png") => png
        case p if p.endsWith("clip.wav") => wav
        case _ => null
      }
      if (body == null) {
        exchange.sendResponseHeaders(404, -1); exchange.close()
      } else {
        exchange.sendResponseHeaders(200, body.length)
        val os = exchange.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/m", hits)
    finally server.stop(0)
  }

  test("content-addressed fetch: idempotent, failure-tolerant, atomic") {
    withServer { (base, hits) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
      val urls = Seq(s"$base/img1.png", s"$base/clip.wav", s"$base/dead.jpg")
      val r1 = MediaAdapter.fetchMedia(urls, dir)
      assert(r1.map(_.status) == Seq("fetched", "fetched", "failed"))
      val afterFirst = hits.get()
      // landed names are sha256+ext; the failure left NO file (.part cleaned)
      val files = new java.io.File(dir).list().toSeq
      assert(files.toSet ==
        Set(MediaAdapter.mediaFileName(urls(0)), MediaAdapter.mediaFileName(urls(1))))
      assert(files.forall(f => f.endsWith(".png") || f.endsWith(".wav")))
      // second run: cached ones are NOT re-fetched (alreadyStored semantics)
      val r2 = MediaAdapter.fetchMedia(urls, dir)
      assert(r2.map(_.status) == Seq("cached", "cached", "failed"))
      assert(hits.get() == afterFirst + 1) // only the dead link re-tried
    }
  }

  test("column file-name expression matches the driver-side function") {
    val urls = Seq(
      "http://x.org/a/b/photo.JPG",
      "http://x.org/a/b/photo.png?size=large#frag",
      "http://x.org/occurrence/12345", // no extension → .bin
      "http://x.org/deep.path/file.with.dots.tiff",
      "http://x.org/a/weird.a_b",      // non-alnum ext char → .bin both sides
      "http://x.org/a/archive.gzipped", // 6+ chars after dot → .bin
      "http://x.org/a/.png")           // dotfile with ext shape
    val fromCol = urls.toDF("u")
      .select(MediaAdapter.mediaFileNameCol(col("u"))).as[String].collect()
    assert(fromCol.toSeq == urls.map(MediaAdapter.mediaFileName))
  }

  test("withMediaContent joins landed bytes back; decode path is real") {
    withServer { (base, _) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_media2").toString
      val img = s"$base/img1.png"
      val snd = s"$base/clip.wav"
      MediaAdapter.fetchMedia(Seq(img, snd), dir)
      val occ = Seq(
        ("r1", s"$img;$snd"),           // two media on one record
        ("r2", s"$base/dead.jpg"),      // dead link → null bytes, row kept
        ("r3", null.asInstanceOf[String])) // no media → row kept
        .toDF("rowKey", "associatedMedia")
      val joined = MediaAdapter.withMediaContent(occ, "associatedMedia", dir)
      assert(joined.count() == 4)
      val r1 = joined.filter(col("rowKey") === "r1")
      assert(r1.filter(col("media_bytes").isNotNull).count() == 2)
      // the landed PNG decodes through the real image kernel
      val feat = r1.filter(col("media_url") === img)
        .select(Multimodal.decodedImageFeatures(col("media_bytes")))
        .head().getAs[scala.collection.Seq[Float]](0)
      assert(feat.nonEmpty)
      assert(joined.filter(col("rowKey") === "r2")
        .select("media_bytes").head().isNullAt(0))
      assert(joined.filter(col("rowKey") === "r3").count() == 1)
    }
  }
}
