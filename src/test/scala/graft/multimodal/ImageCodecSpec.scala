package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rgb(r: Int, g: Int, b: Int): Int =
    0xFF000000 | (r << 16) | (g << 8) | b

  test("PNG encode → decode round-trips pixels losslessly") {
    val img = ImageCodec.syntheticImage(42L, 17, 11)
    val back = ImageCodec.decode(ImageCodec.encodePng(img))
    assert(back.isDefined)
    assert(back.get.width == 17 && back.get.height == 11)
    assert(back.get.argb.sameElements(img.argb))
  }

  test("decode rejects non-image bytes and empties") {
    assert(ImageCodec.decode("not a png".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
  }

  test("nearest-neighbour downscale picks the expected source pixels") {
    // 4x4 quadrant image → 2x2 must sample the top-left of each quadrant
    val px = Array.tabulate(16) { i =>
      val x = i % 4; val y = i / 4
      if (x < 2 && y < 2) rgb(255, 0, 0)
      else if (y < 2) rgb(0, 255, 0)
      else if (x < 2) rgb(0, 0, 255)
      else rgb(255, 255, 255)
    }
    val r = ImageCodec.resizeNearest(ImageCodec.Raster(4, 4, px), 2, 2)
    assert(r.argb.toSeq == Seq(rgb(255, 0, 0), rgb(0, 255, 0),
      rgb(0, 0, 255), rgb(255, 255, 255)))
  }

  test("upscale replicates pixels deterministically") {
    val r = ImageCodec.resizeNearest(
      ImageCodec.Raster(1, 1, Array(rgb(7, 8, 9))), 3, 2)
    assert(r.argb.forall(_ == rgb(7, 8, 9)) && r.argb.length == 6)
  }

  test("features measure real channel means and luma histogram") {
    // half pure red, half pure white → meanR=1.0, meanG=meanB=0.5
    val px = Array.fill(8)(rgb(255, 0, 0)) ++ Array.fill(8)(rgb(255, 255, 255))
    val f = ImageCodec.features(ImageCodec.Raster(4, 4, px))
    assert(math.abs(f(0) - 1.0f) < 1e-6)
    assert(math.abs(f(1) - 0.5f) < 1e-6)
    assert(math.abs(f(2) - 0.5f) < 1e-6)
    // red luma = 299*255/1000 = 76 → bin 2; white luma 255 → bin 7
    assert(math.abs(f(3 + 2) - 0.5f) < 1e-6)
    assert(math.abs(f(3 + 7) - 0.5f) < 1e-6)
    assert(f.length == 11)
  }

  test("grayscale uses integer Rec.601 luma") {
    val g = ImageCodec.grayscale(
      ImageCodec.Raster(1, 1, Array(rgb(255, 0, 0))))
    assert(g.argb(0) == rgb(76, 76, 76)) // 299*255/1000 = 76 (int div)
  }

  test("the distributed decode-features path runs on real PNGs") {
    val df = Multimodal.withGeneratedImageColumn(
      spark.range(12).select(col("id").as("doc_id")), "doc_id")
    val out = df.select(col("doc_id"),
        Multimodal.decodedImageFeatures(col("image")).as("f"),
        col("imageMeta.width").as("w"), col("imageMeta.height").as("h"))
      .as[(Long, Seq[Float], Int, Int)].collect()
    assert(out.length == 12)
    out.foreach { case (id, f, w, h) =>
      assert(f != null && f.length == 11, s"id $id")
      // histogram fractions sum to 1 over real pixels
      assert(math.abs(f.drop(3).sum - 1.0f) < 1e-5, s"id $id")
      // features must equal a local decode of the same synthetic image
      val local = ImageCodec.features(ImageCodec.syntheticImage(id,
        (id % 13).toInt + 8, (id % 7).toInt + 6))
      assert(f.toArray.sameElements(local), s"id $id")
      assert(w == (id % 13) + 8 && h == (id % 7) + 6)
    }
  }

  test("PNG-stream container splits on signature boundaries") {
    val stream = Multimodal.syntheticPngStream(5L, 4, 8, 6)
    val frames = Multimodal.splitPngStream(stream)
    assert(frames.length == 4)
    frames.zipWithIndex.foreach { case (f, i) =>
      val r = ImageCodec.decode(f)
      assert(r.isDefined && r.get.width == 8 && r.get.height == 6, s"frame $i")
      // content must match the generator frame-for-frame
      assert(r.get.argb.sameElements(
        ImageCodec.syntheticImage(5L * 1000L + i, 8, 6).argb), s"frame $i")
    }
    assert(Multimodal.splitPngStream("junk".getBytes).isEmpty)
    assert(Multimodal.splitPngStream(null).isEmpty)
  }

  test("frame sampling keeps every stride-th frame with real features") {
    val df = spark.range(3).select(col("id").as("doc_id"))
      .withColumn("video", udf((id: Long) =>
        Multimodal.syntheticPngStream(id, 5, 8, 6)).apply(col("doc_id")))
    val out = Multimodal.samplePngFrames(df, "video", stride = 2)
      .select("doc_id", "frameIndex", "frameWidth", "frameHeight")
      .as[(Long, Int, Int, Int)].collect()
    // 5 frames, stride 2 → indices 0, 2, 4 per doc
    assert(out.length == 9)
    assert(out.groupBy(_._1).values.forall(
      _.map(_._2).sorted.toSeq == Seq(0, 2, 4)))
    assert(out.forall(r => r._3 == 8 && r._4 == 6))
  }

  test("the distributed resize path re-encodes real PNGs at target dims") {
    val df = Multimodal.withGeneratedImageColumn(
      spark.range(5).select(col("id").as("doc_id")), "doc_id")
    val resized = df.select(col("doc_id"),
        Multimodal.decodedResize(col("image"), 4, 3).as("small"))
      .as[(Long, Array[Byte])].collect()
    resized.foreach { case (id, bytes) =>
      val r = ImageCodec.decode(bytes)
      assert(r.isDefined && r.get.width == 4 && r.get.height == 3, s"id $id")
    }
  }

  test("perceptual hashes are stable and survive PNG round-trip") {
    val r = ImageCodec.syntheticImage(42L, 20, 18)
    val rt = ImageCodec.decode(ImageCodec.encodePng(r)).get
    assert(ImageCodec.aHash(r) == ImageCodec.aHash(rt))
    assert(ImageCodec.dHash(r) == ImageCodec.dHash(rt))
  }

  test("dHash: small perturbation stays near, different images are far") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = ImageCodec.syntheticImage(7L, 20, 18)
    val perturbed = {
      val px = base.argb.clone()
      px(0) = 0xFF000000; px(1) = 0xFF000000
      ImageCodec.Raster(base.width, base.height, px)
    }
    assert(hamming(ImageCodec.dHash(base), ImageCodec.dHash(perturbed)) <= 2)
    val other = ImageCodec.syntheticImage(8L, 20, 18)
    assert(hamming(ImageCodec.dHash(base), ImageCodec.dHash(other)) > 10)
  }

  test("imageNearDupPairs finds exactly the shared-raster pairs") {
    val ids = spark.range(0, 20).select(col("id").as("img_id"))
    val imgs = Multimodal.withNearDupImageColumn(ids, "img_id")
    val pairs = Multimodal
      .imageNearDupPairs(imgs, "img_id", "image", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0 until 10).map(k => (2L * k, 2L * k + 1)).toSet)
  }

  test("thumbnail ladder: longest side hits 100/314/650, aspect preserved") {
    // reference Thumbnailer THUMB/SMALL/LARGE; 8×6 source → thumb 100×75
    val src = Seq((1L, ImageCodec.encodePng(
      ImageCodec.syntheticImage(1L, 8, 6)))).toDF("img_id", "image")
    val out = Multimodal.withThumbnails(src, "image").head()
    def dims(b: Array[Byte]): (Int, Int) = {
      val r = ImageCodec.decode(b).get; (r.width, r.height)
    }
    assert(dims(out.getAs[Array[Byte]]("image_thumb")) == (100, 75))
    assert(dims(out.getAs[Array[Byte]]("image_small")) == (314, 236))
    assert(dims(out.getAs[Array[Byte]]("image_large")) == (650, 488))
    // undecodable payloads yield nulls, not exceptions
    val bad = Seq((2L, "junk".getBytes)).toDF("img_id", "image")
    val badOut = Multimodal.withThumbnails(bad, "image").head()
    assert(badOut.isNullAt(badOut.fieldIndex("image_thumb")))
  }
}
