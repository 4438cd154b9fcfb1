package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** associatedMedia unpacking, case-for-case from the reference
  * `AssociatedMediaTest.scala` (+ the MiscTest image-URL check) in
  * /root/reference/src/test/scala/au/org/ala/biocache/. */
class MediaSpec extends AnyFunSuite {
  import Multimodal.{isValidImageUrl, unpackAssociatedMedia}

  test("comma separated list with full URLs (AssociatedMediaTest:11,19)") {
    val urls = unpackAssociatedMedia(
      "http://static.inaturalist.org/photos/140018/medium.JPG, " +
        "http://static.inaturalist.org/photos/140019/medium.JPG")
    assert(urls == Seq(
      "http://static.inaturalist.org/photos/140018/medium.JPG",
      "http://static.inaturalist.org/photos/140019/medium.JPG"))
  }

  test("semicolon separated list (AssociatedMediaTest:27)") {
    val urls = unpackAssociatedMedia(
      "http://static.inaturalist.org/photos/20812/medium.jpg; " +
        "http://static.inaturalist.org/photos/20813/medium.jpg")
    assert(urls.size == 2)
    assert(urls(1) == "http://static.inaturalist.org/photos/20813/medium.jpg")
  }

  test("pipe list with multiple protocols (AssociatedMediaTest:35)") {
    val urls = unpackAssociatedMedia(
      "http://a.org/1.jpg | https://a.org/2.jpg | ftp://a.org/3.jpg | " +
        "ftps://a.org/4.jpg |")
    assert(urls == Seq("http://a.org/1.jpg", "https://a.org/2.jpg",
      "ftp://a.org/3.jpg", "ftps://a.org/4.jpg"))
  }

  test("a comma inside a single non-URL value does not split") {
    assert(unpackAssociatedMedia("image one, with a comma.jpg,local2.png") ==
      Seq("image one", "with a comma.jpg", "local2.png"))
    // mixed URL/non-URL parts → treat as one value
    assert(unpackAssociatedMedia("http://a.org/1.jpg, not a url") ==
      Seq("http://a.org/1.jpg, not a url"))
  }

  test("null/blank/single") {
    assert(unpackAssociatedMedia(null).isEmpty)
    assert(unpackAssociatedMedia(" ").isEmpty)
    assert(unpackAssociatedMedia("http://a.org/1.jpg") == Seq("http://a.org/1.jpg"))
  }

  test("mime type from format/identifier (MultimediaTest)") {
    import Multimodal.findMimeType
    assert(findMimeType(Some("image/jpeg"), None) == "image/jpeg")
    assert(findMimeType(Some("jpeg"), None) == "image/jpeg")
    assert(findMimeType(Some("mp3"), None) == "audio/mp3")
    assert(findMimeType(Some("something-odd"), None) == "something-odd")
    assert(findMimeType(None, Some("fred.jpg")) == "image/jpeg")
    assert(findMimeType(None, Some("fred.PNG")) == "image/png")
    assert(findMimeType(None, Some("fred.tooodd")) == "image/*")
    assert(findMimeType(None, None) == "image/*")
  }

  test("image URL validation (MiscTest:65)") {
    assert(isValidImageUrl(
      "http://74.50.62.163/images/display/biodiversity/vertebrates/id_images/web-birds/o29275a.jpg"))
    assert(isValidImageUrl("https://test.ala.org.au/images/image1/img.gif"))
    assert(!isValidImageUrl("https://test.ala.org.au/images/image1/img.bmp"))
    assert(!isValidImageUrl("http://tests.ala.org.au/images/image1/img"))
    assert(!isValidImageUrl(null))
  }
}
