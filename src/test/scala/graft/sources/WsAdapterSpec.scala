package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integration-style S5 adapter test against a local JDK HttpServer that
  * serves the paged-JSON protocol from an in-memory dataset. */
class WsAdapterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val records = (1 to 25).map(i => Map(
    "occurrenceID" -> s"ws$i",
    "SCIENTIFICNAME" -> s"Species num$i", // wrong case on purpose
    "decimalLatitude" -> s"${-30 - i % 10}.5",
    "customField" -> s"extra$i")) // unmapped → miscProperties

  private def withServer[A](f: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger
    server.createContext("/ws", { exchange =>
      hits.incrementAndGet()
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val a = kv.split("=", 2); a(0) -> a(1) }.toMap
      val offset = params.getOrElse("offset", "0").toInt
      val n = params.getOrElse("pageSize", "10").toInt
      val page = records.slice(offset, offset + n)
      def jstr(s: String) = "\"" + s.replace("\"", "\\\"") + "\""
      val body = page.map(m =>
        m.map { case (k, v) => jstr(k) + ":" + jstr(v) }
          .mkString("{", ",", "}")).mkString("[", ",", "]")
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/ws")
    finally server.stop(0)
  }

  test("paged fetch lands files; S2 tail canonicalises, miscs, and keys") {
    withServer { base =>
      val landing = java.nio.file.Files
        .createTempDirectory("graft_ws").toString
      val df = WsAdapter.load(spark, base, landing, "dr55",
        uniqueTerms = Seq("occurrenceID"), pageSize = 10)
      // 25 records over pageSize 10 → pages 0,1,2 landed
      val files = new java.io.File(landing).list().sorted
      assert(files.toSeq == Seq("page-00000.json", "page-00001.json",
        "page-00002.json"))
      assert(df.count() == 25)
      // wrong-case header canonicalised by the shared S2 tail
      assert(df.columns.contains("scientificName"))
      // unmapped column folded into miscProperties
      assert(!df.columns.contains("customField"))
      val m = df.filter(col("occurrenceID") === "ws7")
        .select("miscProperties").as[Map[String, String]].head()
      assert(m == Map("customField" -> "extra7"))
      // deterministic identity: reloading the landing dir yields the keys
      val again = WsAdapter.loadLanding(spark, landing, "dr55",
        Seq("occurrenceID"))
      assert(again.select("rowKey").as[String].collect().sorted.toSeq ==
        df.select("rowKey").as[String].collect().sorted.toSeq)
      assert(df.select("rowKey").as[String].collect()
        .forall(_.startsWith("dr55|")))
    }
  }

  test("pretty-printed empty page ends the scan (not just byte-exact [])") {
    // a server that pretty-prints its past-the-end page: '[\n]' — exact
    // string matching would loop to maxPages and land 100k junk files
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ws", { exchange =>
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val offset = q.split("&").filter(_.startsWith("offset="))
        .headOption.map(_.stripPrefix("offset=").toInt).getOrElse(0)
      val body =
        if (offset == 0) """[ {"occurrenceID": "a1"} ]"""
        else "[\n]"
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    try {
      val landing = java.nio.file.Files
        .createTempDirectory("graft_ws_pp").toString
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/ws"
      val pages = WsAdapter.fetchPages(base, landing, pageSize = 10,
        maxPages = 5)
      assert(pages == 1)
      assert(new java.io.File(landing).list().toSeq == Seq("page-00000.json"))
    } finally server.stop(0)
  }

  /** DiGIR-shape fixture: paged XML envelopes with repeated <record>
    * elements and an END_OF_RECORDS diagnostic on the final page. */
  private def withXmlServer[A](f: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/digir", { exchange =>
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val a = kv.split("=", 2); a(0) -> a(1) }.toMap
      val startAt = params.getOrElse("startAt", "0").toInt
      val n = params.getOrElse("maxResults", "10").toInt
      val page = records.slice(startAt, startAt + n)
      val end = startAt + page.size >= records.size
      def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      val recs = page.map { m =>
        "  <record>\n" + m.map { case (k, v) =>
          s"    <$k>${esc(v)}</$k>"
        }.mkString("\n") + "\n  </record>"
      }.mkString("\n")
      val body =
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<response xmlns="http://digir.net/schema/protocol/2003/1.0">
           |<content>
           |$recs
           |</content>
           |<diagnostics>
           |  <diagnostic code="END_OF_RECORDS">$end</diagnostic>
           |</diagnostics>
           |</response>""".stripMargin
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "text/xml")
      exchange.sendResponseHeaders(200, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/digir")
    finally server.stop(0)
  }

  test("XML page verb: DiGIR-shape envelopes land, END_OF_RECORDS stops " +
    "the scan, and the SAME S2 tail canonicalises, miscs, and keys") {
    withXmlServer { base =>
      val landing = java.nio.file.Files
        .createTempDirectory("graft_digir").toString
      val df = WsAdapter.loadXml(spark, base, landing, "dr56",
        uniqueTerms = Seq("occurrenceID"), pageSize = 10)
      // 25 records over maxResults 10 → 3 envelopes; the third carries
      // END_OF_RECORDS=true, so NO fourth (empty-page) request is needed
      val files = new java.io.File(landing).list().sorted
      assert(files.toSeq == Seq("page-00000.xml", "page-00001.xml",
        "page-00002.xml"))
      assert(df.count() == 25)
      // identical tail behaviour to the JSON verb: header canonicalised,
      // unmapped column folded into miscProperties, deterministic identity
      assert(df.columns.contains("scientificName"))
      assert(!df.columns.contains("customField"))
      val m = df.filter(col("occurrenceID") === "ws7")
        .select("miscProperties").as[Map[String, String]].head()
      assert(m == Map("customField" -> "extra7"))
      assert(df.select("rowKey").as[String].collect()
        .forall(_.startsWith("dr56|")))
      // verb-independence: the JSON verb over the same logical records
      // produces the same canonical rows (keys differ only by resource)
      val again = WsAdapter.loadLandingXml(spark, landing, "dr56",
        Seq("occurrenceID"))
      assert(again.select("rowKey").as[String].collect().sorted.toSeq ==
        df.select("rowKey").as[String].collect().sorted.toSeq)
    }
  }

  /** Continuation-token fixture: same 25 records behind opaque cursors
    * ("tok-K" for the page starting at record K) — offsets are ignored,
    * exactly like a real token-paged API. `loopForever = true` makes the
    * server echo the SAME token on every page (the pathological server
    * the loop guard exists for). */
  private def withCursorServer[A](loopForever: Boolean = false)(
      f: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", { exchange =>
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val a = kv.split("=", 2); a(0) -> a(1) }.toMap
      val n = params.getOrElse("maxResults", "10").toInt
      val start = params.get("cursor")
        .map(_.stripPrefix("tok-").toInt).getOrElse(0)
      val page = records.slice(start, start + n)
      def jstr(s: String) = "\"" + s.replace("\"", "\\\"") + "\""
      val recJson = page.map(m =>
        m.map { case (k, v) => jstr(k) + ":" + jstr(v) }
          .mkString("{", ",", "}")).mkString("[", ",", "]")
      val next =
        if (loopForever) jstr(params.getOrElse("cursor", "tok-0"))
        else if (start + n < records.size) jstr(s"tok-${start + n}")
        else "null"
      val body = s"""{"records": $recJson, "nextCursor": $next}"""
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  test("cursor page verb: opaque continuation tokens page the scan, " +
    "null cursor ends it, and the SAME S2 tail canonicalises") {
    withCursorServer() { base =>
      val landing = java.nio.file.Files
        .createTempDirectory("graft_cursor").toString
      val df = WsAdapter.loadCursor(spark, base, landing, "dr57",
        uniqueTerms = Seq("occurrenceID"), pageSize = 10)
      // 25 records over maxResults 10 → 3 envelopes; the third carries
      // nextCursor null, so no fourth request happens
      val files = new java.io.File(landing).list().sorted
      assert(files.toSeq == Seq("page-00000.json", "page-00001.json",
        "page-00002.json"))
      assert(df.count() == 25)
      assert(df.columns.contains("scientificName"))
      assert(!df.columns.contains("customField"))
      val m = df.filter(col("occurrenceID") === "ws7")
        .select("miscProperties").as[Map[String, String]].head()
      assert(m == Map("customField" -> "extra7"))
      assert(df.select("rowKey").as[String].collect()
        .forall(_.startsWith("dr57|")))
      // verb-independence: the offset verb over the same logical records
      // produces the same canonical content
      withServer { offsetBase =>
        val landing2 = java.nio.file.Files
          .createTempDirectory("graft_cursor_cmp").toString
        val viaOffset = WsAdapter.load(spark, offsetBase, landing2, "dr57",
          Seq("occurrenceID"), pageSize = 10)
        assert(viaOffset.select("rowKey").as[String].collect().sorted.toSeq
          == df.select("rowKey").as[String].collect().sorted.toSeq)
      }
    }
  }

  test("cursor loop guard: a server that echoes the same token is " +
    "refused loudly instead of re-landing the same page forever") {
    withCursorServer(loopForever = true) { base =>
      val landing = java.nio.file.Files
        .createTempDirectory("graft_cursor_loop").toString
      val ex = intercept[IllegalStateException] {
        WsAdapter.fetchPagesCursor(base, landing, pageSize = 10)
      }
      assert(ex.getMessage.contains("repeated continuation token"))
    }
  }

  test("XML record count is element-true: <record…> inside CDATA, " +
    "comments, and attribute values must NOT advance the page cursor") {
    val body =
      """<?xml version="1.0"?>
        |<response xmlns="http://example.org/ns">
        | <!-- commented out: <record><f>x</f></record> -->
        | <content note="literal &lt;record&gt; in an attribute">
        |  <record><f><![CDATA[a <record> tag inside CDATA]]></f></record>
        |  <record><f>plain</f></record>
        | </content>
        | <diagnostics>mentions record-like text but no element</diagnostics>
        |</response>""".stripMargin
    assert(WsAdapter.countRecordElements(body, "record") == 2)
    // namespace prefixes must not hide records from the count
    val prefixed =
      """<d:response xmlns:d="http://example.org/d">
        | <d:record><d:f>1</d:f></d:record>
        | <d:record><d:f>2</d:f></d:record>
        | <d:record><d:f>3</d:f></d:record>
        |</d:response>""".stripMargin
    assert(WsAdapter.countRecordElements(prefixed, "record") == 3)
    // malformed envelopes fail loudly instead of guessing a cursor delta
    intercept[Exception] {
      WsAdapter.countRecordElements("<response><record></response>",
        "record")
    }
  }
}
