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
}
