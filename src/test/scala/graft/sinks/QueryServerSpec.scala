package graft.sinks

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import graft.SparkSpec

/** Real HTTP round-trips against the view server: health, the JSON-lines
  * rows endpoint, the limit parameter, the clamp, and the error path. */
class QueryServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Option(stream).map { s =>
      try Source.fromInputStream(s, "UTF-8").mkString finally s.close()
    }.getOrElse("")
    (code, body)
  }

  "QueryServer" should "serve a view over HTTP with health, rows, limit and clamp" in {
    val view = () => Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .orderBy("id")
    val server = QueryServer.start(view, maxLimit = 2)
    try {
      val port = server.getAddress.getPort
      get(s"http://127.0.0.1:$port/health") shouldBe (200, """{"status":"ok"}""")

      val (code, body) = get(s"http://127.0.0.1:$port/rows?limit=2")
      code shouldBe 200
      body.split("\n").toSeq shouldBe Seq(
        """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}""")

      // default limit (100) is clamped to maxLimit = 2
      get(s"http://127.0.0.1:$port/rows")._2.split("\n").length shouldBe 2
      // limit=0 yields an empty body
      get(s"http://127.0.0.1:$port/rows?limit=0")._2 shouldBe ""
    } finally server.stop(0)
  }

  it should "reflect the CURRENT view state on each request and report errors as 500" in {
    var rows = Seq((1L, "a"))
    val server = QueryServer.start(() => rows.toDF("id", "name").orderBy("id"))
    try {
      val port = server.getAddress.getPort
      get(s"http://127.0.0.1:$port/rows")._2.split("\n").length shouldBe 1
      rows = Seq((1L, "a"), (2L, "b")) // the view grew between requests
      get(s"http://127.0.0.1:$port/rows")._2.split("\n").length shouldBe 2
    } finally server.stop(0)

    val broken = QueryServer.start(() => sys.error("view exploded"))
    try {
      val port = broken.getAddress.getPort
      val (code, body) = get(s"http://127.0.0.1:$port/rows")
      code shouldBe 500
      body should include("view exploded")
      // the server survives a failing view
      get(s"http://127.0.0.1:$port/health")._1 shouldBe 200
    } finally broken.stop(0)
  }
}
