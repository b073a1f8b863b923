package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdkHttp, ObisClient}

/** Integration test of the REAL transport: the JDK's built-in HttpServer
  * on an ephemeral localhost port stands in for the OBIS API, so the
  * production `JdkHttp` + `ObisClient` path — sockets, query-string
  * encoding, status handling, staging — runs end-to-end with no external
  * network.
  */
class JdkHttpSpec extends AnyFunSuite {

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      test(server, s"http://127.0.0.1:${server.getAddress.getPort}/v3")
    } finally server.stop(0)
  }

  private def respond(server: HttpServer, path: String, status: Int,
      body: String, record: String => Unit = _ => ()): Unit =
    server.createContext(path, exchange => {
      record(Option(exchange.getRequestURI.getQuery).getOrElse(""))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })

  test("JdkHttp GET: status, body, and encoded query parameters") {
    withServer { (server, base) =>
      var seen = ""
      respond(server, "/v3/statistics/years", 200,
        """[{"year":2001,"records":3}]""", q => seen = q)
      val http = new JdkHttp()
      val r = http.get(s"$base/statistics/years",
        Seq("scientificname" -> "Orcinus orca", "size" -> "10"))
      assert(r.status == 200 && r.body.contains("2001"))
      assert(seen == "scientificname=Orcinus+orca&size=10")
    }
  }

  test("JdkHttp surfaces error statuses with their bodies") {
    withServer { (server, base) =>
      respond(server, "/v3/occurrence", 404, "nope")
      val r = new JdkHttp().get(s"$base/occurrence", Nil)
      assert(r.status == 404 && r.body == "nope")
    }
  }

  test("ObisClient over the real transport: fetch -> staged file") {
    withServer { (server, base) =>
      respond(server, "/v3/statistics/years", 200,
        """[{"year":2001,"records":2}]""")
      respond(server, "/v3/occurrence", 200,
        """{"results":[{"occurrenceID":"x1"},{"occurrenceID":"x2"}]}""")
      val dir = Files.createTempDirectory("jdkhttp_stage").toString
      val client = new ObisClient(new JdkHttp(), baseUrl = base, sleep = _ => ())
      val files = client.batchRequests(
        "Orcinus orca", "killer_whale", "", "", 10000L, dir)
      assert(files.size == 1 && files.head.endsWith("2001-01-01--2001-12-31.json"))
      val staged = new String(Files.readAllBytes(
        java.nio.file.Paths.get(files.head)), StandardCharsets.UTF_8)
      assert(staged.contains("x1") && staged.contains("x2"))
    }
  }
}
