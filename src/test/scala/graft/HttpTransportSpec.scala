package graft

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sources.{GraphSource, HttpGraphTransport, JsonlDumpTransport}

/** P2 closed end-to-end without egress: an in-process loopback HTTP
  * server plays the reference's graph server (remote_graph.py:59-66 —
  * `ResotoClient(url, psk).search_graph(search, graph)` yielding one
  * envelope per line), and [[HttpGraphTransport]] drives the full
  * client path: search pushed over the wire, psk on the Authorization
  * header, ndjson response spooled and parsed into the same envelope
  * DataFrame the dump-backed transport produces. */
class HttpTransportSpec extends SparkSpecBase {

  private val lines = Seq(
    """{"type":"node","id":"root","reported":{"kind":"graph_root","id":"root"}}""",
    """{"type":"node","id":"c1","reported":{"kind":"cloud","id":"c1"}}""",
    """{"type":"node","id":"a1","reported":{"kind":"account","id":"a1"}}""",
    """{"type":"edge","from":"root","to":"c1"}""",
    """{"type":"edge","from":"c1","to":"a1"}""")

  private def withServer(status: Int)(
      run: (String, AtomicReference[(String, String, String)]) => Unit): Unit = {
    val received = new AtomicReference[(String, String, String)]
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
        received.set((
          s"${x.getRequestMethod} ${x.getRequestURI}",
          x.getRequestHeaders.getFirst("Authorization"),
          body))
        val payload = lines.mkString("\n").getBytes(UTF_8)
        x.getResponseHeaders.set("Content-Type", "application/x-ndjson")
        x.sendResponseHeaders(status, payload.length)
        x.getResponseBody.write(payload)
        x.close()
      }
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", received)
    finally server.stop(0)
  }

  test("search is pushed over the wire and the spooled stream parses") {
    withServer(200) { (url, received) =>
      val spool = java.nio.file.Files.createTempDirectory("graft_http")
      val tr = new HttpGraphTransport(url, "resoto", Some("sekrit"),
        spool.toString)
      val env = tr.envelopes(spark, Some("is(graph_root) -[1:]->"))
      assert(env.count() == 5)
      assert(GraphSource.nodes(env).count() == 3)
      assert(GraphSource.edges(env).count() == 2)
      val (reqLine, auth, body) = received.get()
      // Server-side evaluation is the protocol: the search expression
      // itself must cross the wire, on the reference's search resource.
      assert(reqLine == "POST /graph/resoto/search/graph")
      assert(auth == "Bearer sekrit")
      assert(body == "is(graph_root) -[1:]->")
    }
  }

  test("no search sends the reference's default root traversal") {
    withServer(200) { (url, received) =>
      val spool = java.nio.file.Files.createTempDirectory("graft_http")
      new HttpGraphTransport(url, "g2", None, spool.toString)
        .envelopes(spark, None).count()
      val (reqLine, auth, body) = received.get()
      assert(reqLine == "POST /graph/g2/search/graph")
      assert(auth == null)
      assert(body == "is(graph_root) -[2:]->")
    }
  }

  test("spooled HTTP stream equals the dump-backed transport") {
    withServer(200) { (url, _) =>
      val spool = java.nio.file.Files.createTempDirectory("graft_http")
      val dump = java.nio.file.Files.createTempDirectory("graft_dump")
      import spark.implicits._
      spark.createDataset(lines).toDF("value").coalesce(1)
        .write.mode("overwrite").text(dump.toString)
      val viaHttp = new HttpGraphTransport(url, "resoto", None,
        spool.toString).envelopes(spark, None)
      val viaDump = new JsonlDumpTransport(dump.toString)
        .envelopes(spark, None)
      assert(viaHttp.schema == viaDump.schema)
      assert(viaHttp.exceptAll(viaDump).isEmpty &&
        viaDump.exceptAll(viaHttp).isEmpty)
    }
  }

  test("large responses stream into rotated gzip chunks, never a 1x spool") {
    // ~40k envelopes (~4.8 MB of ndjson) streamed with chunked transfer
    // encoding (length 0 => no Content-Length, so the client genuinely
    // cannot pre-size a buffer), against a 64 KiB compressed-chunk cap:
    // the spool must land as MULTIPLE gzip chunks whose total is a
    // compressed FRACTION of the body — the production shape for a
    // multi-GB server-side search (VERDICT r10 #4 / COVERAGE P2).
    val n = 40000
    def bigLine(i: Int): String =
      s"""{"type":"node","id":"n$i","reported":{"kind":"instance","id":"n$i","name":"instance-$i-${"x" * 64}"}}"""
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.getRequestBody.readAllBytes()
        x.getResponseHeaders.set("Content-Type", "application/x-ndjson")
        x.sendResponseHeaders(200, 0)
        val out = new java.io.BufferedOutputStream(x.getResponseBody, 1 << 16)
        (0 until n).foreach { i =>
          out.write(bigLine(i).getBytes(UTF_8)); out.write('\n')
        }
        out.close(); x.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val spool = java.nio.file.Files.createTempDirectory("graft_http_big")
      val env = new HttpGraphTransport(url, "resoto", None, spool.toString,
        chunkBytes = 64L << 10).envelopes(spark, None)
      assert(env.count() == n)
      assert(GraphSource.nodes(env).count() == n)
      val chunkDir = java.nio.file.Files.list(spool).iterator().next()
      val chunks = java.nio.file.Files.list(chunkDir).iterator()
      val sizes = scala.collection.mutable.ArrayBuffer[Long]()
      chunks.forEachRemaining { p =>
        assert(p.getFileName.toString.matches("part-\\d{5}\\.jsonl\\.gz"))
        sizes += java.nio.file.Files.size(p)
      }
      assert(sizes.length >= 2, s"expected rotation, got ${sizes.length} chunk(s)")
      val bodyBytes = (0 until n).map(bigLine(_).length + 1L).sum
      assert(sizes.sum < bodyBytes / 2,
        s"spool ${sizes.sum} not a compressed fraction of body $bodyBytes")
    } finally server.stop(0)
  }

  test("a stalling server times out and fails loudly — no indefinite hang") {
    // Accepts the connection, never sends a status line: the read
    // timeout must bound BOTH attempts (original + one retry) and
    // surface as an exception, not a hung thread.
    val server = new java.net.ServerSocket(
      0, 4, InetAddress.getLoopbackAddress)
    val accepter = new Thread(() => {
      try while (true) { server.accept() } // hold sockets open, say nothing
      catch { case _: java.io.IOException => () }
    })
    accepter.setDaemon(true); accepter.start()
    try {
      val url = s"http://127.0.0.1:${server.getLocalPort}"
      val spool = java.nio.file.Files.createTempDirectory("graft_http_stall")
      val t0 = System.nanoTime()
      intercept[java.io.IOException] {
        new HttpGraphTransport(url, "resoto", None, spool.toString,
          connectTimeoutMs = 1000, readTimeoutMs = 500)
          .envelopes(spark, None)
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs < 30000, s"took ${elapsedMs}ms — timeout not applied")
    } finally server.close()
  }

  test("a mid-stream drop is retried once with a fresh spool and succeeds") {
    // First connection advertises the full Content-Length but closes
    // after half the body (premature EOF -> IOException mid-read);
    // the second serves it whole. The transport must retry into a
    // WIPED spool — the final graph has every envelope exactly once,
    // never a truncated or doubled mix.
    val body = lines.mkString("\n") + "\n"
    val bodyBytes = body.getBytes(UTF_8)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = new java.net.ServerSocket(
      0, 4, InetAddress.getLoopbackAddress)
    val accepter = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val n = attempts.incrementAndGet()
        try {
          val in = sock.getInputStream
          // Drain the request: headers, then Content-Length body bytes.
          val headers = new StringBuilder
          var prev = 0
          var done = false
          while (!done) {
            val b = in.read()
            if (b < 0) done = true
            else {
              headers.append(b.toChar)
              if (b == '\n' && prev == '\n') done = true
              if (b != '\r') prev = b
            }
          }
          val clen = """(?i)content-length:\s*(\d+)""".r
            .findFirstMatchIn(headers).map(_.group(1).toInt).getOrElse(0)
          var read = 0
          while (read < clen && in.read() >= 0) read += 1
          val outStream = sock.getOutputStream
          if (n == 1) {
            // Chunked response that dies after half the body WITHOUT
            // the terminal 0-chunk: unambiguous premature EOF — the
            // client cannot mistake it for a complete stream.
            val half = bodyBytes.length / 2
            outStream.write(
              ("HTTP/1.1 200 OK\r\n" +
                "Content-Type: application/x-ndjson\r\n" +
                "Transfer-Encoding: chunked\r\n\r\n" +
                half.toHexString + "\r\n").getBytes(UTF_8))
            outStream.write(bodyBytes, 0, half)
            outStream.write("\r\n".getBytes(UTF_8))
          } else {
            outStream.write(
              ("HTTP/1.1 200 OK\r\n" +
                "Content-Type: application/x-ndjson\r\n" +
                s"Content-Length: ${bodyBytes.length}\r\n" +
                "Connection: close\r\n\r\n").getBytes(UTF_8))
            outStream.write(bodyBytes)
          }
          outStream.flush()
        } finally sock.close()
      } catch { case _: java.io.IOException => () }
    })
    accepter.setDaemon(true); accepter.start()
    try {
      val url = s"http://127.0.0.1:${server.getLocalPort}"
      val spool = java.nio.file.Files.createTempDirectory("graft_http_drop")
      val env = new HttpGraphTransport(url, "resoto", None, spool.toString,
        connectTimeoutMs = 2000, readTimeoutMs = 2000)
        .envelopes(spark, None)
      assert(attempts.get() == 2, s"expected 1 retry, saw ${attempts.get()} attempts")
      assert(env.count() == 5)
      assert(GraphSource.nodes(env).count() == 3)
      assert(GraphSource.edges(env).count() == 2)
    } finally server.close()
  }

  test("a non-200 response fails loudly, not with a truncated graph") {
    withServer(500) { (url, _) =>
      val spool = java.nio.file.Files.createTempDirectory("graft_http")
      val ex = intercept[RuntimeException] {
        new HttpGraphTransport(url, "resoto", None, spool.toString)
          .envelopes(spark, None)
      }
      assert(ex.getMessage.contains("HTTP 500"))
    }
  }
}
