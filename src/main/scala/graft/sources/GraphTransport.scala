package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The remote-graph transport seam (P2) — the boundary the reference
  * puts between the graph-search client and the graph consumer
  * (remote_graph.py:59-66: a `ResotoClient(url, psk).search_graph
  * (search, graph)` yielding one JSON object per node/edge).
  *
  * The engine consumes a transport ONLY through [[envelopes]]: whatever
  * fetches the stream, the result is a node/edge envelope DataFrame
  * that [[GraphSource.evaluateChain]] and the sync pipeline operate on.
  * A live HTTP transport (server URL + pre-shared key + graph name,
  * the reference's RemoteGraphConfig, remote_graph.py:24-32) implements
  * this trait by streaming the search response to a spool location and
  * delegating to [[JsonlDumpTransport]] — no engine code changes.
  * This sandbox has no network egress, so the shipped implementation
  * is the dump-backed one; its semantics (search evaluation +
  * ancestry re-linking) are covered by the q_source_search* gates.
  */
trait GraphTransport {

  /** Stream the node/edge envelopes selected by `search` (server-side
    * evaluation in the reference; [[GraphSource.evaluateChain]] applies
    * the same grammar locally for dump-backed sources). */
  def envelopes(spark: SparkSession, search: Option[String]): DataFrame
}

/** Live remote-graph transport (P2, remote_graph.py:59-66): POST the
  * search expression to the server's graph-search endpoint
  * (`{base}/graph/{graph}/search/graph`, the resource the reference's
  * `ResotoClient.search_graph(search, graph)` drives), parse the
  * ndjson response LINE-incrementally, and read the spooled chunks as
  * a normal envelope stream. The search is evaluated SERVER-side — the
  * whole point of the remote protocol is that the filter is pushed
  * over the wire and only the selected subgraph ever crosses it — so
  * unlike [[JsonlDumpTransport]] no local re-evaluation happens here.
  * `None` maps to the reference collector's default root traversal
  * (remote_graph.py:63). The pre-shared key rides an Authorization
  * header; the reference client derives a signed JWT from the psk,
  * which a production transport would mirror — the header seam is the
  * same either way. Exercised against an in-process loopback server by
  * HttpTransportSpec (this sandbox has no network egress).
  *
  * Spool shape: the response body is never buffered or written whole.
  * Lines stream through a bounded reader into GZIP chunk files rotated
  * at `chunkBytes` of COMPRESSED output, so (a) driver memory is one
  * line + one stream buffer regardless of response size, (b) local
  * scratch holds a compressed fraction of the body (ndjson envelopes
  * gzip at roughly 5-10x), never 1x of it, and (c) a multi-GB search
  * lands as MANY chunk files, which `spark.read.json(dir)` fans out
  * across executors — one non-splittable gzip member per chunk is
  * fine because parallelism comes from chunk COUNT. Closes COVERAGE
  * P2's spool-the-whole-body caveat.
  */
final class HttpGraphTransport(baseUrl: String, graph: String,
    psk: Option[String], spoolDir: String,
    chunkBytes: Long = 128L << 20,
    connectTimeoutMs: Int = 30000,
    readTimeoutMs: Int = 300000,
    retries: Int = 1) extends GraphTransport {

  override def envelopes(spark: SparkSession,
      search: Option[String]): DataFrame = {
    import java.nio.file.Paths
    val expr = search.getOrElse("is(graph_root) -[2:]->")
    // Fresh dir per (graph, search): a retried search must not mix its
    // chunks with a previous attempt's — fetchToSpool wipes it first,
    // which is what makes the retry idempotent.
    // sha256, not hashCode: the fetch WIPES this dir first, so a
    // 32-bit collision between two different (graph, search) pairs
    // sharing a spool root would cross-wipe under concurrent use.
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$graph|$expr".getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
    val spool = Paths.get(spoolDir, s"envelopes_$digest")
    var attempt = 0
    var done = false
    while (!done) {
      try { fetchToSpool(expr, spool); done = true }
      catch {
        // Bounded retry for TRANSPORT failures only (connect/read
        // timeouts, mid-stream drops). Server-reported errors (non-200)
        // raise RuntimeException and fail loudly without retry — the
        // server already answered. A truncated stream never survives:
        // either the retry rebuilds the spool from scratch or the
        // exception propagates.
        case e: java.io.IOException if attempt < retries => attempt += 1
      }
    }
    GraphSource.readEnvelopes(spark, spool.toString)
  }

  /** One full search → spool attempt. Throws IOException on any
    * transport failure; leaves no open handles behind (the in-progress
    * gzip chunk is closed on the error path too). */
  private def fetchToSpool(expr: String,
      spool: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    val conn = new java.net.URL(
      s"$baseUrl/graph/$graph/search/graph")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    // A hung server must not block the caller forever mid-connect or
    // mid-readLine: bound both phases (read timeout also covers
    // waiting for the status line).
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "text/plain")
    conn.setRequestProperty("Accept", "application/x-ndjson")
    psk.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
    val out = conn.getOutputStream
    try out.write(expr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val code = conn.getResponseCode
    if (code != 200)
      sys.error(s"graph search failed: HTTP $code from $baseUrl " +
        s"(graph=$graph)")
    graft.sink.SnapshotSwap.rm(spool)
    Files.createDirectories(spool)
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      conn.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    var chunkOut: java.io.OutputStream = null
    try {
      var chunkIdx = 0
      var chunkFile: java.io.File = null
      def rotate(): Unit = {
        if (chunkOut != null) chunkOut.close()
        chunkFile = spool.resolve(f"part-$chunkIdx%05d.jsonl.gz").toFile
        chunkOut = new java.util.zip.GZIPOutputStream(
          new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(chunkFile), 1 << 16))
        chunkIdx += 1
      }
      rotate()
      var line = reader.readLine()
      while (line != null) {
        // Rotate on the COMPRESSED size already flushed to disk — the
        // cap bounds chunk files, not pre-compression input (stream
        // buffers lag it, so chunks may overshoot slightly; the cap's
        // intent is bounded files, not an exact ceiling).
        if (chunkFile.length() >= chunkBytes) rotate()
        chunkOut.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        chunkOut.write('\n')
        line = reader.readLine()
      }
      chunkOut.close()
      chunkOut = null
    } finally {
      // Error path: close the in-progress chunk too, or its handle
      // (and gzip buffer) leaks on every failed attempt.
      if (chunkOut != null)
        try chunkOut.close() catch { case _: java.io.IOException => () }
      reader.close()
    }
  }
}

/** Transport over a JSONL envelope dump — the in-process collector's
  * output format AND the spooled form of a remote search response
  * (batch_stream.py:70-78 chains nodes then edges into one stream the
  * same way). When a search expression is given it is evaluated
  * locally with the full chain grammar; edges are passed through so a
  * downstream sync can still key and link the selected nodes. */
final class JsonlDumpTransport(path: String) extends GraphTransport {
  override def envelopes(spark: SparkSession,
      search: Option[String]): DataFrame = {
    val env = GraphSource.readEnvelopes(spark, path)
    search match {
      case None => env
      case Some(expr) =>
        val chain = GraphSource.parseChain(expr).getOrElse(
          sys.error(s"unparseable search expression: $expr"))
        GraphSource.evaluateChain(env, chain)
          .unionByName(GraphSource.edges(env), allowMissingColumns = true)
    }
  }
}
