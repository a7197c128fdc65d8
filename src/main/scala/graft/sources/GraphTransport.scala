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
  * `ResotoClient.search_graph(search, graph)` drives), spool the
  * ndjson envelope response to a local file, and read the spool as a
  * normal envelope stream. The search is evaluated SERVER-side — the
  * whole point of the remote protocol is that the filter is pushed
  * over the wire and only the selected subgraph ever crosses it — so
  * unlike [[JsonlDumpTransport]] no local re-evaluation happens here.
  * `None` maps to the reference collector's default root traversal
  * (remote_graph.py:63). The pre-shared key rides an Authorization
  * header; the reference client derives a signed JWT from the psk,
  * which a production transport would mirror — the header seam is the
  * same either way. Exercised against an in-process loopback server by
  * HttpTransportSpec (this sandbox has no network egress).
  */
final class HttpGraphTransport(baseUrl: String, graph: String,
    psk: Option[String], spoolDir: String) extends GraphTransport {

  override def envelopes(spark: SparkSession,
      search: Option[String]): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val expr = search.getOrElse("is(graph_root) -[2:]->")
    val conn = new java.net.URL(
      s"$baseUrl/graph/$graph/search/graph")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
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
    Files.createDirectories(Paths.get(spoolDir))
    val spool = Paths.get(spoolDir,
      s"envelopes_${Integer.toHexString((graph, expr).hashCode)}.jsonl")
    val in = conn.getInputStream
    try Files.copy(in, spool, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    GraphSource.readEnvelopes(spark, spool.toString)
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
