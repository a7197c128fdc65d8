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
