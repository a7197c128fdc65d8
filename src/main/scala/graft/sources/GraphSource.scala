package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph sources (P1/P2): the Spark engine consumes a resource graph as
  * a stream of JSON node/edge envelopes. The in-process collector
  * (reference: collect_plugins.py:30-68) and the remote graph-search
  * source (reference: remote_graph.py:38-91) both reduce to "a location
  * holding JSONL envelopes plus an optional search filter":
  *
  *  - in-process → the collector dumps its graph as JSONL and we read it
  *    (schema-on-read, one pass, splittable at scale);
  *  - remote → resoto-core evaluates the search server-side and streams
  *    envelopes; the dump of that stream is the same JSONL. The search
  *    expression is the source's filter pushdown: the subset we support
  *    locally (`is(kind)` with an optional `-[min:]->` traversal) is
  *    applied as a Catalyst filter + bounded traversal so results match
  *    the server-side evaluation (reference default: `is(graph_root)
  *    -[2:]->`, remote_graph.py:62).
  */
object GraphSource {

  /** Read a JSONL envelope dump; nodes and edges share one stream
    * (reference: batch_stream.py:70-78 chains them). */
  def readEnvelopes(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def nodes(envelopes: DataFrame): DataFrame =
    envelopes.filter(col("type") === "node")

  def edges(envelopes: DataFrame): DataFrame =
    envelopes.filter(col("type") === "edge")

  /** The supported graph-search subset: `is(<kind>)` optionally followed
    * by `-[<min>:]->` (descendants at depth >= min). */
  final case class Search(kind: String, minDepth: Option[Int])

  private val SearchRe =
    """\s*is\(([\w.]+)\)\s*(?:-\[(\d+):\]->)?\s*""".r

  def parseSearch(expr: String): Option[Search] = expr match {
    case SearchRe(kind, null) => Some(Search(kind, None))
    case SearchRe(kind, min) => Some(Search(kind, Some(min.toInt)))
    case _ => None
  }

  /** Apply a parsed search against node envelopes:
    *  - `is(k)` filters nodes of kind k (pushed to the scan);
    *  - `is(k) -[m:]->` returns nodes reachable from kind-k roots at
    *    depth >= m via default edges — a bounded iterative frontier join
    *    (same shape as q_graph_reach; maxDepth caps the iteration).
    */
  def evaluate(envelopes: DataFrame, search: Search, maxDepth: Int = 8): DataFrame = {
    val n = nodes(envelopes)
    val matching = n.filter(col("reported.kind") === search.kind)
    search.minDepth match {
      case None => matching
      case Some(minDepth) =>
        require(minDepth <= maxDepth,
          s"minDepth $minDepth exceeds maxDepth $maxDepth")
        val roots = matching.select(col("id").as("node"), lit(0).as("depth"))
        var frontier = roots
        var reached = roots
        for (depth <- 1 to maxDepth) {
          val e = edges(envelopes)
            .select(col("from").as("src"), col("to").as("dst"))
          // distinct per level bounds the frontier at the node count on
          // graphs with converging paths or cycles.
          frontier = frontier.join(e, frontier("node") === e("src"))
            .select(e("dst").as("node"), lit(depth).as("depth"))
            .distinct()
          reached = reached.unionByName(frontier)
        }
        val wanted = reached.groupBy("node").agg(min(col("depth")).as("d"))
          .filter(col("d") >= minDepth)
          .select("node")
        n.join(wanted, n("id") === wanted("node")).drop("node")
    }
  }
}
