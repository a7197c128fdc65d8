package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** One `<path> <op> <value>` predicate over `reported.*` properties
    * (the filter part of the resoto search grammar the reference
    * forwards server-side, remote_graph.py:62). */
  final case class PropFilter(path: String, op: String, value: String)

  /** The supported graph-search subset: `is(<kind>)`, optionally
    * `and <prop> <op> <value>` conjunctions, optionally followed by a
    * traversal `-[<min>:]->` (unbounded) or `-[<min>:<max>]->`
    * (bounded): nodes whose shortest distance from a matching root lies
    * in [min, max]. */
  final case class Search(kind: String,
      filters: Seq[PropFilter] = Seq.empty,
      minDepth: Option[Int] = None,
      maxDepth: Option[Int] = None)

  private val TravRe = """(.*?)\s*-\[(\d+):(\d*)\]->\s*$""".r
  private val IsRe = """\s*is\(([\w.]+)\)\s*(.*)""".r
  private val FilterRe =
    """\s*and\s+([\w.]+)\s*(==|!=|>=|<=|=~|>|<)\s*("[^"]*"|\S+)(.*)""".r

  def parseSearch(expr: String): Option[Search] = {
    val (head, minD, maxD) = expr match {
      case TravRe(h, min, "") => (h, Some(min.toInt), None)
      case TravRe(h, min, max) => (h, Some(min.toInt), Some(max.toInt))
      case other => (other, None, None)
    }
    head match {
      case IsRe(kind, rest) =>
        @annotation.tailrec
        def filters(s: String, acc: Seq[PropFilter]): Option[Seq[PropFilter]] =
          s.trim match {
            case "" => Some(acc)
            case FilterRe(path, op, value, tail) =>
              filters(tail, acc :+ PropFilter(path, op,
                value.stripPrefix("\"").stripSuffix("\"")))
            case _ => None
          }
        filters(rest, Seq.empty).map(fs => Search(kind, fs, minD, maxD))
      case _ => None
    }
  }

  private def filterColumn(f: PropFilter): Column = {
    val c = col(s"reported.${f.path}")
    // Numeric literals compare numerically, everything else as string;
    // Catalyst inserts the cast on the column side.
    val v: Column = scala.util.Try(f.value.toLong).toOption
      .map(l => lit(l): Column)
      .orElse(scala.util.Try(f.value.toDouble).toOption.map(d => lit(d): Column))
      .getOrElse(lit(f.value))
    f.op match {
      case "==" => c === v
      case "!=" => c =!= v
      case ">" => c > v
      case ">=" => c >= v
      case "<" => c < v
      case "<=" => c <= v
      case "=~" => c.rlike(f.value)
    }
  }

  /** Apply a parsed search against node envelopes:
    *  - `is(k) and p op v ...` filters nodes of kind k satisfying every
    *    predicate (pushed to the scan);
    *  - a `-[min:max]->` suffix returns nodes whose shortest distance
    *    from a matching root via default edges lies in [min, max] — a
    *    bounded iterative frontier join (same shape as q_graph_reach;
    *    `maxDepth` caps the iteration when the search leaves the upper
    *    bound open).
    */
  def evaluate(envelopes: DataFrame, search: Search, maxDepth: Int = 8): DataFrame = {
    val n = nodes(envelopes)
    val matching = search.filters.foldLeft(
      n.filter(col("reported.kind") === search.kind))(
      (acc, f) => acc.filter(filterColumn(f)))
    search.minDepth match {
      case None => matching
      case Some(minDepth) =>
        val effectiveMax = search.maxDepth.getOrElse(maxDepth)
        require(minDepth <= effectiveMax,
          s"minDepth $minDepth exceeds max depth $effectiveMax")
        val roots = matching.select(col("id").as("node"), lit(0).as("depth"))
        var frontier = roots
        var reached = roots
        for (depth <- 1 to effectiveMax) {
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
          .filter(col("d") >= minDepth && col("d") <= effectiveMax)
          .select("node")
        n.join(wanted, n("id") === wanted("node")).drop("node")
    }
  }
}
