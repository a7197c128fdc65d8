package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.Flatten
import graft.model.{Model, ModelCompiler}
import graft.sink.{JdbcSink, TableSink}

/** Top-level sync façade — the engine's equivalent of the reference's
  * `collect_sql` / `collect_to_file` entry points
  * (collect_plugins.py:103-152 / :30-68): one call takes an envelope
  * stream + Kind model to a fully-synced, queryable relational layout.
  *
  * Steps (each a module covered by its own spec): route nodes per
  * concrete kind and flatten with ancestry denormalization (P8), key
  * edges by endpoint kinds and split per observed pair (P4/P5/P9),
  * write every table behind the staging→prod swap (P12/P14 — or chunked
  * JDBC inserts with tmp_→prod renames for SQL targets, P10), and
  * register the synced catalog for SQL passthrough (P16).
  */
object Sync {

  /** Build the per-table DataFrames of one sync: kind tables + link
    * tables from observed default edges. */
  def tables(envelopes: DataFrame, model: Model,
      baseKinds: Set[String] = ModelCompiler.defaultBaseKinds)
      : Map[String, DataFrame] = {
    val nodeKinds = envelopes
      .filter(org.apache.spark.sql.functions.col("type") === "node")
      .selectExpr("id", "reported.kind AS kind")
    val keyed = Flatten.keyEdges(envelopes, nodeKinds)
    // Driver-side set of distinct kind PAIRS (bounded by kinds², never
    // by data volume) — it drives table layout, exactly the reference's
    // edge-kind discovery (collect_plugins.py:44-47).
    val observed = Flatten.edgeKinds(keyed).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val kindTables = ModelCompiler.tableKinds(model, baseKinds).map { k =>
      ModelCompiler.tableName(k.fqn) ->
        Flatten.flattenNodes(envelopes, k, model)
    }.toMap
    val linkTables = observed.map { case (f, t0) =>
      ModelCompiler.linkTableName(f, t0) ->
        keyed.filter(s"from_kind = '$f' AND to_kind = '$t0'")
          .select("from_id", "to_id")
    }.toMap
    kindTables ++ linkTables
  }

  /** Sync to parquet dirs behind the snapshot swap and register the
    * catalog; returns table → prod path.
    *
    * Scale shape: the envelope stream is scanned exactly TWICE (once
    * staging nodes partitioned by kind, once keying+staging edges
    * partitioned by kind pair); every per-kind flatten job then reads
    * only its own partition directory (partition pruning), instead of
    * N full input scans for N kinds. */
  def toParquet(spark: SparkSession, envelopes: DataFrame, model: Model,
      baseDir: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    val nodeStage = s"$baseDir/_ingest_nodes"
    val edgeStage = s"$baseDir/_ingest_edges"

    // Scan 1: nodes staged once, partitioned by kind.
    envelopes.filter(col("type") === "node")
      .withColumn("node_kind", col("reported.kind"))
      .write.mode("overwrite").partitionBy("node_kind").parquet(nodeStage)
    val stagedNodes = spark.read.parquet(nodeStage)

    // Scan 2: edges keyed against the staged node->kind map, staged
    // partitioned by kind pair.
    val nodeKinds = stagedNodes.select(col("id"), col("node_kind").as("kind"))
    Flatten.keyEdges(envelopes, nodeKinds)
      .write.mode("overwrite").partitionBy("from_kind", "to_kind")
      .parquet(edgeStage)
    val stagedEdges = spark.read.parquet(edgeStage)

    val observed = stagedEdges.select("from_kind", "to_kind").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    val kindTables = ModelCompiler.tableKinds(model).map { k =>
      // Partition-pruned read: only kind=k files feed this flatten.
      ModelCompiler.tableName(k.fqn) -> Flatten.flattenNodes(
        stagedNodes.filter(col("node_kind") === k.fqn), k, model)
    }.toMap
    val linkTables = observed.map { case (f, t0) =>
      ModelCompiler.linkTableName(f, t0) ->
        stagedEdges.filter(col("from_kind") === f && col("to_kind") === t0)
          .select("from_id", "to_id")
    }.toMap

    val paths = TableSink.writeAll(kindTables ++ linkTables, baseDir)
    TableSink.registerProd(spark, paths)
    paths
  }

  /** Sync to a SQL database over JDBC (staging write + rename swap). */
  def toJdbc(envelopes: DataFrame, model: Model, url: String): Unit =
    JdbcSink.sync(tables(envelopes, model), url)
}
