package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2.2 (plus the LLM-data-pipeline
  * extras) is one entry in `queries` with a DuckDB oracle in `oracleSql`.
  * Column names are aliased identically on both sides; every query has a
  * total ORDER BY so the driver's hash compare is deterministic.
  */
object SparkEntry {

  private val groups: Seq[Map[String, (CoreQueries.Q, String)]] = Seq(
    CoreQueries.entries,
    FnQueries.entries,
    GraphQueries.entries,
    SnapshotQueries.entries,
    PipelineQueries.entries,
    ExtraQueries.entries,
    StreamQueries.entries,
    TextQueries.entries,
    VectorQueries.entries)

  private val merged: Map[String, (CoreQueries.Q, String)] = {
    val m = groups.reduce(_ ++ _)
    require(groups.map(_.size).sum == m.size,
      "duplicate query key across groups — an operator would be silently shadowed")
    m
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    merged("q_join_link")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged.map { case (k, (q, _)) => k -> q }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every operator is oracled — the sketch
    * gates emit guarantee-derived deterministic outputs (exact
    * heavy-hitter set / bound-check booleans) instead of raw
    * implementation-specific estimates, so they hash-verify too. */
  def oracleSql: Map[String, String] =
    merged.map { case (k, (_, sql)) => k -> sql }
}
