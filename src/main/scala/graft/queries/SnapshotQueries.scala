package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.sink.SnapshotSwap

/** q_swap_snapshot: the staging→prod atomic swap (P12) exercised
  * end-to-end — write a per-status orders rollup through the swap
  * protocol twice (so the second swap really replaces a live prod dir),
  * then answer the query from the prod path. The oracle recomputes the
  * same rollup directly: prod must equal the last completed sync
  * (reference contract: sql.py:129-159, tests/sql_test.py:54-67).
  */
object SnapshotQueries {

  import CoreQueries.Q

  private def rollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice") * 100).cast("long").as("sum_price_e2"))

  val entries: Map[String, (Q, String)] = Map(
    "q_swap_snapshot" -> ((
      (s: SparkSession, d: String) => {
        // Base dir keyed by the sf dir name so verify (sf0.01) and bench
        // (sf0.1) runs never clobber each other's snapshots.
        val base = s"/tmp/graft_snap_${graft.Tables.dirTag(d)}"
        // First sync: stale snapshot (limited); second sync: full data.
        SnapshotSwap.write(rollup(s, d).limit(1), base, "orders_rollup")
        SnapshotSwap.writeAndRead(s, rollup(s, d), base, "orders_rollup")
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        |CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_price_e2
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
