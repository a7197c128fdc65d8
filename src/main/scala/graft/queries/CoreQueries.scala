package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Core relational query surface (SURVEY.md §2.2): scans, projections,
  * filters, struct flatten, link joins, aggregations, top-k, sort/limit,
  * union. Each entry pairs a DataFrame program with a DuckDB oracle over
  * the same parquet tables. Every query carries a total ORDER BY so the
  * driver's hash compare is deterministic.
  *
  * Scale notes (100 TB): all plans here are single-shuffle shapes —
  * scans with pushed filters + pruned columns, hash aggregates with
  * map-side partials, and joins that broadcast the dimension side
  * (nation/region are KB-sized at any scale factor).
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Each value = (spark program, duckdb oracle sql). */
  val entries: Map[String, (Q, String)] = Map(

    // P14's at-rest format read back: full-width parquet scan.
    "q_scan_parquet" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber"),
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber")),

    // Column projection — ReadSchema on the scan must be exactly 3 cols.
    "q_project" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")),

    // Project-to-known-schema, missing columns padded with typed nulls
    // (reference semantics: sql.py:236-237).
    "q_project_pad" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"),
            lit(null).cast("string").as("c_comment"),
            lit(null).cast("double").as("c_score"))
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_comment,
        |CAST(NULL AS DOUBLE) AS c_score FROM customer ORDER BY c_custkey""".stripMargin)),

    // Predicate filter — must appear as PushedFilters on the parquet scan.
    "q_filter" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Nested-envelope flatten (P8): build the reference's node envelope
    // shape {reported:{...}, ancestors:{...}} then lift it back to a flat
    // row — a pure projection, no shuffle (reference: sql.py:228-240).
    "q_flatten_struct" -> ((
      (s: SparkSession, d: String) => {
        val env = t(s, d, "customer").select(
          struct(
            col("c_custkey").cast("string").as("id"),
            col("c_name").as("name"),
            col("c_acctbal").as("acctbal")).as("reported"),
          struct(struct(col("c_mktsegment").as("id")).as("reported")).as("segment"))
        env.select(
          col("reported.id").as("_id"),
          col("reported.name").as("name"),
          col("reported.acctbal").as("acctbal"),
          col("segment.reported.id").as("segment"))
          .orderBy("_id")
      },
      """SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name AS name,
        |c_acctbal AS acctbal, c_mktsegment AS segment
        |FROM customer ORDER BY _id""".stripMargin)),

    // Entity -> link -> entity join chain with dimension broadcast:
    // revenue per nation. nation/region are broadcast (dimension-sized at
    // every scale factor); lineitem<->orders is the only real shuffle.
    // Money sums are emitted as round(sum*1e4) BIGINT so the double
    // summation-order difference vs DuckDB can never flip a rounded digit.
    "q_join_link" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = broadcast(t(s, d, "nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 1e4)
              .cast("long").as("revenue_e4"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      """SELECT n_name,
        |CAST(round(sum(l_extendedprice * (1 - l_discount)) * 1e4) AS BIGINT) AS revenue_e4,
        |CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Semi join: customers having at least one order (exists).
    "q_join_semi" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // Anti join (orphan detection): customers with no finished order.
    // The filtered right side keeps the result non-vacuous at every SF.
    "q_join_anti" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)),

    // Hash aggregate with map-side partials (TPC-H Q1 shape). min/max of
    // doubles are order-independent; sums are integer-scaled.
    "q_agg_group" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("cnt"),
            round(sum("l_quantity") * 100).cast("long").as("sum_qty_e2"),
            round(sum("l_extendedprice") * 100).cast("long").as("sum_price_e2"),
            min("l_quantity").as("min_qty"),
            max("l_extendedprice").as("max_price"))
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |CAST(count(*) AS BIGINT) AS cnt,
        |CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_e2,
        |CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_e2,
        |min(l_quantity) AS min_qty,
        |max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Distinct projection (edge-kind discovery analogue:
    // collect_plugins.py:44-47) + per-group distinct count.
    "q_agg_distinct" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(countDistinct("o_orderpriority").as("n_prio"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
        |CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Top-k per group via ranking window (largest-group selection
    // analogue: batch_stream.py:51-56).
    "q_topk_group" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, d, "part")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("p_brand", "p_partkey", "p_retailprice", "rn")
          .orderBy("p_brand", "rn")
      },
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin)),

    // Global sort + limit — Spark runs this as TakeOrderedAndProject
    // (per-partition top-N + merge), no full sort at scale.
    "q_sort_limit" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // Heterogeneous union into one stream (batch_stream.py:70-78 chain).
    "q_union" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey").as("id"), lit("customer").as("src"))
        val su = t(s, d, "supplier")
          .select(col("s_suppkey").as("id"), lit("supplier").as("src"))
        c.unionByName(su).orderBy("src", "id")
      },
      """SELECT c_custkey AS id, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin)),

    // Six-table star join (the TPC-H Q5 "local supplier volume" shape):
    // fact⋈fact lineitem⋈orders under a pushed-down date slice, two
    // dimension hops to customer/supplier, the local-supplier predicate
    // c_nationkey = s_nationkey riding the supplier join, and the tiny
    // nation/region dims explicitly broadcast. This is the planner's
    // classic join-reorder + broadcast showcase: the date filter reaches
    // the orders parquet scan (plan-gated PushedFilters), size-based
    // planning broadcasts what is dimension-sized and shuffles what
    // grows (the r7 100x relational soak's plan-flip posture), and the
    // 5-row result sort is free. Revenue is exact integer cents —
    // per-row round to cents BEFORE the sum, so the aggregation is
    // integer-associative in any engine and partition order.
    "q_join_star" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(expr(
            "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)"))
            .as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue_cents").desc, col("n_name"))
      },
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin))
  )
}
