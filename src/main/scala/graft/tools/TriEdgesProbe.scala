package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the canonical co-purchase edge BUILD (not part
  * of the driver contract): triEdges' historical self-join + distinct
  * form vs copurchaseEdges' basket-explode form (one orderkey
  * exchange, pairs generated map-side), both materialized through the
  * triangle gate's repartition+persist protocol. The two forms emit
  * the same distinct (s < t) edge set by construction. */
object TriEdgesProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    def selfJoin: DataFrame = {
      val li = graft.Tables.t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("s"), col("b.pk").as("t"))
        .distinct()
    }
    def basket: DataFrame =
      graft.queries.GraphQueries.copurchaseEdges(s, d, "1999-01-01")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val e = df.repartition(s.sparkContext.defaultParallelism, col("s"))
        .persist()
      val n = e.count()
      val dt = (System.nanoTime() - t0) / 1e9
      e.unpersist(blocking = true)
      println(f"[tri] $label%-9s rows=$n%8d  $dt%6.3f s")
    }

    time("warm-sj")(selfJoin); time("warm-bk")(basket)
    for (_ <- 1 to 3) { time("selfjoin")(selfJoin); time("basket")(basket) }
    s.stop()
  }
}
