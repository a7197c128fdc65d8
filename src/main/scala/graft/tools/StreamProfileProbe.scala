package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for q_stream_profile's per-batch sketch aggregate
  * (not part of the driver contract): the wide 11×hll_sketch_agg
  * one-row shape vs the stacked (gid, v, h) single-sketch shape, over
  * the SAME half-lineitem batch a micro-batch sees. Confirms the
  * ProfileApproxProbe result transfers from HLL++
  * (approx_count_distinct) to the Datasketches imperative aggregate. */
object StreamProfileProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import graft.queries.ExtraQueries.{ProfileNumCols, ProfileStrCols,
      profileCanon}

    // Half of lineitem ≈ one micro-batch of the shared 2-file dump.
    def batch = graft.Tables.t(s, d, "lineitem")
      .filter(col("l_orderkey") % 2 === 0)
    def canon = profileCanon(batch)

    def wide: DataFrame = {
      val aggs = ProfileNumCols.map(_._1).flatMap { nm => Seq(
        count(col(nm)).as(s"nn_$nm"),
        expr(s"hll_sketch_agg($nm)").as(s"sk_$nm"),
        min(col(nm)).as(s"mn_$nm"), max(col(nm)).as(s"mx_$nm"))
      } ++ ProfileStrCols.flatMap { nm => Seq(
        count(col(nm)).as(s"nn_$nm"),
        expr(s"hll_sketch_agg($nm)").as(s"sk_$nm"))
      } :+ count(lit(1)).as("n_rows")
      canon.agg(aggs.head, aggs.tail: _*)
    }

    def stacked: DataFrame = {
      val entries = array(
        (ProfileNumCols.map { case (nm, _) => struct(col(nm).as("v"),
          when(col(nm).isNotNull, xxhash64(col(nm))).as("h")) } ++
         ProfileStrCols.map(nm => struct(lit(null).cast("long").as("v"),
           when(col(nm).isNotNull, xxhash64(col(nm))).as("h")))): _*)
      canon.select(posexplode(entries).as(Seq("gid", "e")))
        .select(col("gid"), col("e.v").as("v"), col("e.h").as("h"))
        .groupBy("gid").agg(
          count(lit(1)).as("n_rows"), count(col("h")).as("nn"),
          expr("hll_sketch_agg(h)").as("sk"),
          min("v").as("mn"), max("v").as("mx"))
    }

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[sp] $label%-8s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    time("warm-w")(wide); time("warm-s")(stacked)
    for (_ <- 1 to 3) { time("wide")(wide); time("stacked")(stacked) }
    s.stop()
  }
}
