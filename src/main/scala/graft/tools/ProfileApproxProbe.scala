package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for q_profile_approx's cost structure (not part of the
  * driver contract). The gate = wide HLL aggregate (11
  * approx_count_distinct over the canonicalized lineitem columns) +
  * broadcast join against the cached exact census. Hypothesis: the
  * imperative HLL++ functions switch the whole HashAggregate off
  * whole-stage codegen, so the wide shape pays interpreted dispatch on
  * EVERY agg path. Candidates, interleaved min-of-N in one JVM:
  *   wide    — the shipped shape (profilePlan exact=false, nd only)
  *   wideall — the shipped shape materializing every output column
  *   stackh  — posexplode of xxhash64(col) per column into (gid, h),
  *             then groupBy(gid).agg(approx_count_distinct(h)): ONE
  *             imperative function, codegen'd generate below it
  *   census  — the exact-census read + broadcast join only (should be
  *             noise once the derived artifact exists)
  */
object ProfileApproxProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(4)

    import graft.queries.ExtraQueries.{ProfileNumCols, ProfileStrCols}
    def canon: DataFrame = graft.Tables.t(s, d, "lineitem")
      .select(ProfileNumCols.map { case (nm, c) => c.as(nm) } ++
        ProfileStrCols.map(col): _*)

    def wide: DataFrame = {
      def nd(c: org.apache.spark.sql.Column) = approx_count_distinct(c, 0.02)
      val aggs = ProfileNumCols.map(_._1).flatMap { nm => Seq(
        count(col(nm)).as(s"nn_$nm"), nd(col(nm)).as(s"nd_$nm"),
        min(col(nm)).as(s"mn_$nm"), max(col(nm)).as(s"mx_$nm"))
      } ++ ProfileStrCols.flatMap { nm => Seq(
        count(col(nm)).as(s"nn_$nm"), nd(col(nm)).as(s"nd_$nm"))
      } :+ count(lit(1)).as("n_rows")
      canon.agg(aggs.head, aggs.tail: _*)
    }
    val allNames = ProfileNumCols.map(_._1) ++ ProfileStrCols
    def wideNd: DataFrame = wide.select(
      allNames.map(nm => col(s"nd_$nm")): _*)

    def stackh: DataFrame = {
      val hashes = array(
        (ProfileNumCols.map(_._1) ++ ProfileStrCols).map(nm =>
          when(col(nm).isNotNull, xxhash64(col(nm)))): _*)
      canon.select(posexplode(hashes).as(Seq("gid", "h")))
        .groupBy("gid").agg(approx_count_distinct(col("h"), 0.02)
          .as("nd_approx"))
    }

    def stackfull: DataFrame = {
      val entries = array(
        (ProfileNumCols.map { case (nm, _) => struct(col(nm).as("v"),
          when(col(nm).isNotNull, xxhash64(col(nm))).as("h")) } ++
         ProfileStrCols.map(nm => struct(lit(null).cast("long").as("v"),
           when(col(nm).isNotNull, xxhash64(col(nm))).as("h")))): _*)
      canon.select(posexplode(entries).as(Seq("gid", "e")))
        .select(col("gid"), col("e.v").as("v"), col("e.h").as("h"))
        .groupBy("gid").agg(
          count(lit(1)).as("n_rows"), count(col("h")).as("nn"),
          approx_count_distinct(col("h"), 0.02).as("nd"),
          min("v").as("mn"), max("v").as("mx"))
    }

    def time(label: String)(df: => DataFrame): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[papx] $label%-8s min=${times.min}%6.3f  all=" +
        times.map(t => f"$t%5.2f").mkString(","))
    }

    // Warm the scan + codegen paths once.
    canon.write.format("noop").mode("overwrite").save()
    time("wide")(wideNd)
    time("stackh")(stackh)
    time("stackfull")(stackfull)
    time("wideall")(wide)
    time("canon")(canon)
    time("wide2")(wideNd)
    time("stackfull2")(stackfull)
    println("--- plans ---")
    println("wideNd:")
    wideNd.explain("formatted")
    println("stackh:")
    stackh.explain("formatted")
    s.stop()
  }
}
