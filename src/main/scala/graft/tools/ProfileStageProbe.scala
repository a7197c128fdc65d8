package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r19 decomposition of q_profile_approx on the CURRENT code: which
  * stage holds the remaining ~2.2 s — the stacked approx census, the
  * audited join against the derived exact artifact, or the gate's
  * fixed overhead. Interleaved min-of-N in one JVM. */
object ProfileStageProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(4)
    def approx: DataFrame =
      graft.queries.ExtraQueries.profilePlan(s, d, exact = false)
        .select(col("col_name"), col("n_distinct").as("nd_approx"))
    def gate: DataFrame = graft.SparkEntry.queries("q_profile_approx")(s, d)
    def auditOnly: DataFrame = {
      // A literal 11-row approx relation: isolates the exact-artifact
      // read + broadcast join + orderBy from the census cost.
      val lits = graft.queries.ExtraQueries.ProfileNumCols.map(_._1) ++
        graft.queries.ExtraQueries.ProfileStrCols
      import s.implicits._
      graft.queries.ExtraQueries.profileAudited(s, d,
        lits.map(n => (n, 1L)).toDF("col_name", "nd_approx"))
    }
    // Hand-rolled census variants to locate the cost inside the
    // stacked shape: the repartition exchange, the explode+hash, or
    // the interpreted HLL aggregate.
    import graft.queries.ExtraQueries.{ProfileNumCols, ProfileStrCols}
    def canon: DataFrame = graft.Tables.t(s, d, "lineitem")
      .select(ProfileNumCols.map { case (nm, c) => c.as(nm) } ++
        ProfileStrCols.map(col): _*)
    def spread(df: DataFrame): DataFrame =
      df.repartition(s.sparkContext.defaultParallelism)
    val numNames = ProfileNumCols.map(_._1)
    def entries = array(
      (numNames.map(nm => struct(col(nm).as("v"),
        when(col(nm).isNotNull, xxhash64(col(nm))).as("h"))) ++
       ProfileStrCols.map(nm => struct(lit(null).cast("long").as("v"),
         when(col(nm).isNotNull, xxhash64(col(nm))).as("h")))): _*)
    def stackedOf(c: DataFrame) = c
      .select(posexplode(entries).as(Seq("gid", "e")))
      .select(col("gid"), col("e.v").as("v"), col("e.h").as("h"))
    def aggOf(st: DataFrame) = st.groupBy("gid").agg(
      count(lit(1)).as("n_rows"), count(col("h")).as("nn"),
      approx_count_distinct(col("h"), 0.02).as("nd"),
      min("v").as("mn"), max("v").as("mx"))
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "approx_census" -> (() => approx),
      "audit_only" -> (() => auditOnly),
      "full_gate" -> (() => gate),
      "scan_only" -> (() => canon),
      "spread_only" -> (() => spread(canon)),
      "stack_nospread" -> (() => stackedOf(canon)),
      "stack_spread" -> (() => stackedOf(spread(canon))),
      "census_nospread" -> (() => aggOf(stackedOf(canon))),
      "census_spread" -> (() => aggOf(stackedOf(spread(canon)))),
      "spreadh_only" -> (() => canon.repartition(
        s.sparkContext.defaultParallelism, col("l_orderkey"))),
      "census_spreadh" -> (() => aggOf(stackedOf(canon.repartition(
        s.sparkContext.defaultParallelism, col("l_orderkey"))))))
    // Warm all paths.
    stages.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { _ =>
      stages.foreach { case (nm, f) =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(nm) = math.min(best.getOrElse(nm, 1e9), dt)
        println(f"$nm,run=$dt%.3f")
      }
    }
    println(best.toSeq.sortBy(_._1)
      .map { case (n, v) => f"$n=min $v%.3f" }.mkString("  "))
    s.stop()
  }
}
