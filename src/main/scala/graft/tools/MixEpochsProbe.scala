package graft.tools

import org.apache.spark.sql.functions._

/** r19: why is q_mix_epochs ~6x SLOWER at 32 cores than at 8
  * (driver scaling ratio 0.17)? Decompose: the census checkpoint's
  * partition count (does AQE coalesce the checkpointed plan?), the
  * checkpoint materialization, and the report tail. */
object MixEpochsProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(5)
    (1 to runs).foreach { r =>
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val census = graft.Tables.t(s, d, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("avail"))
        .localCheckpoint()
      val t1 = System.nanoTime()
      val nparts = census.rdd.getNumPartitions
      val tot = census.agg(sum("avail").as("total"),
        count(lit(1)).as("n_sources"))
      census.crossJoin(broadcast(tot))
        .select(col("source"), expr("total * 2 div n_sources").as("rq"))
        .orderBy("source")
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"run=$r ckpt=${(t1 - t0) / 1e9}%.3f parts=$nparts " +
        f"tail=${(t2 - t1) / 1e9}%.3f")
    }
    s.stop()
  }
}
