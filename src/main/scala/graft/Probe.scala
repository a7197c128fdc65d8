package graft

/** Dev harness: time (and optionally explain) a subset of the gate
  * queries against an arbitrary sf dir, without running the whole bench.
  * Usage: runMain graft.Probe <sfDir> [--explain] q1 q2 ...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val explain = args.contains("--explain")
    val names = args.tail.filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEnv.session(cpus)
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-20s $dt%8.3f s")
    }
    spark.stop()
  }
}
