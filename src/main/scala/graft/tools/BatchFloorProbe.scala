package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the streaming per-batch addBatch floor (r19): what does
  * ONE tiny parquet write action cost in this session — job+task
  * launch, parquet commit, plan analysis — vs the same work through a
  * noop sink, with and without coalesce(1), plus a read-back. The
  * foreachBatch sinks pay this floor per write action per micro-batch,
  * so the floor bounds what overlap/fusion can save. */
object BatchFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val root = s"${graft.Tables.scratchRoot}/graft_floorprobe"
    val tiny = spark.range(125).select(col("id"),
      sha2(col("id").cast("string"), 256).as("h")).localCheckpoint()
    tiny.count()
    def time(label: String, n: Int)(f: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(f)
      val dt = (System.nanoTime() - t0) / 1e9 / n
      println(f"$label,avg_ms=${dt * 1000}%.0f")
    }
    // Warm every path once.
    tiny.write.mode("overwrite").parquet(s"$root/warm")
    tiny.write.format("noop").mode("overwrite").save()
    time("noop_tiny", 10)(_ =>
      tiny.write.format("noop").mode("overwrite").save())
    time("parquet_tiny", 10)(i =>
      tiny.write.mode("overwrite").parquet(s"$root/p$i"))
    time("parquet_tiny_coalesce1", 10)(i =>
      tiny.coalesce(1).write.mode("overwrite").parquet(s"$root/c$i"))
    time("parquet_tiny_agg", 10)(i =>
      tiny.groupBy("h").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$root/a$i"))
    time("readback_tiny", 10)(i =>
      spark.read.parquet(s"$root/c${(i % 10) + 1}").write
        .format("noop").mode("overwrite").save())
    // The same write against /dev/shm scratch, to split fs commit cost
    // from job overhead.
    time("parquet_tiny_shm", 10)(i =>
      tiny.coalesce(1).write.mode("overwrite")
        .parquet(s"/dev/shm/graft_floor/p$i"))
    spark.stop()
  }
}
