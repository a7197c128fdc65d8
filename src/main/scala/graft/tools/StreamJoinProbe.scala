package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throwaway diagnostic: run q_stream_join once and dump per-batch
  * streaming progress so the micro-batch cost breakdown is visible.
  * Not part of the driver contract. */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"PROBE started ${System.nanoTime() / 1e9}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"PROBE batch ${e.progress.batchId} " +
          s"rows=${e.progress.numInputRows} ${e.progress.durationMs}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"PROBE terminated ${System.nanoTime() / 1e9}")
    })
    val name = args.headOption.getOrElse("q_stream_join")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, d)
      val n = df.count()
      println(s"PROBE run$i rows=$n total=${(System.nanoTime() - t0) / 1e9}s")
      Thread.sleep(500)
    }
    spark.stop()
  }
}
