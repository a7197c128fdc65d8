package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming → checkpointed parquet file sink → batch readback: the
  * exactly-once file-sink path a production stream-to-table sync uses
  * (complement of the in-memory sink used by q_stream_batch). */
class StreamFileSinkSpec extends SparkSpecBase {

  test("checkpointed parquet sink lands each record exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val outDir = Files.createTempDirectory("graft_fs_out").toString
    val ckpt = Files.createTempDirectory("graft_fs_ckpt").toString

    val q = input.toDS().toDF("id", "kind")
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData((0L until 50L).map(i => (i, s"k${i % 3}")): _*)
      q.processAllAvailable()
      input.addData((50L until 80L).map(i => (i, s"k${i % 3}")): _*)
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(outDir)
    assert(back.count() == 80)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (0L until 80L))
    assert(back.filter(col("doubled") =!= col("id") * 2).count() == 0)
  }
}
