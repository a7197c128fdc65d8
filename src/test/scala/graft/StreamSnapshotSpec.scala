package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.SnapshotSwap

/** The reference's collect→batch→sync loop run CONTINUOUSLY: a file
  * stream drives foreachBatch, each micro-batch publishing a fresh
  * snapshot through the atomic manifest commit (P6 + P12 composed).
  * Readers resolving the pointer between batches always see a complete
  * snapshot; the previous snapshot survives its own commit (in-flight
  * readers) and is swept by the commit after. */
class StreamSnapshotSpec extends SparkSpecBase {

  test("streaming micro-batches publish atomic manifest snapshots") {
    val s = spark
    import s.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ss_src").toString
    val base = java.nio.file.Files.createTempDirectory("graft_ss_base").toString

    // Three source files → AvailableNow replays them as micro-batches
    // (maxFilesPerTrigger=1 forces one batch per file); three batches
    // so the sweep branch of the retention contract actually executes.
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((4L, "d")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)

    val schema = s.read.parquet(src).schema
    val versions = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // Publish the running total as this batch's snapshot (the sync
        // contract: each publish is a complete table, not a delta).
        versions += SnapshotSwap.writeManifested(
          batch.sparkSession.read.parquet(src), base, "t")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def dirName(p: String) = new java.io.File(p).getName
    assert(versions.length >= 3, versions)
    assert(versions.distinct.length == versions.length,
      s"snapshot dirs must be immutable+unique: $versions")
    // The pointer resolves to the LAST published snapshot...
    assert(SnapshotSwap.currentSnapshot(base, "t")
      .contains(dirName(versions.last)))
    // ...whose contents are the complete final table.
    val rows = SnapshotSwap.readManifested(s, base, "t")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 3L, 4L))
    // Retention contract: the directly-previous snapshot survives the
    // last commit for its in-flight readers; older ones are swept.
    val live = new java.io.File(base).list().toSet
      .filter(_.startsWith("_snap_t-"))
    assert(live.contains(dirName(versions.last)))
    assert(live.contains(dirName(versions(versions.length - 2))),
      s"previous snapshot must be retained through the commit: $live")
    assert(!live.contains(dirName(versions(versions.length - 3))),
      s"older snapshots must be swept by the next commit: $live")
  }
}
