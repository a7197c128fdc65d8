package graft

/** State-store-provider independence (VERDICT r10 #7): at 100 TB the
  * streaming family runs on the RocksDB provider (larger-than-heap
  * state, restart tolerance, changelog checkpointing); the gates
  * default to the HDFS-backed in-memory store only because a finite
  * AvailableNow run never amortizes RocksDB's native per-store open
  * costs. This pins the posture flip as a pure CONFIG seam: the
  * representative stateful gate (q_stream_session — real session-window
  * merge state in the store) must produce byte-identical results under
  * both providers. The seam is `graft.stream.state.provider` (sysprop,
  * read by withStreamGateConfs) / SPARK_GRAFT_STREAM_STATE_PROVIDER
  * (env, for bench A/B). */
class RocksDbStateSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val PropKey = "graft.stream.state.provider"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("q_stream_session is identical under the RocksDB state store") {
    val default = SparkEntry.queries("q_stream_session")(spark, dir).collect()
    assert(default.nonEmpty)
    // The memory sink registers its result as a temp view named by the
    // gate; drop it so the RocksDB run starts clean.
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_ses_"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    System.setProperty(PropKey, RocksDb)
    try {
      val rocks = SparkEntry.queries("q_stream_session")(spark, dir).collect()
      assert(rocks.length == default.length,
        s"row count differs: rocksdb ${rocks.length} vs ${default.length}")
      assert(rocks.map(_.toString).sorted
        .sameElements(default.map(_.toString).sorted),
        "q_stream_session results differ between state store providers")
    } finally System.clearProperty(PropKey)
  }
}
