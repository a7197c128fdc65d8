package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Constrained-memory resilience probe: run the heaviest gate queries
  * against the 10x soak corpus under a deliberately small heap (launch
  * with e.g. -Xmx4g) and report wall time, shuffle-spill bytes, and
  * driver heap — evidence that the operators complete by SPILLING and
  * PARTITIONING rather than by assuming executor memory scales with
  * the data. On a 1000-executor cluster the per-task memory budget is
  * fixed no matter how big the input grows; an operator that only
  * works because the test JVM had 48g headroom would be a 100 TB lie.
  * Diagnostic main, not part of the driver contract. */
object ConstrainedSoak {

  private val Heavy = Seq(
    "q_dedup_minhash", "q_corpus_clean", "q_dedup_cluster",
    "q_window_range", "q_embed_pq",
    // Round-8 heavies: the incremental near-dup's candidate verify,
    // the corpus-sized bigram train/score joins, the multi-query BM25
    // head, and the six-table star join.
    "q_dedup_minhash_inc", "q_text_perplexity", "q_text_bm25_multi",
    "q_join_star",
    // Round-9 heavies: the streaming incremental dedup's per-batch
    // anti-joins, the double-write compaction pass, the corpus-vs-
    // bench shingle intersection, and the bloom build + probed join.
    "q_stream_dedup_inc", "q_compact_files", "q_decontaminate_neardup",
    "q_join_bloom",
    // Round-10 heavies: the byte-shingle index + banded verify of the
    // multimodal near-dup, the plane-projection + index probe of the
    // incremental ANN (batch and streaming), the shuffled-regime
    // decontamination, and the double-publish OPTIMIZE cycle.
    "q_multimodal_neardup", "q_embed_ann_inc", "q_stream_ann_inc",
    "q_decontaminate_large", "q_optimize_snapshot",
    // This session's heavies: the token streams of the heavy-hitter
    // pair (global-stream + grouped), the CDC fold over per-batch
    // compactions, BPE's vocab iterations, and the CC/SSSP fixpoints.
    "q_stream_topk", "q_group_topk", "q_stream_cdc", "q_bpe_train",
    "q_graph_cc", "q_graph_sssp",
    // Round-13 heavies: both profile paths (the exact census's Expand
    // and the HLL seam), the packed-key pair mining, the bucketed
    // merge-on-write upsert, the composed IVF+PQ search, and the
    // three-way branch merge's double full outer.
    "q_profile_table", "q_profile_approx", "q_assoc_pairs",
    "q_stream_upsert", "q_embed_ivfpq", "q_snapshot_merge_branch")

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", s"${graft.Tables.scratchRoot}/graft_soak_x10")
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val rt = Runtime.getRuntime
    println(s"heap_max_mb=${rt.maxMemory() / (1 << 20)}")
    println("query,wall_sec,spill_mem_mb,spill_disk_mb,driver_used_mb")
    Heavy.filter(q => only.forall(_.contains(q))).foreach { q =>
      memSpill.set(0L); diskSpill.set(0L)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events drain asynchronously; settle before reading.
      Thread.sleep(500)
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
      println(f"$q,$wall%.2f,${memSpill.get / (1 << 20)}," +
        f"${diskSpill.get / (1 << 20)},$usedMb")
    }
    spark.stop()
  }
}
