package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming variant of the BatchStream contract (P6) with explicit
  * custom state: per-key buffering via flatMapGroupsWithState. Each
  * micro-batch appends incoming elements to the key's buffer and emits
  * every complete batch of `batchSize`; the remainder stays in bounded
  * state (< batchSize elements per key) until later arrivals complete
  * it. This is the same observable contract as the reference's
  * BatchStream (group, bound, emit — batch_stream.py:16-64) under
  * continuous input.
  *
  * State is bounded by construction (remainder < batchSize per key); a
  * production deployment adds a GroupStateTimeout to flush stragglers —
  * the same role as the reference's end-of-stream flush
  * (batch_stream.py:57-64).
  */
object StatefulBatcher {

  final case class Batch(key: String, elems: Seq[Long])

  def batchFn(batchSize: Int)(
      key: String, incoming: Iterator[(String, Long)],
      state: GroupState[Seq[Long]]): Iterator[Batch] = {
    val buf = state.getOption.getOrElse(Seq.empty) ++ incoming.map(_._2)
    val nFull = buf.length / batchSize
    val (full, rest) = buf.splitAt(nFull * batchSize)
    // Drop fully-flushed keys from the store — an empty-but-present
    // entry per key would grow state with distinct-key count forever.
    if (rest.isEmpty) state.remove() else state.update(rest)
    full.grouped(batchSize).map(Batch(key, _))
  }

  /** Append-mode streaming batcher over a keyed stream. */
  def batched(ds: Dataset[(String, Long)], batchSize: Int): Dataset[Batch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        batchFn(batchSize))
  }
}
