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
  * State is bounded two ways: by construction (remainder < batchSize
  * per key) and in time — a key that stops arriving is flushed as a
  * short final batch after `flushAfterMs` of inactivity via
  * ProcessingTimeTimeout, the streaming analogue of the reference's
  * end-of-stream flush (batch_stream.py:57-64). Without the timeout a
  * quiet key would hold its remainder in the state store forever.
  */
object StatefulBatcher {

  final case class Batch(key: String, elems: Seq[Long])

  val DefaultFlushAfterMs: Long = 300000L // 5 min of key inactivity

  def batchFn(batchSize: Int, flushAfterMs: Long)(
      key: String, incoming: Iterator[(String, Long)],
      state: GroupState[Seq[Long]]): Iterator[Batch] = {
    if (state.hasTimedOut) {
      // Key went quiet: emit the held remainder as a short final batch
      // and drain its state entry.
      val rest = state.getOption.getOrElse(Seq.empty)
      state.remove()
      if (rest.nonEmpty) Iterator.single(Batch(key, rest)) else Iterator.empty
    } else {
      val buf = state.getOption.getOrElse(Seq.empty) ++ incoming.map(_._2)
      val nFull = buf.length / batchSize
      val (full, rest) = buf.splitAt(nFull * batchSize)
      // Drop fully-flushed keys from the store — an empty-but-present
      // entry per key would grow state with distinct-key count forever.
      if (rest.isEmpty) state.remove()
      else {
        state.update(rest)
        state.setTimeoutDuration(flushAfterMs)
      }
      full.grouped(batchSize).map(Batch(key, _))
    }
  }

  /** Append-mode streaming batcher over a keyed stream. */
  def batched(ds: Dataset[(String, Long)], batchSize: Int,
      flushAfterMs: Long = DefaultFlushAfterMs): Dataset[Batch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        batchFn(batchSize, flushAfterMs))
  }
}
