package graft.streaming

import scala.collection.mutable

/** Key-grouped batching with a memory watermark (P6) — the observable
  * contract of the reference's BatchStream (reference:
  * batch_stream.py:16-64): elements are grouped by key; a group reaching
  * `batchSize` is emitted; when the total buffered count reaches
  * `watermark`, the largest group is evicted early (:51-56); at
  * end-of-stream every remaining group is flushed (:57-64).
  *
  * Conservation laws (reference tests, tests/batch_stream_test.py:6-19,
  * property-tested in BatchStreamSpec): every element is emitted exactly
  * once; no batch exceeds batchSize; the buffer drains to empty.
  *
  * In the Spark engine this iterator runs per partition
  * (`mapPartitions`) after a `repartition(key)` — each task batches its
  * own key space under a bounded buffer, which is exactly the
  * reference's single-threaded semantics, parallelized by partitioning.
  * The Structured Streaming variant of the same contract is
  * q_stream_batch (windowed grouped counts with a watermark).
  */
object BatchStream {

  def batches[K, V](input: Iterator[(K, V)], batchSize: Int,
      watermark: Int): Iterator[(K, Seq[V])] = {
    require(batchSize > 0, "batchSize must be positive")
    require(watermark >= batchSize, "watermark must be >= batchSize")
    new Iterator[(K, Seq[V])] {
      private val buf = mutable.LinkedHashMap[K, mutable.ArrayBuffer[V]]()
      private var bufTotal = 0
      private var pending: Option[(K, Seq[V])] = None

      private def emit(k: K): (K, Seq[V]) = {
        val vs = buf.remove(k).get
        bufTotal -= vs.length
        (k, vs.toSeq)
      }

      private def advance(): Unit = {
        while (pending.isEmpty && input.hasNext) {
          val (k, v) = input.next()
          val g = buf.getOrElseUpdate(k, mutable.ArrayBuffer[V]())
          g += v
          bufTotal += 1
          if (g.length >= batchSize) pending = Some(emit(k))
          else if (bufTotal >= watermark) {
            // Evict the largest group to bound memory
            // (reference: batch_stream.py:51-56).
            val largest = buf.maxBy(_._2.length)._1
            pending = Some(emit(largest))
          }
        }
        if (pending.isEmpty && buf.nonEmpty) pending = Some(emit(buf.head._1))
      }

      def hasNext: Boolean = {
        if (pending.isEmpty) advance()
        pending.nonEmpty
      }

      def next(): (K, Seq[V]) = {
        if (!hasNext) throw new NoSuchElementException
        val out = pending.get
        pending = None
        out
      }
    }
  }
}
