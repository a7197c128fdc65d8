package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature accumulator: per group, the element-wise minimum of
  * `numHashes` xxhash64 values (seeded 0..n-1) over the input shingles.
  *
  * One typed Aggregator column replaces `numHashes` separate
  * `min(xxhash64(lit(i), s))` aggregate expressions: the shingle bytes
  * are hashed once per seed in a tight JVM loop against a single
  * long[32] buffer, instead of widening the aggregation buffer to 32
  * independent expression slots.
  */
object MinHashAggregator extends Aggregator[String, Array[Long], Seq[Long]] {

  val numHashes = 32

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], s: String): Array[Long] = {
    val u = UTF8String.fromString(s)
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), i.toLong)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
