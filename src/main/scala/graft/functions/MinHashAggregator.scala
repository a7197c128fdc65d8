package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature accumulator: per group, the element-wise minimum of
  * `numHashes` derived hash values over the input shingle hashes.
  *
  * The shingle is hashed once on the codegen side (xxhash64 column);
  * this aggregator receives that single long and derives the hash
  * family by splitmix64-style avalanche mixing per seed — a standard
  * minhash construction that keeps the typed-aggregation input a
  * primitive (no per-row String materialization) and the buffer one
  * long[32], updated in a tight loop. One Aggregator column replaces 32
  * separate `min(xxhash64(lit(i), s))` aggregate expressions.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {

  val numHashes = 32

  // splitmix64 finalizer: full-avalanche bijective mixing.
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h0: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = mix(h0 + i * 0x9e3779b97f4a7c15L)
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
