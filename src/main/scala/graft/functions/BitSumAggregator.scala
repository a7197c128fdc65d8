package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash bit-vector accumulator: for each input 64-bit hash, adds +1
  * to position i when bit i is set and -1 otherwise; the final buffer is
  * the per-group signed bit-count vector whose signs form the simhash
  * signature.
  *
  * One typed Aggregator column replaces 64 separate
  * `sum(CASE WHEN shiftright(h,i)&1 ...)` aggregate expressions — that
  * formulation generates enormous per-group update code (64 branches per
  * row) and scales the aggregation hash-map entry count with the
  * expression count; this buffer is a single int[64] updated in a tight
  * loop.
  */
object BitSumAggregator extends Aggregator[Long, Array[Int], Seq[Int]] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      buf(i) += (((h >>> i) & 1L).toInt << 1) - 1 // +1 if bit set else -1
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}
