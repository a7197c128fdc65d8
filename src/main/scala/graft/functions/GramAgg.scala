package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact centered Gram (scatter) matrix as ONE mergeable aggregate —
  * the distributed half of PCA: G[i][j] = Σ_rows (x_i−μ_i)(x_j−μ_j)
  * over integer-quantized vectors, with μ a plan-embedded integer
  * literal (a dim-sized driver scalar). State is the upper triangle
  * (dim·(dim+1)/2 longs ≈ 16 KB at dim 64) — fixed-size through every
  * exchange regardless of corpus size, and merge is elementwise
  * addition (associative/commutative, any merge tree). The alternative
  * composition — posexplode into (i, j) pairs — shuffles N·dim²/2 rows
  * for a dim²-sized answer; this is the canonical case for a custom
  * TypedImperativeAggregate (the brief's extension ladder).
  * All-integer arithmetic: |x−μ| ≤ ~2^11 at milli-quantization, so
  * entries stay exact far past 2^50 rows — and identical in any
  * engine, which is what lets the eigenvector side-file oracle verify
  * the projections bit-for-bit.
  *
  * (cf. resotodatalink has no linear-algebra ops; beyond-reference.)
  */
case class GramAgg(
    child: Expression,
    mu: Array[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val dim = mu.length
  private val tri = dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData]
      // Fail loudly on a ragged vector: silently zero-padding a short
      // row would contribute (0-mu)-centered phantom components and
      // corrupt the scatter matrix without any signal.
      require(xs.numElements() == dim,
        s"gram_agg: vector length ${xs.numElements()} != mean length $dim")
      val c = new Array[Long](dim)
      var i = 0
      while (i < dim) { c(i) = xs.getLong(i) - mu(i); i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        val ci = c(i)
        var j = i
        while (j < dim) {
          buf(k) += ci * c(j)
          j += 1; k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < tri) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(tri * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(tri)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {
  /** Register gram_agg(v, <array<bigint> literal μ>) — the μ literal is
    * unpacked once at plan build (the km_assign protocol). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_agg", exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val mu = exprs(1) match {
          case Literal(v: ArrayData, ArrayType(LongType, _)) =>
            v.toLongArray()
          case other => sys.error(
            s"gram_agg mu must be an array<bigint> literal, got $other")
        }
        GramAgg(exprs.head, mu)
      }, "built-in")
}
