package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile summary over an UNBOUNDED long domain — the
  * KLL/Manku-family compactor sketch (Karnin-Lang-Liberty FOCS'16;
  * this implementation is the deterministic uniform-capacity variant
  * of Manku-Rajagopalan-Lindsay, SIGMOD'98), completing the
  * persisted-partial rollup family: q_agg_quantile_rollup's exact
  * count histogram is a mergeable quantile summary ONLY when the value
  * domain is bounded (partial size = distinct values); this sketch
  * bounds the partial at k·log(n/k) values for ANY domain.
  *
  * Structure: level i holds a buffer of values, each representing
  * 2^i input rows. Updates append to level 0; a full level sorts and
  * promotes every other element to level i+1 (weight doubles), keeping
  * an odd leftover in place so total weight is conserved exactly.
  * The kept-index parity ALTERNATES per level per compaction — the
  * deterministic de-biasing (KLL proper flips a coin; a fixed parity
  * drifts one-sided, and an RNG would make partials depend on replay
  * order). Merging concatenates levels then re-compacts — associative
  * over arbitrary merge trees, which is what lets per-day partials
  * land in parquet and weekly reports fold them without re-scanning
  * the log.
  *
  * Guarantee (deterministic worst case): each level-i compaction
  * perturbs any rank by ≤ 2^i, and at most n/(k·2^i) compactions occur
  * at level i, so every rank estimate is within n·H/k of exact, with
  * H = ceil(log2(2n/k)) levels. NOTE H grows with n: at k = 256 the
  * bound stays under n/8 only while H ≤ 32, i.e. n ≲ 2^38 — beyond
  * that the honest bound is n·H/k itself, which is exactly what the
  * gates' audit computes (kllAudit derives H from n_events via integer
  * bit-length, so the bound is worst-case-valid at ANY n, including
  * the ~10^12-rows/week scale the rollup targets). Observed error is
  * far tighter (pinned in EdgeCasesSpec). Estimates themselves are
  * merge-order-DEPENDENT (like every sketch), which is why the gate
  * hashes guarantee-derived rank-bound booleans, never raw estimates —
  * the q_agg_approx_quantile discipline.
  *
  * (cf. resotodatalink has no sketch ops; beyond-reference component.)
  */
final class KllState(val k: Int) {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  val parity: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)
  var n: Long = 0L

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) {
      levels += mutable.ArrayBuffer.empty[Long]
      parity += false
    }

  /** Sort level i, promote alternate elements (weight doubles), keep
    * an odd leftover in place. Cascades if the next level overflows. */
  private def compact(i: Int): Unit = {
    val buf = levels(i)
    if (buf.length <= k) return
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val keepOdd = parity(i)
    parity(i) = !keepOdd
    ensureLevel(i + 1)
    val up = levels(i + 1)
    val pairs = arr.length & ~1
    var j = if (keepOdd) 1 else 0
    while (j < pairs) { up += arr(j); j += 2 }
    buf.clear()
    if (pairs < arr.length) buf += arr(arr.length - 1)
    if (up.length > k) compact(i + 1)
  }

  def add(v: Long): Unit = {
    levels(0) += v
    n += 1L
    if (levels(0).length > k) compact(0)
  }

  def mergeIn(other: KllState): Unit = {
    ensureLevel(other.levels.length - 1)
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    i = 0
    while (i < levels.length) { compact(i); i += 1 }
  }

  /** Smallest value whose cumulative weight reaches ceil(p% · n). */
  def quantile(pPct: Int): Long = {
    require(n > 0, "quantile of an empty sketch")
    val items = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = (total * pPct + 99L) / 100L
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeInt(levels.length)
    var i = 0
    while (i < levels.length) {
      out.writeBoolean(parity(i))
      out.writeInt(levels(i).length)
      levels(i).foreach(out.writeLong)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val st = new KllState(in.readInt())
    st.n = in.readLong()
    val nl = in.readInt()
    st.levels.clear(); st.parity.clear()
    var i = 0
    while (i < nl) {
      val p = in.readBoolean()
      val m = in.readInt()
      val buf = mutable.ArrayBuffer.empty[Long]
      var j = 0
      while (j < m) { buf += in.readLong(); j += 1 }
      st.levels += buf
      st.parity += p
      i += 1
    }
    st
  }
}

/** Shared plumbing of the two KLL aggregates (stream-update and
  * persisted-partial re-aggregation) — the MisraGriesAggLike pattern. */
trait KllAggLike extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  def k: Int

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllState): Any = buf.serialize()

  override def serialize(buf: KllState): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false
}

/** kll_agg(longOrDoubleCol, k): build a KLL summary from raw values.
  * DOUBLE measures ride the SAME long sketch through the
  * order-preserving sortable-bits mapping ([[KllSketch.doubleToSortableLong]]):
  * rank structure is preserved exactly, so every guarantee and every
  * merge law holds unchanged — read estimates back with
  * kll_quantile_dbl. Long inputs are stored as-is (existing long
  * gates byte-identical). */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggLike {

  require(k >= 8, s"kll_agg needs k >= 8, got $k")

  // Analysis-time validation (not a lazy executor-side sys.error): a
  // mistyped column (INT, DECIMAL, ...) must fail fast on the driver
  // with the expression named, not surface as an opaque task failure
  // on the first update.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_agg needs a BIGINT or DOUBLE column, got $other")
    }

  private lazy val toLong: Any => Long = child.dataType match {
    case DoubleType =>
      v => KllSketch.doubleToSortableLong(v.asInstanceOf[Double])
    case LongType => _.asInstanceOf[Long]
    case other =>
      sys.error(s"kll_agg needs a BIGINT or DOUBLE column, got $other")
  }

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.add(toLong(v))
    buf
  }

  override def prettyName: String = "kll_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
}

/** kll_merge(sketchCol, k): fold PERSISTED binary summaries — the
  * hll_union_agg analogue, so weekly reports aggregate per-day parquet
  * partials without touching the raw log. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggLike {

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(KllState.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def prettyName: String = "kll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** kll_quantile(sketch, pPct): the p-th percentile estimate read off a
  * serialized summary. Eval-only (CodegenFallback): it runs on
  * report-grain rows (one per week/group), never in a corpus scan. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(sk: Any, p: Any): Any =
    KllState.deserialize(sk.asInstanceOf[Array[Byte]])
      .quantile(p.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** kll_quantile_dbl(sketch, pPct): percentile read for a sketch built
  * from a DOUBLE column — same rank walk, then the sortable-bits
  * inverse mapping back to the original double value. */
case class KllQuantileDbl(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile_dbl"

  override protected def nullSafeEval(sk: Any, p: Any): Any =
    KllSketch.sortableLongToDouble(
      KllState.deserialize(sk.asInstanceOf[Array[Byte]])
        .quantile(p.asInstanceOf[Int]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileDbl =
    copy(left = newLeft, right = newRight)
}

object KllSketch {
  /** Order-preserving DOUBLE→BIGINT bijection (the parquet/ORC
    * sortable-bits trick): positives keep their IEEE bits (already
    * ordered), negatives flip their magnitude bits so larger-magnitude
    * negatives sort lower, sign bit preserved — x < y ⟺ f(x) < f(y)
    * under SIGNED long comparison (-0.0 < +0.0; NaN canonicalizes
    * above +Inf). The mask formula is an involution, so the same
    * expression inverts it. */
  def doubleToSortableLong(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  def sortableLongToDouble(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & 0x7fffffffffffffffL))

  /** Register kll_agg(col, k) / kll_merge(sketches, k) /
    * kll_quantile(sketch, pPct) / kll_quantile_dbl(sketch, pPct).
    * k and pPct must be int literals — validated HERE at registration
    * for all four (a mistyped p used to surface as an eval-time
    * ClassCastException). */
  def register(spark: SparkSession): Unit = {
    def lit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => sys.error(s"kll k/p must be an int literal, got $other")
    }
    def pLit(e: Expression): Expression = {
      val p = lit(e)
      require(p >= 0 && p <= 100, s"kll percentile must be 0..100, got $p")
      e
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_agg", exprs => KllAgg(exprs.head, lit(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_merge", exprs => KllMergeAgg(exprs.head, lit(exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantile", exprs => KllQuantile(exprs.head, pLit(exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantile_dbl", exprs => KllQuantileDbl(exprs.head, pLit(exprs(1))),
      "built-in")
  }
}
