package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Misra-Gries buffer mechanics for the two MG aggregates: the
  * stream-update sketch (`MisraGriesTopK`) and the persisted-summary
  * re-aggregator (`MisraGriesMergeAgg`). Both carry the same buffer
  * type (item -> counter map, <= k entries) and the same merge rule,
  * serialization, and output shape — only `update` differs (one
  * consumes raw items, the other whole summaries). */
trait MisraGriesAggLike
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  def k: Int
  def outK: Int

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  protected final def shrinkBy(buf: mutable.HashMap[UTF8String, Long],
      d: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.foreach { case (item, c) =>
      if (c - d <= 0L) dead += item else buf.update(item, c - d)
    }
    dead.foreach(buf.remove)
  }

  /** Mergeable-summaries rule (Agarwal et al., PODS'12): sum counters,
    * then subtract the (k+1)-th largest and drop non-positives — keeps
    * <= k counters while the summed error bound N/(k+1) is preserved
    * across arbitrary merge trees. Keys in `pairs` must be OWNED. */
  protected final def mergePairs(buf: mutable.HashMap[UTF8String, Long],
      pairs: Iterator[(UTF8String, Long)]): Unit = {
    pairs.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      shrinkBy(buf, counts(counts.length - (k + 1)))
    }
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    mergePairs(buf, other.iterator)
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    val top = arr.take(outK)
      .map { case (item, c) => InternalRow(item, c): Any }
    new GenericArrayData(top)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))))

  override def nullable: Boolean = false
}

/** Misra-Gries frequent-items summary as a native Catalyst aggregate —
  * the mergeable heavy-hitters sketch (Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * Scale shape: an exact top-k over tokens is a full wordcount — the
  * exchange carries one row per DISTINCT token (open-domain: at 100 TB
  * that is billions of keys). This aggregate keeps at most k counters
  * per partial state, so the shuffle carries one fixed-size sketch per
  * map partition regardless of input size — the same state-vs-exchange
  * trade as q_approx_distinct (HLL) and q_agg_approx_quantile (KLL/GK),
  * completing the sketch family for the third classic query (frequent
  * items).
  *
  * Guarantees: for every item, est <= true and true - est <= N/k where
  * N is the total count aggregated, preserved across arbitrary merge
  * trees (update uses a batched decrement — subtract the buffer
  * minimum, freeing a slot while dropping >= k units per unit of
  * per-item error; merge uses the mergeable-summaries rule — sum
  * counters, subtract the (k+1)-th largest, drop non-positives) —
  * bounded in `EdgeCasesSpec` against exact counts. Output: the `outK`
  * surviving items with the largest estimates (ties broken by item
  * asc) as an array of (item, est_count) structs.
  *
  * (cf. resotodatalink has no sketch ops; beyond-reference component.)
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MisraGriesAggLike {

  require(k >= 1 && outK >= 1 && outK <= k,
    s"need 1 <= outK <= k, got k=$k outK=$outK")

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None =>
          if (buf.size < k) {
            // Keys must be OWNED copies: eval may return a UTF8String
            // backed by a reused row buffer, and a mutated key corrupts
            // the map silently.
            buf.update(item.clone(), 1L)
          } else {
            // Counter-full decrement step, batched: drop every counter
            // by the minimum so at least one slot frees. Subtracting
            // min (not 1) amortizes the O(k) walk over >= min rows.
            var minC = Long.MaxValue
            buf.valuesIterator.foreach(c => if (c < minC) minC = c)
            shrinkBy(buf, minC)
          }
      }
    }
    buf
  }

  override def prettyName: String = "mg_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

/** Re-aggregation of PERSISTED Misra-Gries summaries — the rollup half
  * of the sketch protocol (the `hll_union_agg` analogue for frequent
  * items): input rows are whole `(item, est_count)` summary arrays (as
  * produced by `mg_topk(col, k, k)` and round-tripped through
  * parquet), folded with the same mergeable-summaries rule, so a
  * global/weekly candidate set is computable from per-partition
  * partials alone — the corpus is never re-scanned at rollup time.
  * The N/(k+1) error bound composes across the two levels because the
  * rule is associative over arbitrary merge trees; candidate
  * completeness (no item with true freq > N/(k+1) lost) is pinned in
  * `EdgeCasesSpec` across random partition splits. */
case class MisraGriesMergeAgg(
    child: Expression,
    k: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MisraGriesAggLike {

  require(k >= 1 && outK >= 1 && outK <= k,
    s"need 1 <= outK <= k, got k=$k outK=$outK")

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val pairs = (0 until arr.numElements()).iterator.map { i =>
        val r = arr.getStruct(i, 2)
        // Owned key copies: getStruct may be backed by a reused buffer.
        (r.getUTF8String(0).clone(), r.getLong(1))
      }
      mergePairs(buf, pairs)
    }
    buf
  }

  override def prettyName: String = "mg_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesMergeAgg =
    copy(child = newChild)
}

object TopKSketch {
  /** Register mg_topk(col, k, outK) and mg_merge(summaries, k, outK)
    * (idempotent, same route as the other custom expressions). k/outK
    * must be int literals. */
  def register(spark: SparkSession): Unit = {
    def lit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => sys.error(s"mg_topk k/outK must be int literals, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk",
      exprs => MisraGriesTopK(exprs.head, lit(exprs(1)), lit(exprs(2))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_merge",
      exprs => MisraGriesMergeAgg(exprs.head, lit(exprs(1)), lit(exprs(2))),
      "built-in")
  }
}
