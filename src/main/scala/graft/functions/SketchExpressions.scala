package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-only sketch signatures over a document's shingle array.
  *
  * The round-2 formulation computed signatures by exploding the
  * (doc_id, shingle) inverted index and re-grouping by doc_id through a
  * typed Aggregator — one full shuffle of the largest relation in the
  * pipeline just to get per-document state back together. But a
  * signature is a pure function of one document's shingle SET, which the
  * row already holds; these expressions compute it in place inside
  * whole-stage codegen, so MinHash/SimHash candidate generation shuffles
  * only (doc_id, band, bucket) rows — ~24 B/row instead of the exploded
  * corpus. At 100 TB that is the difference between a map-only stage and
  * an all-data exchange.
  *
  * Hashing: xxhash64 over the shingle's UTF-8 bytes (Spark's own XXH64,
  * seed 42 — identical to the SQL xxhash64 function), then a
  * splitmix64-avalanche family h_i = mix(h0 + i·φ64) for MinHash — the
  * same construction the round-2 MinHashAggregator used
  * (cf. resotodatalink has no sketch ops; these are the beyond-reference
  * LLM-pipeline components).
  */
object SketchHash {

  /** splitmix64 finalizer: full-avalanche bijective mixing. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val Golden = 0x9e3779b97f4a7c15L
  val Seed = 42L

  private def baseHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** MinHash signature: element-wise minimum of `numHashes` derived
    * hashes over the shingle array. Null elements are skipped. */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h0 = baseHash(arr.getUTF8String(j))
        var i = 0
        while (i < numHashes) {
          val h = mix(h0 + i * Golden)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash: 64-bit signature whose bit i is the sign of the summed
    * ±1 votes of bit i over all shingle hashes. */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = baseHash(arr.getUTF8String(j))
        var i = 0
        while (i < 64) {
          counts(i) += (((h >>> i) & 1L).toInt << 1) - 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}

private[functions] trait ShingleArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }
}

/** minhash_sig(array<string>) → array<long> (32 hashes). The heavy
  * loop lives in SketchHash.minhash (JIT-compiled once); codegen emits
  * a static call, keeping the generated method tiny and inside
  * whole-stage codegen. */
case class MinHashSig(child: Expression, numHashes: Int = 32)
    extends UnaryExpression with ShingleArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SketchHash.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SketchHash.minhash($a, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** simhash_sig(array<string>) → bigint (the 64-bit signature). */
case class SimHashSig(child: Expression)
    extends UnaryExpression with ShingleArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SketchHash.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchHash.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SketchFunctions {
  /** Register minhash_sig / simhash_sig in the session registry
    * (idempotent — same route as vec_dot). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
  }
}
