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

/** One-pass word n-gram construction (the feeder of every shingle
  * pipeline). The SQL formulation — `transform(sequence(1, size-n+1),
  * i -> concat_ws(' ', element_at…))` — is an interpreted higher-order
  * lambda allocating a frame per shingle; this builds the same strings
  * (identical null-skipping concat_ws semantics) in one JIT-compiled
  * loop, and the `distinct` variant fuses the usual trailing
  * `array_distinct` hash-set pass into the same loop (first-occurrence
  * order preserved, exactly like array_distinct). */
object WordShingleImpl {

  private val Space = UTF8String.fromString(" ")

  def shingles(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](nTok - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= nTok - n) {
      var k = 0
      var m = 0
      while (k < n) {
        // concat_ws semantics: null elements are skipped entirely
        // (element AND separator)
        if (!arr.isNullAt(i + k)) {
          parts(m) = arr.getUTF8String(i + k)
          m += 1
        }
        k += 1
      }
      val s = UTF8String.concatWs(Space,
        (if (m == n) parts else java.util.Arrays.copyOf(parts, m)): _*)
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** word_shingles(array<string>, n) → array<string> of space-joined
  * n-grams in order, duplicates kept; word_shingles_distinct fuses the
  * array_distinct. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ShingleArrayInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "word_shingles_distinct" else "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleImpl.shingles(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.WordShingleImpl.shingles($a, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** One-pass distinct byte n-gram construction over a BINARY payload,
  * emitted as uppercase-hex strings (2n chars per shingle) so the
  * DuckDB oracle can recompute the identical set from substr over
  * hex(payload) with a stride of 2. Byte-aligned stride (1 byte per
  * step) — the fuzzy-hashing convention (ssdeep/TLSH) — not the
  * half-byte positions a naive substr-over-hex sweep produces. The
  * SQL formulation (`array_distinct(transform(sequence(...), i ->
  * substr(h, i, 8)))`) is an interpreted higher-order lambda
  * allocating a frame per shingle — executor profiles under the 10x
  * soak showed it dominating the multimodal near-dup; this builds the
  * same strings in one JIT-compiled loop (same rationale as
  * WordShingleImpl). */
object ByteShingleImpl {

  private val Hex = "0123456789ABCDEF".getBytes("US-ASCII")

  def shingles(bytes: Array[Byte], n: Int): ArrayData = {
    val len = bytes.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](len - n + 1)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val cs = new Array[Byte](2 * n)
      var k = 0
      while (k < n) {
        val b = bytes(i + k) & 0xff
        cs(2 * k) = Hex(b >>> 4)
        cs(2 * k + 1) = Hex(b & 0xf)
        k += 1
      }
      val s = UTF8String.fromBytes(cs)
      if (seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** byte_shingles_distinct(binary, n) → array<string> of distinct
  * byte n-grams as 2n-char uppercase hex. */
case class ByteShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_shingles_distinct"

  override protected def nullSafeEval(input: Any): Any =
    ByteShingleImpl.shingles(input.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ByteShingleImpl.shingles($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): ByteShingles =
    copy(child = newChild)
}

object SketchFunctions {
  /** Register minhash_sig / simhash_sig / word_shingles[_distinct] /
    * byte_shingles_distinct in the session registry (idempotent — same
    * route as vec_dot). The shingle size is passed as a literal int
    * argument. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    def lit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => sys.error(s"shingle size must be an int literal, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs.head, lit(exprs(1)), distinct = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles_distinct",
      exprs => WordShingles(exprs.head, lit(exprs(1)), distinct = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_shingles_distinct",
      exprs => ByteShingles(exprs.head, lit(exprs(1))),
      "built-in")
  }
}
