package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-only per-document text statistics as codegen'd expressions.
  *
  * The SQL formulations of language-ID and repetition scoring lean on
  * higher-order functions (`filter(tokens, t -> t IN (...))`,
  * `aggregate(array_sort(tokens), ...)`), which Spark evaluates
  * interpreted, re-walking the token array once per language and
  * allocating a lambda frame per element. Over a corpus that is the
  * dominant cost of the whole query (q_text_lang spent ~5.7 s of a
  * ~40 s bench in lambda interpretation at sf0.1). These expressions do
  * the same arithmetic in one JIT-compiled pass per row — O(tokens)
  * hash-set probes instead of languages × tokens × stoplist string
  * compares — and stay inside whole-stage codegen, so the scan→project
  * pipeline never materializes an interpreted boundary. At 100 TB this
  * is a pure map stage whose per-row cost is what the JVM can JIT, not
  * what the interpreter can walk.
  *
  * (resotodatalink has no text analytics; these back the
  * beyond-reference LLM-pipeline operators q_text_lang /
  * q_text_quality / q_text_repetition.)
  */
object TextStats {

  /** Per-set membership hit counts (duplicates counted, like
    * `size(filter(tk, t -> t IN set))`). One pass over the tokens,
    * O(1) probe per (token, set). */
  def setHits(arr: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val counts = new Array[Int](sets.length)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j)
        var i = 0
        while (i < sets.length) {
          if (sets(i).contains(t)) counts(i) += 1
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(counts)
  }

  /** One-pass repetition stats over a token array:
    * (n_2grams, distinct_2grams, max_token_frequency).
    *
    * Tokens come from a single-space split, so they contain no spaces
    * and adjacent-pair equality == space-joined-string equality; the
    * distinct-2-gram count therefore works on interned token ids packed
    * into a long, never building the concatenated strings the SQL
    * formulation allocates. Max token frequency equals the
    * longest-equal-run over the sorted array that the previous
    * formulation computed in O(N log N); the frequency map does it in
    * O(N). */
  def repStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val ids = new java.util.HashMap[UTF8String, Integer](Math.max(16, n))
    val counts = new java.util.ArrayList[Integer](Math.max(16, n))
    val grams = new java.util.HashSet[java.lang.Long](Math.max(16, n))
    var topCount = 0
    var prevId = -1
    var j = 0
    while (j < n) {
      val t = if (arr.isNullAt(j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(j)
      var id = ids.get(t)
      if (id == null) {
        id = Integer.valueOf(ids.size())
        // copy: getUTF8String may return a view over reused buffers
        ids.put(t.clone(), id)
        counts.add(Integer.valueOf(0))
      }
      val c = counts.get(id.intValue()).intValue() + 1
      counts.set(id.intValue(), Integer.valueOf(c))
      if (c > topCount) topCount = c
      if (prevId >= 0)
        grams.add(java.lang.Long.valueOf((prevId.toLong << 32) | id.intValue().toLong))
      prevId = id.intValue()
      j += 1
    }
    val nG2 = if (n >= 2) n - 1 else 0
    new GenericInternalRow(Array[Any](nG2, grams.size(), topCount))
  }

  /** Shannon entropy (bits) over the string's Unicode code points —
    * one JIT pass, one int-keyed histogram; log2(n) - sum(c ln c)/n /
    * ln 2 avoids a division per distinct char. Matches DuckDB's
    * `entropy()` aggregate over `string_split(text, '')` (both log2;
    * fp noise is orders below the gate's 4-decimal rounding). */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer](64)
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
    }
    if (n == 0) 0.0
    else {
      var acc = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next().doubleValue(); acc += c * Math.log(c) }
      (Math.log(n) - acc / n) / Math.log(2.0)
    }
  }

  /** The string plus every single-character deletion of it — the
    * deletion-neighborhood blocking key set for edit-distance-1 joins.
    * COMPLETE for lev <= 1: identity covers lev 0; a substitution at i
    * makes both i-deletions equal; an insertion/deletion makes one
    * side's deletion equal the other's identity. Not exact — e.g. a
    * transposition (ab/ba) intersects at lev 2 — so candidates need
    * the exact levenshtein verify, which is the join's filter anyway.
    * Keys are generated in one JIT pass; a SQL transform(sequence(...))
    * formulation walks an interpreted lambda per character. */
  def delVariants(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Any](str.length + 1)
    out(0) = s.clone()
    var i = 0
    while (i < str.length) {
      out(i + 1) = UTF8String.fromString(
        str.substring(0, i) + str.substring(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val sha = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of the first 8 digest bytes — byte-identical to
    * `substring(sha2(x, 256), 1, 16)` / DuckDB `substr(sha256(x), 1, 16)`. */
  private def hex16(digest: Array[Byte]): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexChars((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(digest(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One-pass winnowing fingerprint (MOSS rolling scheme): hash every
    * ordered `n`-gram shingle (sha256-prefix hex, matching the SQL
    * formulation byte-for-byte), slide a `w`-hash window keeping each
    * window's lexicographic minimum, and return
    * struct(n_fp = distinct minima count, fp = sorted distinct minima
    * joined by ","). Replaces an interpreted transform(sha2) pass plus
    * an O(shingles × w) array_min(slice(...)) allocation chain. */
  def winnowFp(arr: ArrayData, n: Int, w: Int): InternalRow = {
    val nTok = arr.numElements()
    val nSh = if (nTok >= n) nTok - n + 1 else 0
    val hs = new Array[String](nSh)
    val md = sha.get()
    var i = 0
    while (i < nSh) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(' '.toByte)
        if (!arr.isNullAt(i + k)) md.update(arr.getUTF8String(i + k).getBytes)
        k += 1
      }
      hs(i) = hex16(md.digest())
      i += 1
    }
    val minima = new java.util.TreeSet[String]()
    if (nSh > 0 && nSh < w) {
      // fewer hashes than one window: keep them all (matches the SQL
      // CASE WHEN size(hs) >= w fallback)
      var j = 0
      while (j < nSh) { minima.add(hs(j)); j += 1 }
    } else if (nSh >= w) {
      var j = 0
      while (j + w <= nSh) {
        var m = hs(j)
        var k = 1
        while (k < w) {
          if (hs(j + k).compareTo(m) < 0) m = hs(j + k)
          k += 1
        }
        minima.add(m)
        j += 1
      }
    }
    val sb = new java.lang.StringBuilder()
    val it = minima.iterator()
    while (it.hasNext) {
      if (sb.length() > 0) sb.append(',')
      sb.append(it.next())
    }
    new GenericInternalRow(Array[Any](
      minima.size(), UTF8String.fromString(sb.toString)))
  }

  def toHashSets(sets: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val hs = new java.util.HashSet[UTF8String](ws.length * 2)
      ws.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray
}

private[functions] trait StringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }
}

private[functions] trait TokenArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }
}

/** token_set_hits(array<string>) → array<int>: element i = number of
  * tokens (with duplicates) contained in the i-th configured set. */
case class TokenSetHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_set_hits"

  @transient private lazy val hashSets = TextStats.toHashSets(sets)

  override protected def nullSafeEval(input: Any): Any =
    TextStats.setHits(input.asInstanceOf[ArrayData], hashSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", hashSets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.TextStats.setHits($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

/** rep_stats(array<string>) →
  * struct<n_g2:int, n_g2_distinct:int, top_count:int>. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = StructType(Seq(
    StructField("n_g2", IntegerType, nullable = false),
    StructField("n_g2_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.repStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextStats.repStats($a)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** winnow_fp(array<string>) → struct<n_fp:int, fp:string> — winnowing
  * fingerprint over `n`-gram shingles with a `w`-hash window. */
case class WinnowFingerprint(child: Expression, n: Int = 3, w: Int = 4)
    extends UnaryExpression with TokenArrayInput {

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", IntegerType, nullable = false),
    StructField("fp", StringType, nullable = false)))
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.winnowFp(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextStats.winnowFp($a, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** char_entropy(string) → double — Shannon entropy (bits) of the
  * string's code-point distribution, the classic gibberish/compression
  * quality signal (too-low = repeated filler, too-high = random bytes).
  * A SQL formulation needs explode-per-character — one row per char
  * through an exchange; this is one codegen'd histogram pass per row. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with StringInput {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextStats.charEntropy($s)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** del_variants(string) → array<string> — the string and its
  * single-character deletions (edit-distance-1 blocking keys). */
case class DelVariants(child: Expression)
    extends UnaryExpression with StringInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "del_variants"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.delVariants(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextStats.delVariants($s)")

  override protected def withNewChildInternal(newChild: Expression): DelVariants =
    copy(child = newChild)
}

object TextStatFunctions {
  /** Register lang_hits (bound to the given per-language stopword
    * sets), rep_stats, winnow_fp, and char_entropy (idempotent — same
    * route as minhash_sig). */
  def register(spark: SparkSession, langSets: Seq[Seq[String]]): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_hits", exprs => TokenSetHits(exprs.head, langSets), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rep_stats", exprs => RepetitionStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp", exprs => WinnowFingerprint(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "del_variants", exprs => DelVariants(exprs.head), "built-in")
  }
}
