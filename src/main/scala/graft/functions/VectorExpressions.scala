package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) evaluate
  * their lambdas interpreted — fine for occasional use, but a 64-float
  * dot product in the inner loop of similarity search pays the lambda
  * dispatch per element. This expression compiles to a tight primitive
  * loop inside whole-stage codegen (the brief's extension ladder:
  * built-ins first, then a native `Expression` with `doGenCode` before
  * ever reaching for a UDF).
  *
  * Null contract: null input array → null; element nulls are not
  * expected (embedding vectors are dense) and read as 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact k-means assignment against a plan-embedded centroid matrix:
  * argmin_c Σ_i (v_i - c_i)² over quantized integer vectors (lowest
  * cid wins ties), returning struct<cid:int, dist:bigint> from ONE
  * tight primitive loop.
  *
  * Why an expression and not k distance columns: the k-per-column
  * formulation pays plan costs LINEAR IN K — k parsed/analyzed/
  * codegen'd 64-literal array expressions, then array_min +
  * array_position over a k-wide array per row — which is exactly what
  * breaks once kmeansK derives k from the corpus (the 10× soak
  * measured the k=80 assignment at ~10× the k=8 per-row cost from
  * plan shape alone). Here the centroid matrix rides as one codegen
  * reference object (long[][]): per-row cost is the irreducible k×dim
  * integer multiply-adds, plan size is constant in k, and the whole
  * pass stays inside whole-stage codegen. All arithmetic is exact
  * integer (quantized milli-unit inputs), so assignments stay
  * bit-identical to the unrolled-CTE DuckDB twin. */
case class KMeansAssignExpr(child: Expression, cents: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"km_assign expects array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def prettyName: String = "km_assign"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    // Copy the vector ONCE: the k×dim inner loop then runs over plain
    // long[] (JIT-vectorizable) instead of paying an ArrayData.getLong
    // per element per centroid — at derived k that accessor cost
    // dominated the whole pass (measured ~15 s for one 200k-row
    // assignment at k=800 before this).
    val nv = xs.numElements()
    val vv = new Array[Long](nv)
    var vi = 0
    while (vi < nv) { vv(vi) = xs.getLong(vi); vi += 1 }
    var best = Long.MaxValue
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0L
      val n = math.min(nv, cc.length)
      var i = 0
      while (i < n) {
        val t = vv(i) - cc(i)
        d += t * t
        i += 1
      }
      if (d < best) { best = d; bi = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("kmCents", cents, "long[][]")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val nv = ctx.freshName("nv")
      val vv = ctx.freshName("vv")
      val vi = ctx.freshName("vi")
      s"""
         |int $nv = $a.numElements();
         |long[] $vv = new long[$nv];
         |for (int $vi = 0; $vi < $nv; $vi++) $vv[$vi] = $a.getLong($vi);
         |long $best = java.lang.Long.MAX_VALUE;
         |int $bi = 0;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  long[] $cc = $cRef[$c];
         |  long $d = 0L;
         |  int $n = java.lang.Math.min($nv, $cc.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $vv[$i] - $cc[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $best) { $best = $d; $bi = $c; }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bi, $best });
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): KMeansAssignExpr = copy(child = newChild)
}

/** The broadcast-backed twin of [[KMeansAssignExpr]] for k past the
  * literal-plan regime: the centroid matrix rides a TorrentBroadcast —
  * shipped once per EXECUTOR and reused by every task — instead of a
  * plan reference object serialized into every task binary. Same exact
  * integer argmin, same struct<cid, dist> result (identity pinned in
  * KmeansSpec); codegen caches `bc.value()` in a mutable member so the
  * per-row loop touches only the resolved long[][]. This is the seam
  * kmeansAssign flips past KmLiteralMax, which is what lets kmeansK
  * derive thousands of clusters at 100 TB without plan bloat. */
case class KMeansAssignBcastExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"km_assign_bc expects array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def prettyName: String = "km_assign_bc"

  @transient private lazy val cents: Array[Array[Long]] = bc.value

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    // Copy the vector ONCE: the k×dim inner loop then runs over plain
    // long[] (JIT-vectorizable) instead of paying an ArrayData.getLong
    // per element per centroid — at derived k that accessor cost
    // dominated the whole pass (measured ~15 s for one 200k-row
    // assignment at k=800 before this).
    val nv = xs.numElements()
    val vv = new Array[Long](nv)
    var vi = 0
    while (vi < nv) { vv(vi) = xs.getLong(vi); vi += 1 }
    var best = Long.MaxValue
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0L
      val n = math.min(nv, cc.length)
      var i = 0
      while (i < n) {
        val t = vv(i) - cc(i)
        d += t * t
        i += 1
      }
      if (d < best) { best = d; bi = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bcRef = ctx.addReferenceObj("kmBcast", bc,
        "org.apache.spark.broadcast.Broadcast")
      // Resolve the broadcast ONCE per codegen object, not per row.
      val mat = ctx.addMutableState("long[][]", "kmBcCents",
        v => s"$v = (long[][]) $bcRef.value();")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val nv = ctx.freshName("nv")
      val vv = ctx.freshName("vv")
      val vi = ctx.freshName("vi")
      s"""
         |int $nv = $a.numElements();
         |long[] $vv = new long[$nv];
         |for (int $vi = 0; $vi < $nv; $vi++) $vv[$vi] = $a.getLong($vi);
         |long $best = java.lang.Long.MAX_VALUE;
         |int $bi = 0;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  long[] $cc = $mat[$c];
         |  long $d = 0L;
         |  int $n = java.lang.Math.min($nv, $cc.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $vv[$i] - $cc[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $best) { $best = $d; $bi = $c; }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bi, $best });
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): KMeansAssignBcastExpr = copy(child = newChild)
}

object VectorFunctions {
  /** Register `vec_dot` in the session's function registry so it is
    * usable from SQL/expr strings (idempotent; the
    * SparkSessionExtensions.injectFunction route is equivalent for
    * cluster-wide installs). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    // km_assign(v, <array<array<bigint>> literal>): the centroid
    // matrix must be foldable — it is unpacked ONCE at plan build into
    // the expression's long[][] reference object (typedlit produces
    // exactly this Literal; kmeansAssign is the only caller).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "km_assign", exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.LongType
        val cents = exprs(1) match {
          case Literal(v: ArrayData, ArrayType(ArrayType(LongType, _), _)) =>
            v.toObjectArray(ArrayType(LongType, containsNull = false))
              .map(_.asInstanceOf[ArrayData].toLongArray())
          case other => sys.error(
            s"km_assign centroids must be an array<array<bigint>> literal, got $other")
        }
        KMeansAssignExpr(exprs.head, cents)
      }, "built-in")
  }
}
