package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Native vec_dot expression: correctness vs the interpreted
  * higher-order-function formulation, and codegen participation. */
class VectorExprSpec extends SparkSpecBase {

  test("vec_dot matches the interpreted aggregate/zip_with fold") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)(
      (Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("vec_dot(a, b)"))
      .withColumn("slow",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, e) -> s + e)"))
    // Same summation order -> bit-identical doubles.
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("extension-injected function resolves without runtime registration") {
    import spark.implicits._
    // vec_dot_ext is only ever registered through GraftExtensions
    // (session-creation injection), never via VectorFunctions.register.
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .selectExpr("vec_dot_ext(a, b) AS dp")
    assert(df.collect().head.getDouble(0) == 11.0)
  }

  test("vec_dot handles nulls and length mismatch") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))), // min-length
      (None, Some(Seq(1.0)))) // null array
      .toDF("a", "b")
      .withColumn("dp", expr("vec_dot(a, b)"))
    val out = df.select("dp").collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("vec_dot runs inside whole-stage codegen") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    // Literal arrays constant-fold; a repartition boundary forces a real
    // Project stage. transform() would be CodegenFallback, so the arrays
    // are materialized before the vec_dot projection.
    val df = Seq.fill(16)(
      (Seq.fill(8)(rnd.nextDouble()), Seq.fill(8)(rnd.nextDouble())))
      .toDF("a", "b")
      .repartition(2)
      .selectExpr("vec_dot(a, b) AS dp")
    assert(df.collect().length == 16) // materialize so AQE finalizes
    // Codegen'd operators carry a "*(stage)" marker in the plan string.
    val plan = df.queryExecution.executedPlan.toString
    val starredProject = plan.linesIterator
      .exists(l => l.contains("*(") && l.contains("Project"))
    assert(starredProject, plan)
  }
}
