package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-wide install point for the engine's native expressions:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * registers them in every session at creation (the standing
  * alternative to per-session VectorFunctions.register). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def dotBuilder(exprs: Seq[Expression]): Expression =
    DotProduct(exprs.head, exprs(1))

  override def apply(ext: SparkSessionExtensions): Unit = {
    Seq("vec_dot", "vec_dot_ext").foreach { name =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getCanonicalName, name),
        dotBuilder))
    }
  }
}
