package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact discrete quantiles (PERCENTILE_DISC semantics: the smallest
  * value whose cumulative distribution reaches p) computed as a count
  * histogram rather than a per-group value buffer.
  *
  * Scale shape: `groupBy(key, value).count` is map-side combinable, so
  * the shuffle carries one row per DISTINCT (key, value) pair — for
  * bounded-domain measures (quantities, scores, token counts) that is
  * thousands of rows regardless of input size. The cumulative window
  * then runs over that tiny histogram. A value-collecting percentile
  * aggregate (Spark's `percentile`) buffers every value per group and
  * does not survive 100 TB; this does.
  */
object Quantiles {

  /** One row per `key` with a column per requested (name, p) quantile
    * of `value`. Output column types match the value column. */
  def discrete(df: DataFrame, key: String, value: String,
               ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p <= 1 },
      s"quantile fractions must be in (0, 1]: $ps")
    // NULL measures are excluded (SQL PERCENTILE_DISC semantics): they
    // must count neither as values nor in the denominator — but a key
    // whose measures are ALL null must still emit a row (with null
    // quantiles), exactly as the SQL aggregate would. So nulls keep
    // their histogram row with a zero count: they contribute nothing
    // to cum or n, and min(when(...)) over an empty candidate set is
    // null for the all-null group.
    val hist = df.groupBy(col(key), col(value).as("_qv"))
      .agg(sum(when(col(value).isNotNull, 1L).otherwise(0L)).as("_qc"))
    // One distinct value per row, so a rows-frame running sum IS the
    // cumulative count; both windows share one exchange on `key`.
    // Nulls sort first (Spark asc default), so their zero count can
    // never inflate a later value's cumulative rank.
    val wCum = Window.partitionBy(key).orderBy("_qv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val cum = hist
      .withColumn("_cum", sum("_qc").over(wCum))
      .withColumn("_n", sum("_qc").over(wAll))
    cum.groupBy(col(key)).agg(
      ps.head match { case (name, p) =>
        min(when(col("_cum") >= col("_n") * p, col("_qv"))).as(name) },
      ps.tail.map { case (name, p) =>
        min(when(col("_cum") >= col("_n") * p, col("_qv"))).as(name) }: _*)
  }
}
