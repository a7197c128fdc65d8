package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Diagnostic for q_join_setsim's cost structure (not part of the
  * driver contract): per-stage row counts of the prefix-filtered
  * pipeline — index size, heavy-posting census, candidate volume
  * before/after the distinct — at a given SF dir. Run with
  * `SPARK_GRAFT_SF_DIR` or an explicit arg. */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    graft.functions.SketchFunctions.register(s)
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val sh = graft.Tables.t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        explode(expr("word_shingles_distinct(tk, 5)")).as("tok"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfRel = sh.groupBy("tok").agg(count(lit(1)).as("df"))
    println("sh rows: " + sh.count())
    println("tokens with df>100: " +
      dfRel.filter(col("df") > 100).count())
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    val pref = sh.join(dfRel, "tok").join(sz, "doc_id")
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n") - expr("(6*n + 9) div 10") + 1)
      .select(col("tok"), col("doc_id"), col("n"))
    println("prefix rows: " + pref.count())
    val prefDf = pref.groupBy("tok").agg(count(lit(1)).as("pd"))
    println("max prefix posting: " + prefDf.agg(max("pd")).head())
    println("candidate rows (pre-filter): " +
      prefDf.agg(sum(col("pd") * (col("pd") - 1) / 2)).head())
    val cand = pref.toDF("tok", "a", "na")
      .join(pref.toDF("tok", "b", "nb"), "tok")
      .filter(col("a") < col("b") &&
        least(col("na"), col("nb")) * 10L >=
          greatest(col("na"), col("nb")) * 6L)
      .select("a", "b").distinct()
    println("candidates distinct: " + cand.count())
    s.stop()
  }
}
