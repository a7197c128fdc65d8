package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: band-bucket occupancy and candidate-pair
  * counts for the simhash pipeline at a soak scale. Not part of the
  * driver contract. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(s"${graft.Tables.scratchRoot}/graft_soak_x100")
    graft.functions.SketchFunctions.register(spark)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sigs = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        expr("simhash_sig(word_shingles_distinct(tk, 3))").as("sig"))
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("b"), expr(s"(sig >> ${16 * c}) & 65535").as("v"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(chunks: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("v"))
      .persist()
    val occ = bands.groupBy("b", "v").count().persist()
    occ.agg(count(lit(1)).as("buckets"), max("count").as("max_occ"),
      sum(expr("count * (count - 1) / 2")).as("uncapped_pairs"),
      sum(expr("least(count, 128L) * (least(count, 128L) - 1) / 2"))
        .as("capped128_pairs"),
      sum(when(col("count") > 128, 1).otherwise(0)).as("over128"))
      .show(false)
    occ.orderBy(col("count").desc).show(20, false)
    bands.unpersist(); occ.unpersist()
    spark.stop()
  }
}
