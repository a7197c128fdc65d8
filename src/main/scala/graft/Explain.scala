package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan inspection tool: prints the formatted physical plan of selected
  * queries (all by default). Usage: Explain <sfDir> [q1,q2,...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The dedup gate queries materialize eagerly (scoped shingle-index
    // cache), so their returned plan is just the result-file scan;
    // explain the unmaterialized pipeline instead.
    val probes = Map(
      "q_dedup_exact" -> "exact", "q_dedup_ngram" -> "ngram",
      "q_dedup_minhash" -> "minhash", "q_dedup_simhash" -> "simhash",
      "q_multimodal_neardup" -> "mmnear")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n========== $name ==========")
        try {
          val df = probes.get(name)
            .map(graft.queries.TextQueries.planProbe(spark, sfDir, _))
            .getOrElse(fn(spark, sfDir))
          println(df.queryExecution
            .explainString(ExplainMode.fromString("formatted")))
        } catch { case e: Throwable => println(s"explain failed: $e") }
      }
    }
    spark.stop()
  }
}
