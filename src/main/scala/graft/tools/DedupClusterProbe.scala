package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition for q_dedup_cluster (not part of the driver
  * contract): where do its ~3 s go — the shingle-index build, the
  * candidate pair join + Jaccard verify, or the ccLoop fixpoint? Also
  * checks whether jaccardFilter's trailing orderBy (needed by the
  * pair GATES that return sorted pairs) survives into this pipeline,
  * where its output only feeds the un-ordered edge union. */
object DedupClusterProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.SketchFunctions.register(s)
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val docs = graft.Tables.t(s, d, "documents")

    def shingles = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        explode(expr("word_shingles_distinct(tk, 5)")).as("s"))
    def sizes = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        size(expr("word_shingles_distinct(tk, 5)")).cast("long").as("n"))

    def t0[T](label: String)(body: => T): T = {
      val t = System.nanoTime()
      val r = body
      println(f"[dc] $label%-16s ${(System.nanoTime() - t) / 1e9}%6.3f s")
      r
    }
    for (pass <- 1 to 3) {
      println(s"[dc] --- pass $pass ---")
      val idx = shingles.persist()
      t0("idx build+count") { idx.count() }
      val a = idx.select(col("doc_id").as("doc_a"), col("s"))
      val b = idx.select(col("doc_id").as("doc_b"), col("s"))
      val pairs = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      val nPairs = t0("pairs agg") { pairs.count() }
      println(s"[dc] candidate pairs=$nPairs")
      val na = sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))
      val nb = sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))
      def dupsSorted = pairs.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("jacraw",
          col("inter") * 1.0 / (col("na") + col("nb") - col("inter")))
        .filter(col("jacraw") >= 0.5)
        .select(col("doc_a"), col("doc_b"),
          round(col("jacraw"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
      def dupsRaw = pairs.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("jacraw",
          col("inter") * 1.0 / (col("na") + col("nb") - col("inter")))
        .filter(col("jacraw") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      val e1 = t0("edges sorted") {
        val dd = dupsSorted.select("doc_a", "doc_b")
        val e = dd.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(dd.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .persist()
        val n = e.count(); (e, n)
      }
      println(s"[dc] dup edges=${e1._2}")
      val e2 = t0("edges raw") {
        val e = dupsRaw.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(dupsRaw.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .persist()
        e.count(); e
      }
      val e3 = t0("edges ckpt") {
        val dd = dupsSorted.select("doc_a", "doc_b").localCheckpoint()
        dd.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(dd.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      }
      val prevP = s.conf.get("spark.sql.shuffle.partitions")
      val prevI = s.conf.getOption(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      val prevA = s.conf.get("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "4")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      t0("ccLoop(20)") {
        graft.queries.GraphQueries.ccLoop(s, e1._1, 20).count()
      }
      t0("ccLoop ckpt-e") {
        graft.queries.GraphQueries.ccLoop(s, e3, 20).count()
      }
      s.conf.set("spark.sql.shuffle.partitions", prevP)
      s.conf.set("spark.sql.adaptive.enabled", prevA)
      prevI match {
        case Some(v) => s.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum", v)
        case None => s.conf.unset(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      }
      e1._1.unpersist(blocking = true)
      e2.unpersist(blocking = true)
      idx.unpersist(blocking = true)
    }
    s.stop()
  }
}
