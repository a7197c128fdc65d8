package graft

/** q_embed_pq quality gate: the ADC shortlist + exact re-rank must
  * recover a meaningful share of the true (brute-force) top-k — the
  * rows-only driver check alone would let a broken encoder hide behind
  * "5 rows per query". Also pins the structural contract: exactly k
  * ranked rows per query, all drawn from the corpus, never the query
  * itself. */
class PqRecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("PQ top-k recall vs exact brute force, structure intact") {
    val pq = SparkEntry.queries("q_embed_pq")(spark, dir).collect()
    val exact = SparkEntry.queries("q_embed_cosine")(spark, dir).collect()

    val pqTop = pq.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val exTop = exact.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap

    assert(pqTop.keySet == exTop.keySet, "query sets differ")
    pq.groupBy(_.getAs[Long]("qid")).foreach { case (q, rows) =>
      assert(rows.length == 5, s"qid $q returned ${rows.length} rows")
      assert(rows.map(_.getAs[Int]("rn")).sorted.sameElements(1 to 5), s"qid $q ranks")
      assert(!pqTop(q).contains(q), s"qid $q returned itself")
    }

    val hits = exTop.map { case (q, ex) => (pqTop(q) & ex).size }.sum
    val recall = hits.toDouble / exTop.values.map(_.size).sum
    // PQ8x4 (8 subspaces × 16 codes) + the 128-wide shortlist and
    // exact re-rank measures ~0.93 across Lloyd inits on this fixture;
    // 0.6 is the regression floor.
    assert(recall >= 0.6, f"PQ recall@5 collapsed: $recall%.2f")
  }

  test("IVF top-k recall vs exact brute force (probes=4/16) holds a floor") {
    // The IVF protocol shares the hash-rank sample + spread-init Lloyd
    // training with PQ; this pins its recall the same way (it had no
    // floor before r12). 4-of-16 probes on this fixture measures ~0.8
    // (2 probes measured 0.52 — the dial that motivated nprobe=4).
    val ivf = SparkEntry.queries("q_embed_ivf")(spark, dir).collect()
    val exact = SparkEntry.queries("q_embed_cosine")(spark, dir).collect()
    val ivfTop = ivf.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val exTop = exact.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    assert(ivfTop.keySet == exTop.keySet, "query sets differ")
    val hits = exTop.map { case (q, ex) =>
      (ivfTop.getOrElse(q, Set.empty) & ex).size }.sum
    val recall = hits.toDouble / exTop.values.map(_.size).sum
    assert(recall >= 0.6, f"IVF recall@5 collapsed: $recall%.2f")
  }

  test("IVF+PQ composite recall vs exact brute force holds a floor") {
    // The composite's misses compound (a true neighbor must survive
    // BOTH the probe prune and the ADC shortlist), so its floor sits
    // below either component's — but a broken composition (e.g. ADC
    // scoring the wrong lists) collapses it to ~0, which is what this
    // pins.
    val c = SparkEntry.queries("q_embed_ivfpq")(spark, dir).collect()
    val exact = SparkEntry.queries("q_embed_cosine")(spark, dir).collect()
    val cTop = c.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val exTop = exact.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    assert(cTop.keySet == exTop.keySet, "query sets differ")
    c.groupBy(_.getAs[Long]("qid")).foreach { case (q, rows) =>
      assert(rows.length == 5, s"qid $q returned ${rows.length} rows")
      assert(!cTop(q).contains(q), s"qid $q returned itself")
    }
    val hits = exTop.map { case (q, ex) =>
      (cTop.getOrElse(q, Set.empty) & ex).size }.sum
    val recall = hits.toDouble / exTop.values.map(_.size).sum
    assert(recall >= 0.5, f"IVF+PQ recall@5 collapsed: $recall%.2f")
    info(f"IVF+PQ recall@5 = $recall%.2f")
  }

  test("PQ recall floor holds on an id-SKEWED corpus (hash-rank training sample)") {
    // Re-key vec_id so ids encode content (sorted by label, the way a
    // real corpus's ids encode source/time): a head-of-corpus training
    // sample would see only the first labels and train biased
    // codebooks. The hash-rank sample (r11 VERDICT #4) must keep the
    // recall floor on exactly this shape.
    import org.apache.spark.sql.functions._
    val skewDir = java.nio.file.Files
      .createTempDirectory("graft_pq_skew").toString
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("label"), col("vec_id"))
    spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("vec_id", row_number().over(w).cast("long") - 1L)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$skewDir/embeddings.parquet")
    val pq = SparkEntry.queries("q_embed_pq")(spark, skewDir).collect()
    val exact = SparkEntry.queries("q_embed_cosine")(spark, skewDir).collect()
    val pqTop = pq.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val exTop = exact.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    assert(pqTop.keySet == exTop.keySet, "query sets differ")
    val hits = exTop.map { case (q, ex) =>
      (pqTop.getOrElse(q, Set.empty) & ex).size }.sum
    val recall = hits.toDouble / exTop.values.map(_.size).sum
    assert(recall >= 0.6, f"PQ recall@5 collapsed on id-skewed corpus: $recall%.2f")
  }
}
