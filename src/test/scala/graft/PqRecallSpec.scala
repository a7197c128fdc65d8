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

  test("PQ recall is a priced curve over M subvectors; exhaustive shortlist is exact") {
    // The PQ knob receipt (the IVF-nprobe analogue): M is the
    // memory/accuracy dial — M 4-bit codes per vector, so the index
    // storage is M/2 bytes/vector and recall rises with M because each
    // subspace quantizes a narrower slice. Measured on the sf0.01
    // fixture (500 vectors, shipped shortlist 128); the shipped M=8
    // must clear the same 0.6 floor as the gate's fixture test.
    import graft.queries.VectorQueries.{pqRecallCurve, pqSubShipped}
    val sf001 = "/root/testdata/sf0.01"
    val widths = Seq(1, 2, 4, pqSubShipped, 16)
    val curve = pqRecallCurve(spark, sf001, widths).toMap
    info("recall@5 by M subvectors: " +
      widths.map(w => s"$w=${curve(w)}").mkString(" "))
    assert(curve(pqSubShipped) >= 0.6,
      s"shipped M=$pqSubShipped recall ${curve(pqSubShipped)} under 0.6")
    assert(curve(1) < curve(pqSubShipped),
      "the M dial must matter: one 64-dim subspace of 16 cells cannot " +
        s"match the shipped shape (${curve(1)} vs ${curve(pqSubShipped)})")
    assert(curve(16) >= curve(pqSubShipped) - 0.2,
      s"doubling M beyond the shipped width collapsed recall: ${curve(16)}")

    // Exhaustive-shortlist anchor (the IVF exhaustive-probe analogue):
    // with shortlist >= corpus the ADC cut keeps every candidate, so
    // recall is EXACTLY 1.0 even at M=1 — the shortlist, not the code
    // fidelity, is the only lossy stage after it.
    val exhaustive = pqRecallCurve(spark, sf001, Seq(1),
      shortlistOverride = Some(1000000)).toMap
    assert(exhaustive(1) == 1.0,
      s"exhaustive shortlist recall ${exhaustive(1)} != 1.0")
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
