package graft

/** q_embed_kmeans unit gates: the distributed assignment pass against
  * a brute-force reference (including the lowest-cid tie-break), and
  * end-to-end determinism of the Lloyd loop. */
class KmeansSpec extends SparkSpecBase {

  test("kmeansAssign is the exact argmin with lowest-cid tie-break") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dim = 5
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i =>
      i -> Array.fill(dim)(rnd.nextInt(2001) - 1000L))
    // Centroids 0 and 1 identical: every vector is equidistant to
    // both, so the tie-break must hand the whole corpus to cid 0.
    val cents = Array(
      Array.fill(dim)(0L),
      Array.fill(dim)(0L),
      Array.fill(dim)(rnd.nextInt(1001).toLong),
      Array.fill(dim)(-rnd.nextInt(1001).toLong))
    val e = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    val got = graft.queries.VectorQueries.kmeansAssign(e, cents)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    val want = vecs.map { case (id, v) =>
      val ds = cents.map(c =>
        v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val best = ds.min
      (id, ds.indexOf(best), best)
    }
    assert(got.toSeq == want.toSeq)
    assert(got.forall(_._2 != 1), "tie-break leaked a cid-1 assignment")
  }

  test("kmeansK scales k with the corpus to bound cells (SemDeDup contract)") {
    import graft.queries.VectorQueries.kmeansK
    // Verify fixtures stay at the oracle's k=8...
    assert(kmeansK(500) == 8)   // sf0.01 / sf0.001
    assert(kmeansK(2000) == 8)  // sf0.1: 2000/250 exactly
    // ...while a grown corpus derives more clusters: cells stay ~250.
    assert(kmeansK(20000) == 80)   // the 10x soak fixture
    assert(kmeansK(200000) == 800) // 100x
    assert(kmeansK(1) == 8)        // floor
    assert(kmeansK(10000000) == 40000) // past KmLiteralMax: broadcast path
    assert(kmeansK(Long.MaxValue / 2) == 65536) // driver-state cap
    // Monotone: a bigger corpus never derives fewer clusters.
    val ks = Seq(1L, 500L, 2000L, 5000L, 20000L, 100000L, 10000000L)
      .map(kmeansK(_).toLong)
    assert(ks == ks.sorted)
  }

  test("broadcast assignment path is identical to the literal path") {
    // k > KmLiteralMax flips kmeansAssign to the broadcast-backed
    // expression; same matrix through both paths must assign
    // identically (the plan-size seam must be invisible to results).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val dim = 8
    val rnd = new scala.util.Random(11)
    val k = graft.queries.VectorQueries.KmLiteralMax + 2
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
    val e = (0L until 500L)
      .map(i => (i, Seq.fill(dim)(rnd.nextInt(2001) - 1000L)))
      .toDF("vec_id", "v")
    // Literal path, invoked directly (kmeansAssign would dispatch away).
    val viaLiteral = e.withColumn("__a",
        call_function("km_assign", col("v"),
          typedlit(cents.map(_.toSeq).toSeq)))
      .select(col("vec_id"), col("__a.cid"), col("__a.dist"))
      .collect().map(_.toString).sorted.toSeq
    val viaBcast = graft.queries.VectorQueries.kmeansAssign(e, cents)
      .select("vec_id", "cid", "dist")
      .collect().map(_.toString).sorted.toSeq
    assert(viaLiteral == viaBcast)
  }

  test("two concurrent broadcast-path queries keep their own matrices") {
    // The old registry-mutating registration bound km_assign_bc
    // session-globally: building query B would silently REBIND the
    // name under an un-collected query A, so A assigned against B's
    // matrix. The ColumnBridge construction scopes the broadcast to
    // the expression tree — build both plans FIRST, collect after,
    // which is exactly the interleaving that raced before.
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dim = 4
    val rnd = new scala.util.Random(17)
    val k = graft.queries.VectorQueries.KmLiteralMax + 1
    // Two DISJOINT matrices: A's centroids live at +10000, B's at
    // -10000, so an assignment against the wrong matrix flips every
    // distance by ~dim*(2e4)^2 and the asserts below catch it.
    val centsA = Array.tabulate(k)(c =>
      Array.fill(dim)(10000L + rnd.nextInt(100)))
    val centsB = Array.tabulate(k)(c =>
      Array.fill(dim)(-10000L - rnd.nextInt(100)))
    val e = (0L until 200L)
      .map(i => (i, Seq.fill(dim)(rnd.nextInt(201) - 100L)))
      .toDF("vec_id", "v")
    def brute(cents: Array[Array[Long]]): Seq[(Long, Long)] =
      e.collect().map { r =>
        val v = r.getSeq[Long](1)
        (r.getLong(0), cents.map(c =>
          v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min)
      }.toSeq.sortBy(_._1)
    val qA = graft.queries.VectorQueries.kmeansAssign(e, centsA)
    val qB = graft.queries.VectorQueries.kmeansAssign(e, centsB) // rebind point
    val gotA = qA.select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val gotB = qB.select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(gotA == brute(centsA), "query A saw query B's matrix")
    assert(gotB == brute(centsB))
  }

  test("q_embed_kmeans is deterministic and covers the corpus") {
    val d = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q_embed_kmeans")(spark, d).collect()
    val b = SparkEntry.queries("q_embed_kmeans")(spark, d).collect()
    assert(a.toSeq == b.toSeq)
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(a.length == n.toInt)
    val cids = a.map(_.getInt(1)).distinct
    assert(cids.forall(c => c >= 0 && c < 8), cids.toSeq.toString)
    assert(a.forall(_.getLong(2) >= 0L))
  }
}
