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
    // 4 subspaces × 16 codes is a coarse quantizer; the 32-wide
    // shortlist plus exact re-rank must still recover at least half
    // of the true neighbors (empirically ~0.8 on this fixture).
    assert(recall >= 0.5, f"PQ recall@5 collapsed: $recall%.2f")
  }
}
