package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Properties of the shared sorted-neighborhood candidate scan
  * (TextQueries.simhashNeighborCandidates) against a brute-force
  * reference, over synthetic 64-bit signatures fed directly into the
  * scan (no shingle pipeline — the properties are about the scan):
  *
  *  1. EXHAUSTIVENESS at oracle occupancy: when every band bucket
  *     holds <= W+1 members, candidates EQUAL the full banded
  *     all-pairs ∩ Hamming<=16 set — the property that keeps the
  *     gate's verified candidate side-files identical to the
  *     pre-sorted-neighborhood form.
  *  2. SOUNDNESS at any occupancy: candidates are always a SUBSET of
  *     share-a-band ∩ Hamming<=16 (the window can only narrow, never
  *     invent a pair), including under adversarial clustering.
  */
class NeighborScanPropSpec extends SparkSpecBase {

  private def bandsOf(sig: Long): Seq[Int] =
    (0 until 4).map(c => ((sig >> (16 * c)) & 0xffffL).toInt)

  private def reference(sigs: Map[Long, Long]): Set[(Long, Long)] = {
    val ids = sigs.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      si = sigs(i); sj = sigs(j)
      if bandsOf(si).zip(bandsOf(sj)).exists { case (a, b) => a == b }
      if java.lang.Long.bitCount(si ^ sj) <= 16
    } yield (i, j)).toSet
  }

  private def scan(sigs: Map[Long, Long]): Set[(Long, Long)] = {
    import spark.implicits._
    val df = sigs.toSeq.toDF("doc_id", "sig")
    graft.queries.TextQueries.simhashNeighborCandidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exhaustive at oracle occupancy (<= W+1 per bucket): scan == reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      // 17 distinct random sigs: with 2^16 buckets per band the
      // chance of a bucket exceeding W+1=17 members is nil by count.
      val sigs = (0 until 17)
        .map(i => i.toLong -> rnd.nextLong()).toMap
      // Seed some NEAR pairs so the property isn't vacuously empty:
      // flip 1-3 bits of an existing sig.
      val withNear = sigs ++ (17 to 19).map { i =>
        val base = sigs(rnd.nextInt(17).toLong)
        i.toLong -> (base ^ (1L << rnd.nextInt(64)) ^
          (1L << rnd.nextInt(64)))
      }.toMap
      assert(scan(withNear) == reference(withNear), s"trial $trial")
    }
  }

  test("sound at any occupancy: scan is a subset of the reference") {
    val rnd = new scala.util.Random(23)
    // Adversarial clustering: many sigs share band values (same low
    // 16 bits), forcing >W+1 occupancy in band 0's bucket.
    val clustered = (0 until 60).map { i =>
      i.toLong -> ((rnd.nextLong() << 16) | 0xABCDL)
    }.toMap
    val got = scan(clustered)
    val ref = reference(clustered)
    assert(got.subsetOf(ref),
      s"invented pairs: ${(got diff ref).take(5)}")
    // And every found pair is genuinely close:
    assert(got.forall { case (a, b) =>
      java.lang.Long.bitCount(clustered(a) ^ clustered(b)) <= 16 })
  }
}
