package graft

/** IVF probe-width receipts — the IVF analogue of LshRecallSpec's
  * floors and the lsh_mp census: recall@5 as a function of nprobe,
  * pinned so the "pay more probes for more recall" knob carries
  * numbers and a refactor cannot silently flatten the curve.
  *
  *  - MONOTONE: widening the probe set can only add candidate lists,
  *    so recall is non-decreasing in nprobe (set-containment, exact).
  *  - EXHAUSTIVE: at nprobe = 16 (every list) the candidate set is
  *    the whole corpus minus self, so recall is exactly 1.0 — pins
  *    that no true neighbor is lost by the list assignment itself.
  *  - The gates' shipped width (nprobe=4) must clear a 0.4 floor on
  *    the sf0.01 fixture (measured 0.48 in the q_ann_recall census;
  *    the limiter is the 16-centroid coarse quantizer at 500 vectors,
  *    documented in PLANS.md — not the probe width).
  */
class IvfRecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("IVF recall is monotone in nprobe, exact at exhaustive probing, floored at the shipped width") {
    import graft.queries.VectorQueries.ivfRecallAt
    val r1 = ivfRecallAt(spark, dir, 1)
    val r4 = ivfRecallAt(spark, dir, 4)
    val r8 = ivfRecallAt(spark, dir, 8)
    val rAll = ivfRecallAt(spark, dir, 16)
    info(s"recall@5 by nprobe: 1=$r1 4=$r4 8=$r8 16=$rAll")
    assert(r1 <= r4 && r4 <= r8 && r8 <= rAll,
      s"recall not monotone: 1->$r1 4->$r4 8->$r8 16->$rAll")
    assert(rAll == 1.0, s"exhaustive probe recall $rAll != 1.0")
    assert(r4 >= 0.4, s"shipped nprobe=4 recall $r4 under the 0.4 floor")
  }
}
