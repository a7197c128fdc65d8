package graft

/** IVF probe-width receipts — the IVF analogue of LshRecallSpec's
  * floors and the lsh_mp census: recall@5 as a function of nprobe,
  * pinned so the "pay more probes for more recall" knob carries
  * numbers and a refactor cannot silently flatten the curve.
  *
  *  - MONOTONE: widening the probe set can only add candidate lists,
  *    so recall is non-decreasing in nprobe (set-containment, exact).
  *  - EXHAUSTIVE: at nprobe = numCentroids (every list) the candidate
  *    set is the whole corpus minus self, so recall is exactly 1.0 —
  *    pins that no true neighbor is lost by the list assignment
  *    itself. Derived from the constant, not hardcoded, so tuning the
  *    coarse quantizer cannot desynchronize the premise.
  *  - The gates' shipped width (nprobe=4) must clear a 0.4 floor on
  *    the sf0.01 fixture (measured 0.48 in the q_ann_recall census;
  *    the limiter is the coarse quantizer at 500 vectors, documented
  *    in PLANS.md — not the probe width).
  *
  * The curve computes the nprobe-independent work (ground truth,
  * centroid training, list assignment, per-query centroid ranking)
  * once and re-slices it per width (ivfRecallCurve).
  */
class IvfRecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("IVF recall is monotone in nprobe, exact at exhaustive probing, floored at the shipped width") {
    import graft.queries.VectorQueries.{ivfNumCentroids, ivfRecallCurve}
    val widths = Seq(1, 4, 8, ivfNumCentroids)
    val curve = ivfRecallCurve(spark, dir, widths).toMap
    info(s"recall@5 by nprobe: " +
      widths.map(w => s"$w=${curve(w)}").mkString(" "))
    widths.sliding(2).foreach { case Seq(a, b) =>
      assert(curve(a) <= curve(b),
        s"recall not monotone: $a->${curve(a)} vs $b->${curve(b)}")
    }
    assert(curve(ivfNumCentroids) == 1.0,
      s"exhaustive probe recall ${curve(ivfNumCentroids)} != 1.0")
    assert(curve(4) >= 0.4,
      s"shipped nprobe=4 recall ${curve(4)} under the 0.4 floor")
  }
}
