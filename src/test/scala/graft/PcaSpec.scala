package graft

/** q_embed_pca quality gates: the Jacobi solve must actually converge
  * (residual check — the 16-sweep scaladoc claim), the top-2 basis
  * must be orthonormal, and the projections must behave like principal
  * components (variance ordering, decorrelation, determinism). The
  * value-level compare is the gate's side-file oracle. */
class PcaSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("jacobiEig converges: eigen residual and orthonormality at 1e-9") {
    val n = 16
    val rnd = new scala.util.Random(5)
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextDouble() * 10 - 5
      m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = graft.queries.VectorQueries.jacobiEig(m)
    val scale = m.map(_.map(math.abs).max).max
    for (r <- 0 until n) {
      // ||M v − λ v|| per eigenpair.
      var res = 0.0
      for (i <- 0 until n) {
        var mv = 0.0
        for (j <- 0 until n) mv += m(i)(j) * vecs(j)(r)
        res = math.max(res, math.abs(mv - vals(r) * vecs(i)(r)))
      }
      assert(res <= 1e-9 * scale, s"eigenpair $r residual $res")
      // Unit norm + pairwise orthogonality.
      var nn = 0.0
      for (i <- 0 until n) nn += vecs(i)(r) * vecs(i)(r)
      assert(math.abs(nn - 1.0) <= 1e-9, s"norm of vec $r: $nn")
      for (r2 <- r + 1 until n) {
        var d = 0.0
        for (i <- 0 until n) d += vecs(i)(r) * vecs(i)(r2)
        assert(math.abs(d) <= 1e-9, s"vecs $r,$r2 dot $d")
      }
    }
  }

  test("projections are deterministic, variance-ordered, decorrelated") {
    val a = SparkEntry.queries("q_embed_pca")(spark, dir).collect()
    val b = SparkEntry.queries("q_embed_pca")(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val p1 = a.map(_.getLong(1).toDouble)
    val p2 = a.map(_.getLong(2).toDouble)
    val n = p1.length.toDouble
    def meanOf(xs: Array[Double]) = xs.sum / n
    val (m1, m2) = (meanOf(p1), meanOf(p2))
    val v1 = p1.map(x => (x - m1) * (x - m1)).sum / n
    val v2 = p2.map(x => (x - m2) * (x - m2)).sum / n
    assert(v1 >= v2, s"PC1 variance $v1 < PC2 variance $v2")
    assert(v2 > 0.0, "PC2 collapsed")
    // Projections onto orthogonal eigenvectors of the scatter are
    // uncorrelated up to quantization noise.
    val cov = p1.zip(p2).map { case (x, y) => (x - m1) * (y - m2) }.sum / n
    assert(math.abs(cov) <= 0.01 * math.sqrt(v1 * v2),
      s"PC1/PC2 correlation too high: cov=$cov v1=$v1 v2=$v2")
    // Centering held: projections of centered data sum to ~0 (each
    // |Σp| ≤ n/2 from the half-up μ rounding, per-coordinate).
    assert(math.abs(p1.sum) <= 64.0 * 1e6,
      s"p1 not centered: sum=${p1.sum}")
  }
}
