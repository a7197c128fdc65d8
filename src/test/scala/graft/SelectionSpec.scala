package graft

import scala.util.Random

/** Selection.kthSmallest vs the definitional sorted-index reference:
  * exact for every rank on adversarial shapes (duplicates, clustered
  * values, huge-domain spreads, tiny bucket counts that force many
  * refinement passes). */
class SelectionSpec extends SparkSpecBase {

  import graft.queries.Selection

  private def df(xs: Seq[Long]) = {
    import spark.implicits._
    xs.toDF("v")
  }

  test("kth matches the sorted reference on duplicates and clusters") {
    val xs = Seq(5L, 5L, 5L, 1L, 9L, 9L, 1000000007L, 0L, 5L)
    val sorted = xs.sorted
    for (k <- 1 to xs.length)
      assert(Selection.kthSmallest(df(xs), "v", k.toLong,
        buckets = 4) == sorted(k - 1), s"k=$k")
  }

  test("huge-domain spread forces multiple refinement passes and stays exact") {
    val xs = Seq(0L, 1L, Long.MaxValue / 2, Long.MaxValue / 2 + 1,
      Long.MaxValue - 1)
    val sorted = xs.sorted
    for (k <- 1 to xs.length)
      assert(Selection.kthSmallest(df(xs), "v", k.toLong,
        buckets = 4) == sorted(k - 1), s"k=$k")
  }

  test("full signed domain: MinValue..MaxValue together stays exact") {
    // The sign-straddling span exceeds a signed Long — the sign-split
    // pass must fix the regime before any bucket arithmetic runs.
    val xs = Seq(Long.MinValue, Long.MinValue + 1, -7L, -1L, 0L, 3L,
      Long.MaxValue - 1, Long.MaxValue)
    val sorted = xs.sorted
    for (k <- 1 to xs.length)
      assert(Selection.kthSmallest(df(xs), "v", k.toLong,
        buckets = 4) == sorted(k - 1), s"k=$k")
  }

  test("all-negative domain narrows without wrap") {
    val xs = Seq(-1000000007L, -5L, -5L, -1L, Long.MinValue / 2)
    val sorted = xs.sorted
    for (k <- 1 to xs.length)
      assert(Selection.kthSmallest(df(xs), "v", k.toLong,
        buckets = 4) == sorted(k - 1), s"k=$k")
  }

  test("property: sampled ranks of random multisets are exact") {
    val rnd = new Random(42)
    (1 to 8).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      // Mix huge-spread values with deliberate duplicates.
      val xs = Seq.fill(n)(rnd.nextInt(3) match {
        case 0 => rnd.nextLong(1L << 40)
        case 1 => (rnd.nextInt(4) * 1000L)
        case _ => -rnd.nextLong(1L << 40) // sign-straddling mixes
      })
      val sorted = xs.sorted
      val d = df(xs)
      Seq(1, (n + 1) / 2, n).distinct.foreach { k =>
        assert(Selection.kthSmallest(d, "v", k.toLong, buckets = 16)
          == sorted(k - 1), s"trial=$trial k=$k xs=$xs")
      }
    }
  }
}
