package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.Quantiles

/** graft.functions.Quantiles must match the brute-force
  * PERCENTILE_DISC definition (smallest value whose cumulative
  * distribution reaches p) on arbitrary grouped data — including ties,
  * single-row groups, and boundary fractions. */
class QuantilesSpec extends SparkSpecBase {

  private def bruteDisc(values: Seq[Long], p: Double): Long = {
    // smallest v with (#rows <= v) / n >= p == element at rank ceil(p*n)
    val sorted = values.sorted
    sorted(math.max(0, math.ceil(p * sorted.length).toInt - 1))
  }

  private val ps =
    Seq("q10" -> 0.1, "q50" -> 0.5, "q99" -> 0.99, "q100" -> 1.0)

  private val dataGen: Gen[Map[Int, List[Long]]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 3), Gen.nonEmptyListOf(Gen.choose(0L, 20L))))
    .map(_.toMap)

  test("histogram quantile matches brute-force percentile_disc") {
    import spark.implicits._
    val prop = Prop.forAll(dataGen) { groups =>
      val rows = groups.toSeq.flatMap { case (k, vs) => vs.map(v => (k, v)) }
      val got = Quantiles.discrete(rows.toDF("k", "v"), "k", "v", ps)
        .collect()
        .map(r => r.getAs[Int]("k") ->
          ps.map { case (name, _) => r.getAs[Long](name) }).toMap
      got.keySet == groups.keySet && groups.forall { case (k, vs) =>
        got(k) == ps.map { case (_, p) => bruteDisc(vs, p) }
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("NULL measures count neither as values nor in the denominator") {
    import spark.implicits._
    // Group 1: {1,2,3,null} — PERCENTILE_DISC over {1,2,3}: q50 = 2
    // (with the null counted, the denominator 4 would shift q50 to 2
    // only if ceil(0.5*4)=2 — use q34: ceil(.34*3)=2 vs ceil(.34*4)=2;
    // take q67: ceil(.67*3)=3 -> 3, with null ceil(.67*4)=3 -> 3 too.
    // Distinguishing case: q25 over {10,20}: ceil(.25*2)=1 -> 10; a
    // null counted in n=3 gives ceil(.75)=1 -> still 10 BUT a null
    // sorted first would shift the rank pick — assert exact outputs.)
    val df = Seq((1, Some(1L)), (1, Some(2L)), (1, Some(3L)), (1, None),
      (2, None), (2, Some(10L)), (2, Some(20L)))
      .toDF("k", "v")
    val got = Quantiles.discrete(df, "k", "v",
        Seq("q25" -> 0.25, "q50" -> 0.5, "q100" -> 1.0))
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("q25"), r.getAs[Long]("q50"), r.getAs[Long]("q100")))
      .toMap
    assert(got(1) == ((1L, 2L, 3L)), got)
    assert(got(2) == ((10L, 10L, 20L)), got)
  }

  test("an all-NULL group still emits its row, with NULL quantiles") {
    // SQL PERCENTILE_DISC keeps the group and returns NULL; dropping
    // the row would diverge from any oracle that aggregates the same
    // data.
    import spark.implicits._
    val df = Seq((1, Some(5L)), (2, Option.empty[Long]),
      (2, Option.empty[Long])).toDF("k", "v")
    val rows = Quantiles.discrete(df, "k", "v", Seq("q50" -> 0.5))
      .collect().map(r => r.getAs[Int]("k") ->
        Option(r.get(r.fieldIndex("q50")))).toMap
    assert(rows.keySet == Set(1, 2), rows)
    assert(rows(1).contains(5L), rows)
    assert(rows(2).isEmpty, rows)
  }

  test("fractions outside (0, 1] are rejected") {
    import spark.implicits._
    val df = Seq((1, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Quantiles.discrete(df, "k", "v", Seq("q0" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.discrete(df, "k", "v", Seq("q" -> 1.5))
    }
  }
}
