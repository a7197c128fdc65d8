package graft

import org.apache.spark.sql.functions._

/** The bloom pre-probe's two contracts: NO false negatives (every row
  * that would join survives the probe — the gate's oracle identity
  * rides on this) and real pruning (only ~selectivity + fp of the big
  * side pays the downstream shuffle). Sizing is DERIVED from the build
  * side (ExtraQueries.bloomFilterFor: est = actual count, bits = est x
  * 8 clamped), so both contracts are asserted at two fixture scales —
  * a sizing rule that only prunes at one scale is a hardcode in
  * disguise. */
class BloomJoinSpec extends SparkSpecBase {

  private def checkAt(dir: String): Unit = {
    val small = Tables.t(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
    val bloomBytes = graft.queries.ExtraQueries.bloomFilterFor(
      small, "o_orderkey")
    // The shipped filter is a bounded scalar, not a broadcast relation.
    assert(bloomBytes.length < 200 * 1024, s"${bloomBytes.length} bytes")

    val lineitem = Tables.t(spark, dir, "lineitem")
    val probed = lineitem.filter(call_function("bloom_might_contain",
      lit(bloomBytes), xxhash64(col("l_orderkey"))))
    val total = lineitem.count()
    val probedN = probed.count()
    val matchingN = lineitem.join(small,
      lineitem("l_orderkey") === small("o_orderkey"), "left_semi").count()

    assert(probedN >= matchingN) // no false negatives, ever
    // ~1/97 true selectivity + ~2% fp at 8 bits/item: anything over 4%
    // means the derived sizing stopped pruning (e.g. the est/bits
    // arithmetic regressed to an under-sized filter).
    assert(probedN <= total * 4 / 100,
      s"$dir: probed $probedN of $total — bloom not pruning")
  }

  test("derived-size pre-probe passes every joining row and prunes, sf0.001") {
    checkAt("/root/testdata/sf0.001")
  }

  test("derived-size pre-probe holds its pruning factor at 10x the data") {
    checkAt("/root/testdata/sf0.01")
  }
}
