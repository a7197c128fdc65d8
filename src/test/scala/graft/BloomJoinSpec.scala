package graft

import org.apache.spark.sql.functions._

/** The bloom pre-probe's two contracts: NO false negatives (every row
  * that would join survives the probe — the gate's oracle identity
  * rides on this) and real pruning (only ~selectivity + fp of the big
  * side pays the downstream shuffle). */
class BloomJoinSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("pre-probe passes every joining row and prunes the rest") {
    graft.functions.BloomFunctions.register(spark)
    val small = Tables.t(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
    val bloomBytes = small
      .agg(expr("bloom_agg(xxhash64(o_orderkey), 100000L, 800000L)"))
      .head().getAs[Array[Byte]](0)
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
    // ~1/97 true selectivity + ~1% fp: anything over 3% means the
    // filter stopped pruning (e.g. under-sized bits).
    assert(probedN <= total * 3 / 100,
      s"probed $probedN of $total — bloom not pruning")
  }
}
