package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Expose Spark's native bloom-filter sketch pair (the machinery behind
  * `spark.sql.optimizer.runtime.bloomFilter` InjectRuntimeFilter) as
  * callable functions, so a pipeline can build an EXPLICIT semi-join
  * pre-probe: aggregate the small side's join keys into a bloom filter
  * (`bloom_agg(xxhash64(k), estItems, numBits)` — a
  * TypedImperativeAggregate, partial+final, fixed-size state through
  * the exchange), then pre-filter the big side with the codegen'd
  * `bloom_might_contain(filterBytes, xxhash64(k))` BEFORE its shuffle.
  * No false negatives, so join output is identical; false positives
  * only cost the rows they pass. Same registration route as the other
  * custom expressions (no UDFs). */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
