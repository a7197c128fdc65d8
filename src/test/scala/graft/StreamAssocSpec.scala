package graft

import org.apache.spark.sql.functions._

/** q_stream_assoc invariants (the folded VALUES are the DuckDB
  * oracle's job): a foreachBatch replay rewrites identical partials,
  * and any basket-preserving split folds to the batch answer. */
class StreamAssocSpec extends SparkSpecBase {

  import graft.queries.StreamQueries.assocBatch

  private def baskets(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  private def fold(root: String) =
    spark.read.parquet(s"$root/pairs")
      .groupBy("a", "b").agg(sum("c").as("co"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("replay rewrites identical partials; splits fold to the batch answer") {
    val log = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L),
      (2L, 20L), (3L, 10L), (3L, 20L), (3L, 40L))
    val whole = java.nio.file.Files
      .createTempDirectory("graft_sassoc_spec").toString
    assocBatch(baskets(log), whole, 0L)
    val expected = fold(whole)
    // (10,20) co-occurs in all three baskets.
    assert(expected.contains((10L, 20L, 3L)), expected)

    val split = java.nio.file.Files
      .createTempDirectory("graft_sassoc_spec").toString
    val (b0, b1) = log.partition(_._1 != 2L) // basket-preserving split
    assocBatch(baskets(b0), split, 0L)
    assocBatch(baskets(b1), split, 1L)
    assert(fold(split) == expected)
    // Replay batch 1: the partial dir is overwritten with the same
    // content, the fold is unchanged (exactly-once under replay).
    assocBatch(baskets(b1), split, 1L)
    assert(fold(split) == expected)
  }
}
