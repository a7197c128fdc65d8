package graft

import graft.ingest.Flatten
import graft.streaming.BatchStream
import graft.sources.GraphSource

/** Degenerate-input behavior: empty streams, empty graphs, short
  * documents — operators must return empty results, not throw. */
class EdgeCasesSpec extends SparkSpecBase {

  import ModelFixture.fixture

  private def emptyEnvelopes = {
    import spark.implicits._
    // Schema-bearing but row-free envelope frame.
    spark.read.json(spark.createDataset(Seq(
      """{"type":"node","id":"x","reported":{"kind":"some_instance","id":"x"},
         "ancestors":{"cloud":{"reported":{"id":"c"}}}}""",
      """{"type":"edge","from":"a","to":"b"}""").map(_.replaceAll("\n\\s*", " "))))
      .filter("false")
  }

  test("flatten of an empty envelope frame is empty with full schema") {
    val out = Flatten.flattenNodes(emptyEnvelopes,
      fixture("some_instance"), fixture)
    assert(out.count() == 0)
    assert(out.columns.length == 11)
    assert(Flatten.flattenEdges(emptyEnvelopes).count() == 0)
  }

  test("graph search over an empty graph returns no nodes") {
    val out = GraphSource.evaluate(emptyEnvelopes,
      GraphSource.Search("graph_root", minDepth = Some(2)), maxDepth = 3)
    assert(out.count() == 0)
  }

  test("q_approx_distinct sketch stays within 3x its configured rsd") {
    // The driver gate for this query is rows-only by design (sketch
    // results are implementation-specific), which would let a broken
    // sketch hide behind "rows match" — so bound the error here: every
    // group's HLL++ estimate must sit within 3x the 0.02 relative
    // standard deviation of the exact distinct count.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q_approx_distinct")(spark, dir)
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap, as) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("approx_supps"))
      val (ep, es) = (r.getAs[Long]("exact_parts"), r.getAs[Long]("exact_supps"))
      assert(math.abs(ap - ep) <= math.max(1L, (0.06 * ep).toLong),
        s"parts: approx $ap vs exact $ep")
      assert(math.abs(as - es) <= math.max(1L, (0.06 * es).toLong),
        s"supps: approx $as vs exact $es")
    }
  }

  test("batch stream of an empty iterator emits nothing") {
    assert(BatchStream.batches(Iterator.empty[(String, Int)], 5, 10).isEmpty)
  }

  test("single-element stream flushes one singleton batch") {
    val out = BatchStream.batches(Iterator(("k", 1)), 5, 10).toSeq
    assert(out == Seq(("k", Seq(1))))
  }
}
