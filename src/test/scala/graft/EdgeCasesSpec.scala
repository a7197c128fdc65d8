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

  test("batch stream of an empty iterator emits nothing") {
    assert(BatchStream.batches(Iterator.empty[(String, Int)], 5, 10).isEmpty)
  }

  test("single-element stream flushes one singleton batch") {
    val out = BatchStream.batches(Iterator(("k", 1)), 5, 10).toSeq
    assert(out == Seq(("k", Seq(1))))
  }
}
