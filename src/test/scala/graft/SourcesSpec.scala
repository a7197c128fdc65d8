package graft

import graft.sources.{GraphSource, ModelJson}
import graft.model.Property

/** Graph-source + model-export reader tests (P1/P2/P3). */
class SourcesSpec extends SparkSpecBase {

  private lazy val envelopes = {
    import spark.implicits._
    // root -> cloud -> account: the depth-shape of the reference's
    // remote-graph fixture (tests/conftest.py:67-85).
    val lines = Seq(
      """{"type":"node","id":"root","reported":{"kind":"graph_root","id":"root"}}""",
      """{"type":"node","id":"c1","reported":{"kind":"cloud","id":"c1"}}""",
      """{"type":"node","id":"a1","reported":{"kind":"account","id":"a1"}}""",
      """{"type":"node","id":"a2","reported":{"kind":"account","id":"a2"}}""",
      """{"type":"edge","from":"root","to":"c1"}""",
      """{"type":"edge","from":"c1","to":"a1"}""",
      """{"type":"edge","from":"c1","to":"a2"}""")
    spark.read.json(spark.createDataset(lines))
  }

  test("search parser handles the reference default") {
    assert(GraphSource.parseSearch("is(graph_root) -[2:]->") ==
      Some(GraphSource.Search("graph_root", minDepth = Some(2))))
    assert(GraphSource.parseSearch("is(aws.ec2_instance)") ==
      Some(GraphSource.Search("aws.ec2_instance")))
    assert(GraphSource.parseSearch("name == foo") == None)
  }

  test("search parser handles bounded traversal and property filters") {
    assert(GraphSource.parseSearch("is(graph_root) -[2:5]->") ==
      Some(GraphSource.Search("graph_root", minDepth = Some(2),
        maxDepth = Some(5))))
    assert(GraphSource.parseSearch(
      """is(cloud) and name == "aws" and cores > 2 -[1:3]->""") ==
      Some(GraphSource.Search("cloud",
        Seq(GraphSource.PropFilter("name", "==", "aws"),
          GraphSource.PropFilter("cores", ">", "2")),
        Some(1), Some(3))))
    // A malformed filter tail must fail the whole parse, not be dropped.
    assert(GraphSource.parseSearch("is(cloud) garbage") == None)
  }

  test("is(kind) filters nodes") {
    val out = GraphSource.evaluate(envelopes,
      GraphSource.Search("account"))
    assert(out.select("id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a1", "a2"))
  }

  test("is(graph_root) -[2:]-> returns depth>=2 descendants") {
    val out = GraphSource.evaluate(envelopes,
      GraphSource.Search("graph_root", minDepth = Some(2)), maxDepth = 4)
    assert(out.select("id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a1", "a2"))
  }

  test("bounded -[1:1]-> prunes the deeper level") {
    val out = GraphSource.evaluate(envelopes,
      GraphSource.parseSearch("is(graph_root) -[1:1]->").get)
    assert(out.select("id").collect().map(_.getString(0)).toSeq ==
      Seq("c1"))
  }

  test("property filter restricts the root set") {
    val out = GraphSource.evaluate(envelopes,
      GraphSource.parseSearch("""is(account) and id == "a1"""").get)
    assert(out.select("id").collect().map(_.getString(0)).toSeq ==
      Seq("a1"))
  }

  test("source round-trip preserves node and edge counts") {
    // The remote-graph contract: re-materializing a dumped graph loses
    // nothing (reference: tests/remote_graph_test.py:11-25).
    assert(GraphSource.nodes(envelopes).count() == 4)
    assert(GraphSource.edges(envelopes).count() == 3)
  }

  test("model export JSON round-trips into the ADT") {
    val m = ModelJson.fromJson(
      """[
        |{"fqn":"resource","aggregate_root":true,
        | "properties":[{"name":"id","kind":"string"},
        |   {"name":"name","kind":"string","metadata":{"len":34}},
        |   {"name":"age","kind":"duration","synthetic":true}]},
        |{"fqn":"some_instance","bases":["resource"],
        | "properties":[{"name":"cores","kind":"int32"}],
        | "successor_kinds":{"default":["some_volume"]}},
        |{"fqn":"color","runtime_kind":"string"}
        |]""".stripMargin)
    assert(m("some_instance").bases == Seq("resource"))
    assert(m("some_instance").successorKinds("default") == Seq("some_volume"))
    assert(m("resource").properties(1) ==
      Property("name", "string", synthetic = false, len = Some(34)))
    assert(m("resource").properties(2).synthetic)
    assert(m("color").runtimeKind == Some("string"))
  }
}
