package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.{Kind, Model, Property}
import scala.jdk.CollectionConverters._

/** Model export reader (P3): parses the reference's exported Kind model
  * (a JSON array of kind objects, the `graph.export_model` output the
  * pipeline consumes — reference: collect_plugins.py:37-39,115-117) into
  * the Scala ADT that ModelCompiler compiles.
  */
object ModelJson {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): Model = {
    val root = mapper.readTree(json)
    require(root.isArray, "model export must be a JSON array of kinds")
    val kinds = root.elements().asScala.map(parseKind).toSeq
    Model(kinds.map(k => k.fqn -> k).toMap)
  }

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def parseKind(n: JsonNode): Kind = Kind(
    fqn = n.get("fqn").asText(),
    runtimeKind = opt(n, "runtime_kind").map(_.asText()),
    properties = opt(n, "properties")
      .map(_.elements().asScala.map(parseProperty).toSeq)
      .getOrElse(Seq.empty),
    bases = opt(n, "bases")
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty),
    aggregateRoot = opt(n, "aggregate_root").forall(_.asBoolean()),
    successorKinds = opt(n, "successor_kinds").map { sk =>
      sk.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
      }.toMap
    }.getOrElse(Map.empty))

  private def parseProperty(n: JsonNode): Property = Property(
    name = n.get("name").asText(),
    kind = n.get("kind").asText(),
    synthetic = opt(n, "synthetic").exists(_.asBoolean()),
    len = opt(n, "metadata").flatMap(m => opt(m, "len")).map(_.asInt()))
}
