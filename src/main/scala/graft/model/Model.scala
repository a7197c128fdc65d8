package graft.model

/** The runtime "Kind" type system the reference derives its relational
  * schema from (reference: usage at sql.py:166-170, schema_utils.py:39-63,
  * tests/conftest.py:24-64).
  *
  * A `Kind` is a named type: either a simple kind (`runtimeKind` set, e.g.
  * an enum refining "string"), or a complex kind with `properties` and
  * inheritance `bases`. `successorKinds` declares the default edge targets
  * (source of declared link tables).
  */
final case class Property(
    name: String,
    kind: String,
    synthetic: Boolean = false,
    len: Option[Int] = None)

final case class Kind(
    fqn: String,
    runtimeKind: Option[String] = None,
    properties: Seq[Property] = Seq.empty,
    bases: Seq[String] = Seq.empty,
    aggregateRoot: Boolean = true,
    successorKinds: Map[String, Seq[String]] = Map.empty)

final case class Model(kinds: Map[String, Kind]) {
  def apply(fqn: String): Kind = kinds(fqn)
  def get(fqn: String): Option[Kind] = kinds.get(fqn)
}

object Model {
  def apply(ks: Kind*): Model = Model(ks.map(k => k.fqn -> k).toMap)

  /** The simple kinds every model carries implicitly. */
  val simpleKinds: Set[String] = Set(
    "string", "int32", "int64", "float", "double", "boolean",
    "datetime", "date", "duration", "any")
}
