package graft.model

import org.apache.spark.sql.types._

/** Compiles the runtime Kind model into Spark schemas: one StructType per
  * concrete aggregate-root kind plus (from_id, to_id) link tables — the
  * analogue of the reference's create_schema/kind_properties
  * (reference: sql.py:179-225, schema_utils.py:39-63, arrow/model.py:30-67).
  */
object ModelCompiler {

  /** Denormalized ancestry columns appended to every table
    * (reference: schema_utils.py:19-24). */
  val carz: Seq[String] = Seq("cloud", "account", "region", "zone")

  /** Abstract bases that never get a table of their own
    * (reference builds this by class introspection, schema_utils.py:13-15;
    * here it is explicit model metadata). */
  val defaultBaseKinds: Set[String] =
    Set("resource", "base_resource", "phantom_resource")

  /** Kinds that materialize as tables: concrete aggregate roots
    * (reference: sql.py:166-170, arrow/model.py:17-21). */
  def tableKinds(model: Model, baseKinds: Set[String] = defaultBaseKinds): Seq[Kind] =
    model.kinds.values.toSeq
      .filter(k => k.aggregateRoot && k.runtimeKind.isEmpty &&
        !baseKinds.contains(k.fqn))
      .sortBy(_.fqn)

  /** Transitive property closure over `bases`: child shadows parent on
    * name collision, cycle-safe, synthetic props and the `kind`
    * discriminator dropped (reference: schema_utils.py:39-63). */
  def kindProperties(kind: Kind, model: Model): Seq[Property] = {
    val seen = scala.collection.mutable.Set[String]()
    val out = scala.collection.mutable.LinkedHashMap[String, Property]()
    def walk(k: Kind): Unit = {
      if (!seen.contains(k.fqn)) {
        seen += k.fqn
        k.properties.foreach { p =>
          if (!p.synthetic && p.name != "kind" && !out.contains(p.name))
            out += p.name -> p
        }
        k.bases.flatMap(model.get).foreach(walk)
      }
    }
    walk(kind)
    out.values.toSeq
  }

  /** Kind name → Spark DataType (SURVEY.md §1.3 mapping; fixes the
    * reference's float fall-through bug, arrow/type_converter.py:16-17).
    * Complex kinds recurse into StructType (parquet-native nesting). */
  def toDataType(kindName: String, model: Model): DataType = kindName match {
    case "int32" => IntegerType
    case "int64" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "string" | "duration" => StringType
    case "datetime" => TimestampType
    case "date" => DateType
    case "any" => StringType // JSON text
    case a if a.endsWith("[]") =>
      ArrayType(toDataType(a.dropRight(2), model))
    case m if m.startsWith("dictionary[") =>
      val inner = m.stripPrefix("dictionary[").stripSuffix("]")
      val Array(k, v) = inner.split(",", 2).map(_.trim)
      MapType(toDataType(k, model), toDataType(v, model))
    case other => model.get(other) match {
      case Some(k) if k.runtimeKind.isDefined => // refined simple kind
        toDataType(k.runtimeKind.get, model)
      case Some(k) => // complex kind -> nested struct
        StructType(k.properties.filterNot(_.synthetic).map(p =>
          StructField(p.name, toDataType(p.kind, model))))
      case None => StringType // unknown kind: opaque JSON text
    }
  }

  /** Row schema for one concrete kind: `_id` + flattened properties +
    * carz ancestry (reference: schema_utils.py:62-63, sql.py:187). */
  def tableSchema(kind: Kind, model: Model): StructType = {
    val props = kindProperties(kind, model).map(p =>
      StructField(p.name, toDataType(p.kind, model)))
    StructType(
      StructField("_id", StringType, nullable = false) +:
        props :+
        StructField("cloud", StringType) :+
        StructField("account", StringType) :+
        StructField("region", StringType) :+
        StructField("zone", StringType))
  }

  /** Link tables are always exactly (from_id, to_id)
    * (reference: sql.py:201, arrow/model.py:43-48). */
  val linkSchema: StructType = StructType(Seq(
    StructField("from_id", StringType, nullable = false),
    StructField("to_id", StringType, nullable = false)))

  /** fqn → table name (`.` → `_`, reference: schema_utils.py:17). */
  def tableName(fqn: String): String = fqn.replace(".", "_")

  /** Staging prefix (reference: schema_utils.py:17). */
  def tmpName(name: String): String = s"tmp_$name"

  /** Link table name, truncated to 25+25 chars for the 63-char
    * identifier budget (reference: schema_utils.py:28-36; collisions
    * between long kind names are accepted — it is the contract). */
  def linkTableName(fromKind: String, toKind: String): String =
    s"link_${tableName(fromKind).take(25)}_${tableName(toKind).take(25)}"

  /** SQL string width class from the `len` metadata — kept for JDBC-sink
    * parity (reference: sql.py:92-100): >1024 → TEXT, <32 → 32, else
    * next power of two. */
  def sqlStringWidth(len: Option[Int]): Option[Int] = len match {
    case None => Some(255)
    case Some(n) if n > 1024 => None // TEXT
    case Some(n) if n < 32 => Some(32)
    case Some(n) => Some(Integer.highestOneBit(n - 1) * 2)
  }

  /** Full relational layout: table-per-kind + link tables from declared
    * successor kinds and observed edge pairs (reference: sql.py:179-225:
    * the three create_schema steps). Only default-type edges participate.
    */
  def tables(model: Model,
      observedEdges: Set[(String, String)] = Set.empty,
      baseKinds: Set[String] = defaultBaseKinds): Map[String, StructType] = {
    val kinds = tableKinds(model, baseKinds)
    val kindTables = kinds.map(k => tableName(k.fqn) -> tableSchema(k, model))
    val declared = for {
      k <- kinds
      to <- k.successorKinds.getOrElse("default", Seq.empty)
    } yield (k.fqn, to)
    val links = (declared.toSet ++ observedEdges).toSeq.sorted
      .map { case (f, to) => linkTableName(f, to) -> linkSchema }
    (kindTables ++ links).toMap
  }
}
