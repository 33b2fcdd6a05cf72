package graft.schema

import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** API-layer schema projections — the reference exposes its Document model
  * as a pydantic model with JSON-schema generation
  * (reference: docarray/document/pydantic_model.py:34-73) and as a
  * strawberry GraphQL type (reference: docarray/document/strawberry_type.py).
  * Here the same projections derive from the canonical Spark StructType, so
  * any Dataset schema (not just Doc) can serve REST/GraphQL contracts.
  *
  * Like the pydantic model, the Document projection is *unboundedly*
  * recursive — chunks/matches are `$ref`s to the Document definition
  * (`[Document]` in SDL), not depth-limited copies of it.
  */
object Projections {

  private val mapper = new ObjectMapper

  /** Spark DataType → JSON-Schema node. Binary maps to base64 string
    * content (matching the pydantic model's `blob: Optional[str]`). */
  private def typeNode(dt: DataType): ObjectNode = {
    val n = mapper.createObjectNode()
    dt match {
      case StringType => n.put("type", "string")
      case ByteType | ShortType | IntegerType | LongType => n.put("type", "integer")
      case FloatType | DoubleType | _: DecimalType => n.put("type", "number")
      case BooleanType => n.put("type", "boolean")
      case BinaryType =>
        n.put("type", "string"); n.put("contentEncoding", "base64")
      case DateType | TimestampType | TimestampNTZType =>
        n.put("type", "string"); n.put("format", "date-time")
      case ArrayType(et, _) =>
        n.put("type", "array"); n.set[ObjectNode]("items", typeNode(et))
      case MapType(_, vt, _) =>
        n.put("type", "object")
        n.set[ObjectNode]("additionalProperties", typeNode(vt))
      case st: StructType =>
        n.put("type", "object")
        val props = mapper.createObjectNode()
        st.fields.foreach(f => props.set[ObjectNode](f.name, typeNode(f.dataType)))
        n.set[ObjectNode]("properties", props)
        val req = st.fields.filterNot(_.nullable)
        if (req.nonEmpty) {
          val arr = n.putArray("required")
          req.foreach(f => arr.add(f.name))
        }
      case other => n.put("type", "string"); n.put("x-spark-type", other.simpleString)
    }
    n
  }

  /** Any StructType → a standalone JSON-Schema document string. */
  def toJsonSchema(schema: StructType, title: String = "Row"): String = {
    val root = typeNode(schema)
    root.put("title", title)
    root.put("$schema", "https://json-schema.org/draft/2020-12/schema")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** The Document model as a recursive JSON schema — the analog of
    * `PydanticDocument.schema_json()`: core fields from [[DocSchema.flat]],
    * chunks/matches as `$ref` arrays into `$defs/Document`. */
  def documentJsonSchema: String = {
    val doc = typeNode(DocSchema.flat)
    doc.put("title", "Document")
    val props = doc.get("properties").asInstanceOf[ObjectNode]
    Seq("chunks", "matches").foreach { f =>
      val arr = mapper.createObjectNode()
      arr.put("type", "array")
      val ref = mapper.createObjectNode()
      ref.put("$ref", "#/$defs/Document")
      arr.set[ObjectNode]("items", ref)
      props.set[ObjectNode](f, arr)
    }
    val root = mapper.createObjectNode()
    root.put("$schema", "https://json-schema.org/draft/2020-12/schema")
    root.put("$ref", "#/$defs/Document")
    val defs = mapper.createObjectNode()
    defs.set[ObjectNode]("Document", doc)
    root.set[ObjectNode]("$defs", defs)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Spark DataType → GraphQL SDL type expression. */
  private def sdlType(dt: DataType, owner: String, defs: StringBuilder,
      seen: scala.collection.mutable.Set[String]): String = dt match {
    case StringType => "String"
    case ByteType | ShortType | IntegerType | LongType => "Int"
    case FloatType | DoubleType | _: DecimalType => "Float"
    case BooleanType => "Boolean"
    case BinaryType => "String" // base64, like the pydantic projection
    case ArrayType(et, _) => s"[${sdlType(et, owner, defs, seen)}]"
    case MapType(_, _, _) => "JSON" // GraphQL has no map type; scalar JSON
    case st: StructType =>
      val name = owner
      if (!seen(name)) { seen += name; defs.append(sdlStruct(name, st, defs, seen)) }
      name
    case _ => "String"
  }

  private def sdlStruct(name: String, st: StructType, defs: StringBuilder,
      seen: scala.collection.mutable.Set[String]): String = {
    val fields = st.fields.map { f =>
      // GraphQL names cannot start with '_': expose _metadata as metadata_
      val fname = if (f.name.startsWith("_")) f.name.stripPrefix("_") + "_" else f.name
      val tname = f.dataType match {
        case s: StructType => sdlType(s, name + camel(f.name), defs, seen)
        case ArrayType(s: StructType, _) =>
          s"[${sdlType(s, name + camel(f.name), defs, seen)}]"
        case MapType(_, s: StructType, _) =>
          defs.append(sdlStruct(name + camel(f.name), s, defs, seen)); "JSON"
        case MapType(_, ArrayType(s: StructType, _), _) =>
          defs.append(sdlStruct(name + camel(f.name), s, defs, seen)); "JSON"
        case other => sdlType(other, name + camel(f.name), defs, seen)
      }
      val bang = if (f.nullable) "" else "!"
      s"  $fname: $tname$bang"
    }
    s"type $name {\n${fields.mkString("\n")}\n}\n"
  }

  private def camel(s: String): String =
    s.stripPrefix("_").split("_").filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail).mkString

  /** The Document model as GraphQL SDL — the `strawberry_type.py` analog.
    * chunks/matches recurse as `[Document]`. */
  def documentGraphqlSdl: String = {
    val defs = new StringBuilder
    val seen = scala.collection.mutable.Set[String]("Document")
    val core = DocSchema.flat.fields.map { f =>
      val fname = if (f.name.startsWith("_")) f.name.stripPrefix("_") + "_" else f.name
      s"  $fname: ${sdlType(f.dataType, "Document" + camel(f.name), defs, seen)}"
    }
    val doc = s"type Document {\n${core.mkString("\n")}\n" +
      "  chunks: [Document]\n  matches: [Document]\n}\n"
    "scalar JSON\n\n" + doc + defs.toString
  }
}
