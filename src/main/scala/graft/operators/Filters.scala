package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.schema.DocSchema

/** MongoDB-subset filter query language, compiled once to a Catalyst
  * `Column` tree — the declarative Spark counterpart of the reference's
  * per-document interpreted evaluator
  * (reference: docarray/array/queryset/parser.py:8-98 grammar,
  * docarray/array/queryset/lookup.py:39-129 operator semantics,
  * docarray/array/mixins/find.py:50-86 user-facing doc).
  *
  * Supported operators: `$eq $neq $ne $gt $gte $lt $lte $in $nin $regex
  * $size $exists $contains $icontains $startswith $istartswith $endswith
  * $iendswith` plus the combinators `$and $or $not` (sibling keys and list
  * members are implicit AND, like the reference).
  *
  * Field addressing: dunder (`tags__x`) or dotted (`tags.x`) paths walk
  * maps and structs (reference: lookup.py:57,239-247 dunder_partition).
  * A string value of the form `"{other__field}"` compares against another
  * field of the same row (reference: lookup.py:59-64).
  *
  * `$exists` follows the reference's "default value counts as missing"
  * semantics (reference: lookup.py:108-124): a field equal to its
  * documented default — empty string, 0 — is treated as not set.
  *
  * DELIBERATE DIVERGENCE — NULL under `$neq`/`$ne`: this compiler keeps
  * SQL three-valued logic (a NULL/missing field matches NO comparison,
  * `$neq` included), where the reference's interpreted evaluator
  * (lookup.py `neq` = Python `value != val`) returns True for a
  * missing/None field. SQL 3VL is what every downstream Spark/DuckDB
  * consumer of the compiled predicate expects, it is what parquet
  * PushedFilters implement, and it is pinned by the cross-engine fuzz
  * gate (q356/FilterFuzz — the DuckDB oracle predicate derives from the
  * same AST). Callers who want the reference's behavior ask for it
  * explicitly: `{"$or": [{"f": {"$neq": v}}, {"f": {"$exists": false}}]}`.
  *
  * Because the output is a plain `Column`, Catalyst pushes the compiled
  * predicate down to the parquet scan (PushedFilters) — the distributed
  * analogue of the reference's backend-native filter pushdown
  * (reference: storage/annlite/find.py:46-63, storage/elastic/find.py:139-160).
  */
object Filters {

  private val ops = Set(
    "$eq", "$neq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin",
    "$regex", "$size", "$exists", "$contains", "$icontains", "$startswith",
    "$istartswith", "$endswith", "$iendswith")

  /** Compile a JSON filter document to a boolean Column against `schema`. */
  def compile(filterJson: String, schema: StructType): Column =
    compileNode(JsonMethods.parse(filterJson), schema)

  /** `df.where(compile(...))` convenience. */
  def where(df: DataFrame, filterJson: String): DataFrame =
    df.where(compile(filterJson, df.schema))

  // ---------------------------------------------------------------------

  private def compileNode(v: JValue, schema: StructType): Column = v match {
    case JObject(fields) =>
      fields.map { case (key, value) => compileField(key, value, schema) }
        .reduceOption(_ && _).getOrElse(lit(true))
    case JArray(items) => // list of conditions = AND of members
      items.map(compileNode(_, schema)).reduceOption(_ && _).getOrElse(lit(true))
    case other =>
      throw new IllegalArgumentException(s"unsupported filter node: $other")
  }

  private def compileField(key: String, value: JValue, schema: StructType): Column =
    key match {
      case "$and" => value match {
        case JArray(items) =>
          items.map(compileNode(_, schema)).reduce(_ && _)
        case o => throw new IllegalArgumentException(s"$$and expects a list, got $o")
      }
      case "$or" => value match {
        case JArray(items) =>
          items.map(compileNode(_, schema)).reduce(_ || _)
        case o => throw new IllegalArgumentException(s"$$or expects a list, got $o")
      }
      case "$not" => !compileNode(value, schema)
      case path => value match {
        case JObject(opFields) if opFields.forall(f => ops.contains(f._1)) =>
          opFields.map { case (op, opVal) => compileOp(path, op, opVal, schema) }
            .reduce(_ && _)
        case JObject(o) =>
          throw new IllegalArgumentException(
            s"unknown operator(s) in ${o.map(_._1)} for field $path")
        case plain => compileOp(path, "$eq", plain, schema)
      }
    }

  /** Resolve a dunder/dotted path to (column, sparkType if known).
    * A field name that exactly matches a top-level column is taken whole —
    * so a column literally named `a.b` doesn't become a failed struct
    * walk — and backticks force that reading explicitly. */
  private[graft] def resolve(path: String, schema: StructType): (Column, Option[DataType]) = {
    val segs =
      if (path.length > 1 && path.startsWith("`") && path.endsWith("`"))
        Seq(path.substring(1, path.length - 1))
      else if (schema.fieldNames.contains(path)) Seq(path)
      else if (path.contains("__")) path.split("__").toSeq
      else path.split('.').toSeq
    val head = segs.head
    val topType = schema.fields.find(_.name == head).map(_.dataType)
    if (topType.isEmpty && segs.length == 1 && !schema.fieldNames.contains(head))
      throw new IllegalArgumentException(
        s"field '$head' not in schema [${schema.fieldNames.mkString(", ")}]")
    val headCol = if (head.contains(".")) col(s"`$head`") else col(head)
    segs.tail.foldLeft((headCol, topType)) { case ((c, t), seg) =>
      t match {
        case Some(MapType(_, vt, _)) => (c.getItem(seg), Some(vt))
        case Some(st: StructType) =>
          (c.getField(seg), st.fields.find(_.name == seg).map(_.dataType))
        case _ => (c.getItem(seg), None)
      }
    }
  }

  /** Coerce (column, literal) so comparisons are typed sensibly: numeric
    * literals against string-typed columns (e.g. `tags` values) compare
    * numerically, like the reference's python `==`/`>` on parsed values. */
  private def coerced(c: Column, t: Option[DataType], v: JValue, schema: StructType): (Column, Column) =
    v match {
      case JString(s) if s.length > 2 && s.startsWith("{") && s.endsWith("}") =>
        // placeholder: compare to another field of the same row
        val (other, _) = resolve(s.substring(1, s.length - 1), schema)
        (c, other)
      case JString(s) => (c, lit(s))
      case JBool(b) =>
        t match {
          case Some(BooleanType) => (c, lit(b))
          case _ => (c.cast(BooleanType), lit(b))
        }
      case JInt(i) =>
        t match {
          case Some(_: NumericType) => (c, lit(i.toLong))
          case _ => (c.cast(DoubleType), lit(i.toDouble))
        }
      case JLong(i) =>
        t match {
          case Some(_: NumericType) => (c, lit(i))
          case _ => (c.cast(DoubleType), lit(i.toDouble))
        }
      case JDouble(d) => (c.cast(DoubleType), lit(d))
      case JDecimal(d) => (c.cast(DoubleType), lit(d.toDouble))
      case JNull => (c, lit(null))
      case o => throw new IllegalArgumentException(s"unsupported literal: $o")
    }

  private def jvalues(v: JValue): Seq[JValue] = v match {
    case JArray(items) => items
    case o => throw new IllegalArgumentException(s"expected list, got $o")
  }

  private def compileOp(path: String, op: String, v: JValue, schema: StructType): Column = {
    lazy val (c0, t) = resolve(path, schema)
    op match {
      case "$eq" => val (c, l) = coerced(c0, t, v, schema); c === l
      case "$neq" | "$ne" => val (c, l) = coerced(c0, t, v, schema); c =!= l
      case "$gt" => val (c, l) = coerced(c0, t, v, schema); c > l
      case "$gte" => val (c, l) = coerced(c0, t, v, schema); c >= l
      case "$lt" => val (c, l) = coerced(c0, t, v, schema); c < l
      case "$lte" => val (c, l) = coerced(c0, t, v, schema); c <= l
      case "$in" | "$nin" =>
        val pairs = jvalues(v).map(coerced(c0, t, _, schema))
        val cc = pairs.headOption.map(_._1).getOrElse(c0)
        val cond = pairs.map(_._2).foldLeft(lit(false))((acc, l) => acc || cc === l)
        if (op == "$in") cond else !coalesce(cond, lit(false))
      case "$regex" => c0.rlike(v match {
        case JString(s) => s
        case o => throw new IllegalArgumentException(s"$$regex expects string, got $o")
      })
      case "$size" =>
        val (_, l) = coerced(lit(0), Some(IntegerType), v, schema)
        size(c0) === l.cast(IntegerType)
      case "$exists" =>
        val want = v match {
          case JBool(b) => b
          case o => throw new IllegalArgumentException(s"$$exists expects bool, got $o")
        }
        val ex = existsCol(path, c0, t)
        if (want) ex else !coalesce(ex, lit(false))
      case "$contains" => c0.contains(str(v))
      case "$icontains" => lower(c0).contains(str(v).toLowerCase)
      case "$startswith" => c0.startsWith(str(v))
      case "$istartswith" => lower(c0).startsWith(str(v).toLowerCase)
      case "$endswith" => c0.endsWith(str(v))
      case "$iendswith" => lower(c0).endsWith(str(v).toLowerCase)
      case o => throw new IllegalArgumentException(s"unsupported operator $o")
    }
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case o => throw new IllegalArgumentException(s"expected string, got $o")
  }

  /** "is set": non-null AND not equal to the field's default
    * (reference: lookup.py:108-124 — default value counts as missing). */
  private def existsCol(path: String, c: Column, t: Option[DataType]): Column = {
    val isTop = !path.contains("__") && !path.contains(".")
    val default = if (isTop) DocSchema.defaults.get(path) else None
    t match {
      case Some(_: ArrayType) | Some(_: MapType) => c.isNotNull && size(c) > 0
      case Some(StringType) => c.isNotNull && c =!= lit(default.getOrElse("").toString)
      case Some(_: NumericType) if default.isDefined =>
        c.isNotNull && c =!= lit(default.get)
      case _ => c.isNotNull
    }
  }
}
