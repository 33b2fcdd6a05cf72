package graft

import org.apache.spark.sql.types._

/** Canary for the driver-generated testdata contract. The generator has
  * changed physical types across rounds before (round 5: events.ts and
  * o_orderdate switched TIMESTAMP(NANOS) → TIMESTAMP(MICROS), breaking
  * five queries at resolution depth) — this spec pins what the engine
  * actually relies on, so the NEXT change fails here first with a
  * readable message instead of deep inside a query plan. Tolerated type
  * sets (not exact types) encode exactly the flexibility the readers
  * implement. */
class TestdataContractSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def schemaOf(table: String): StructType =
    spark.read.parquet(s"$dir/$table.parquet").schema

  private def assertCols(table: String, want: Map[String, Set[DataType]]): Unit = {
    val s = schemaOf(table)
    val have = s.fields.map(f => f.name -> f.dataType).toMap
    for ((name, okTypes) <- want) {
      assert(have.contains(name),
        s"$table.parquet lost column '$name' — present: ${s.fieldNames.mkString(", ")}")
      assert(okTypes.contains(have(name)),
        s"$table.parquet column '$name' is ${have(name).sql}; engine readers " +
        s"handle only: ${okTypes.map(_.sql).mkString(", ")} — extend the " +
        "reader normalization (see SparkEntry.events / EventStream.normalizeTs)")
    }
  }

  private val tsTypes: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("events: ts readable as long nanos; value/props shapes") {
    assertCols("events", Map(
      "event_id" -> Set(LongType),
      "ts" -> tsTypes,
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)))
  }

  test("orders: orderdate castable to timestamp") {
    assertCols("orders", Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsTypes))
  }

  test("documents and embeddings: text/embedding shapes") {
    assertCols("documents", Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)))
    assertCols("embeddings", Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set[DataType](
        ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = true),
        ArrayType(DoubleType, containsNull = false)),
      "label" -> Set(IntegerType, LongType)))
  }

  test("tpch star: key columns present with joinable types") {
    assertCols("lineitem", Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType)))
    assertCols("customer", Map(
      "c_custkey" -> Set(LongType), "c_nationkey" -> Set(IntegerType, LongType)))
    assertCols("nation", Map(
      "n_nationkey" -> Set(IntegerType, LongType),
      "n_regionkey" -> Set(IntegerType, LongType)))
    assertCols("region", Map("r_regionkey" -> Set(IntegerType, LongType)))
    assertCols("supplier", Map(
      "s_suppkey" -> Set(LongType), "s_nationkey" -> Set(IntegerType, LongType)))
    assertCols("part", Map(
      "p_partkey" -> Set(LongType), "p_retailprice" -> Set(DoubleType)))
  }
}
