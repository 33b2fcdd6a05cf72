package graft

import org.apache.spark.sql.types._

/** Driver-stack schema hygiene for EVERY gate query.
  *
  * Round-6 lesson: all nine driver-red queries — and zero green ones —
  * shipped a raw DECIMAL(38,0) output column. The driver's duckdb→pandas
  * canonicalization hashes Decimal representation-sensitively (and a
  * float64 round-trip is lossy above 2^53), so exact-arithmetic results
  * must leave the plan as guarded BIGINTs (or hi/lo pairs). This spec
  * makes the class of bug impossible to reintroduce: it walks every
  * SparkEntry query's OUTPUT SCHEMA (construction only — no execution)
  * and fails on any Decimal anywhere in the type tree.
  */
class GateSchemaSpec extends SparkSuite {

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType   => hasDecimal(a.elementType)
    case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _              => false
  }

  test("no gate query emits a Decimal output column") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, dir).schema
        schema.fields.collect {
          case f if hasDecimal(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"\nDecimal gate columns (cast to guarded BIGINT — r6 driver-hash " +
        s"lesson):\n  ${offenders.mkString("\n  ")}")
  }
}
