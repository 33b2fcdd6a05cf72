package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Salted skew join: exact equality with the plain join, left
  * semantics with unmatched rows, parameter refusal, and the salt
  * actually spreading a hot key. */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  private val big = (0 until 2000).map { i =>
    (i.toLong, if (i % 10 == 0) "cold" + (i % 7) else "hot") // heavy skew
  }.toDF("id", "k")
  private val dim = (Seq("hot") ++ (0 until 7).map("cold" + _))
    .map(k => (k, k.length)).toDF("k", "attr")

  test("inner salted join equals the plain join exactly") {
    val plain = big.join(dim, "k")
      .select("id", "k", "attr").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    val salted = Joins.saltedJoin(big, dim, Seq("k"), col("id"), salt = 8)
      .select("id", "k", "attr").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("left salted join keeps unmatched rows with null attrs") {
    val withOrphans = big.unionByName(
      Seq((99999L, "nodim")).toDF("id", "k"))
    val out = Joins.saltedJoin(withOrphans, dim, Seq("k"), col("id"),
        salt = 4, joinType = "left")
      .where(col("k") === "nodim").collect()
    assert(out.length === 1 && out.head.isNullAt(2))
  }

  test("the hot key's rows actually spread over the salt space") {
    val spread = big.where(col("k") === "hot")
      .select(pmod(graft.functions.splitmix64_rank(col("id")), lit(8L))
        .as("s"))
      .groupBy("s").count().collect()
    assert(spread.length === 8) // all 8 salts occupied
    assert(spread.map(_.getLong(1)).max < 1800 * 0.25) // no salt hogs it
  }

  test("a NULL rowKey still joins (coalesced onto salt 0)") {
    val withNullKey = big.select(
      when(col("id") === 7L, lit(null).cast("long"))
        .otherwise(col("id")).as("id"), col("k"))
    val plain = withNullKey.join(dim, "k").count()
    val salted = Joins.saltedJoin(withNullKey, dim, Seq("k"), col("id"),
      salt = 8).count()
    assert(salted === plain) // the null-id row must NOT drop
    val nullRow = Joins.saltedJoin(withNullKey, dim, Seq("k"), col("id"),
      salt = 8).where(col("id").isNull).collect()
    assert(nullRow.length === 1)
  }

  test("parameter refusal: bad salt and unsupported join type") {
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, dim, Seq("k"), col("id"), salt = 1)
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, dim, Seq("k"), col("id"), 4, joinType = "full")
    }
  }
}
