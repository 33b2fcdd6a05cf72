package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-remediation join helpers — the hand tools for the hot-key
  * joins AQE's skew handling can't always rescue (e.g., a broadcast-
  * too-big dim with three keys carrying 90% of a 100 TB fact table).
  */
object Joins {

  /** Salted equi-join: spread each hot key's fact rows over `salt`
    * sub-partitions (salt = splitmix64(rowKey) mod salt — deterministic
    * and layout-invariant, no RNG state) while the small side explodes
    * one copy per salt value, then equi-join on (keys…, salt). The
    * result set is EXACTLY the plain join's (spec-asserted); the
    * shuffle's largest partition shrinks by ~salt×.
    *
    * Cost model: the small side grows salt× (keep salt modest — it
    * must still broadcast or shuffle cheaply); the big side gains one
    * codegen'd hash column. `rowKey` should be a per-row-distinct
    * column (a surrogate id); duplicate rowKeys merely co-locate those
    * rows on one salt; a NULL rowKey lands on salt 0 (coalesced — a
    * null salt would silently DROP matching rows under inner join,
    * breaking the exactly-the-plain-join contract; r7 ADVICE fix).
    * Supported joinType: inner / left (the exploded
    * small side covers every salt value, so left semantics hold). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      rowKey: Column, salt: Int, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(salt >= 2 && salt <= 1024, s"salt in [2, 1024], got $salt")
    require(Set("inner", "left", "leftouter", "left_outer")(joinType),
      s"saltedJoin supports inner/left, got $joinType")
    val b = big.withColumn("_salt",
      coalesce(
        pmod(graft.functions.splitmix64_rank(rowKey), lit(salt.toLong))
          .cast("int"),
        lit(0)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
