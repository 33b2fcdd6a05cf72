package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, GetMapValue, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rewrites filter predicates on dynamic `tags['k']` lookups onto the
  * promoted typed column `tag_k` when the relation carries one — the
  * optimizer half of [[graft.operators.Promote]] (the reference's
  * `columns=[(name, type)]` backend config,
  * docarray/array/storage/annlite/backend.py:36-40: promoted tag keys
  * become typed, indexable columns there; here they become
  * pushdown-reachable parquet columns).
  *
  * A map lookup can never reach the parquet reader — `tags['i'] >= x`
  * scans every row group and decodes the whole map column. After the
  * rewrite the predicate references the plain `tag_i` attribute, so
  * FileSourceStrategy pushes it into the scan (PushedFilters, row-group
  * stats pruning) and the now-unreferenced map column is pruned from the
  * read schema entirely. At 100 TB that is the difference between
  * reading a wide map column everywhere and skipping whole files.
  *
  * CONTRACT (by naming convention, how [[graft.operators.Promote.tags]]
  * writes layouts): a column literally named `tag_<key>` sitting next to
  * a `tags: map<string,string>` column in the SAME relation output IS
  * the promotion `CAST(tags['<key>'] AS <its type>)` of that key —
  * value-consistent because the writer materialized it that way. The
  * rewrite only fires when the types line up exactly:
  * `CAST(tags['k'] AS dt)` needs `tag_k: dt`; a bare `tags['k']` lookup
  * needs `tag_k: string`. NULL semantics match on both shapes (missing
  * key → null ↔ promoted column stored null).
  */
object TagPromotionRule extends Rule[LogicalPlan] {

  private val TagsCol = "tags"
  private val Prefix = "tag_"

  private def isTagsMap(e: Expression): Boolean = e match {
    case a: Attribute => a.name == TagsCol && (a.dataType match {
      case MapType(StringType, StringType, _) => true
      case _ => false
    })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      // unique-by-name promoted candidates from the child's output
      val byName: Map[String, Attribute] = child.output
        .filter(_.name.startsWith(Prefix))
        .groupBy(_.name).collect { case (n, Seq(a)) => n -> a }
      // the promotion contract is per-relation: above a join, `tags` from one
      // side must not rewrite onto an unrelated `tag_k` from the other. Group
      // leaf outputs so we can require both attributes share a leaf.
      lazy val leafIdSets: Seq[Set[Long]] =
        child.collectLeaves().map(_.output.map(_.exprId.id).toSet)
      def sameLeaf(a: Attribute, b: Attribute): Boolean =
        leafIdSets.exists(s => s.contains(a.exprId.id) && s.contains(b.exprId.id))
      def promoted(key: String, dt: DataType, tags: Attribute): Option[Attribute] =
        byName.get(Prefix + key)
          .filter(_.dataType == dt).filter(sameLeaf(tags, _))
      if (byName.isEmpty) f
      else {
        // top-down: prefer the typed CAST(tags[k] AS dt) match over the
        // inner bare-lookup match it contains
        val newCond = cond.transformDown {
          case c @ Cast(GetMapValue(tags: Attribute, Literal(k: UTF8String, StringType)), dt, _, _)
              if isTagsMap(tags) && promoted(k.toString, dt, tags).isDefined =>
            promoted(k.toString, dt, tags).get
          case g @ GetMapValue(tags: Attribute, Literal(k: UTF8String, StringType))
              if isTagsMap(tags) && promoted(k.toString, StringType, tags).isDefined =>
            promoted(k.toString, StringType, tags).get
        }
        if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
      }
  }
}
