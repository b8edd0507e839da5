// Correlated latest-row rewrite as a compiled Catalyst rule
// (SURVEY.md §4 J5/J6; the resolved-plan twin of plans/rewrite.py).
//
// The reference emits correlated scalar subqueries of the shape
//
//     (SELECT price_in_zig FROM prices
//      WHERE token_id = p.quote_token_id
//      ORDER BY updated_at DESC LIMIT 1)          -- trades.js:295 etc.
//
// Spark decorrelates this through a ranking window (sort + window +
// filter: ~4 exchanges of the full state table). This rule rewrites the
// subquery PLAN — after analysis, before optimization — into the
// aggregate form
//
//     (SELECT max_by(price_in_zig, updated_at) FROM prices
//      WHERE token_id = p.quote_token_id)
//
// which Catalyst's RewriteCorrelatedScalarSubquery turns into ONE hash
// aggregation per key + a left outer join: exactly the latest_* view
// plan the engine standardizes on (plans/views.py). Semantics match the
// original: empty input yields scalar NULL in both forms, and tie
// resolution is unspecified in both (ORDER BY DESC LIMIT 1 over equal
// keys picks an arbitrary row, as does max_by).
//
// Matching fires only on state tables named by
// spark.degenter.latestRewrite.tables (default
// "prices,pool_state,trades,pools" — trades/pools are the reference's
// EARLIEST-row probe targets: the first-provide lookup in
// jobs/fasttrack-listener.js:122-137 and the first-pool lookup in
// api/util/pool-select.js:5-15, both ORDER BY ... ASC LIMIT 1 -> the
// min_by branch below), by the presence of a SubqueryAlias with that
// name inside the subquery — the same guard list the pre-parse shim
// uses, so user queries over other tables are never touched.
package degenter.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, CreateStruct, Descending, Expression, Literal,
  NamedExpression, NullsLast, SortDirection, SortOrder
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, MaxBy, MinBy
}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.SparkSession

object LatestRowRewrite extends Rule[LogicalPlan] {

  private def allowedTables: Set[String] = {
    val conf = SparkSession.active.conf
    conf
      .get(
        "spark.degenter.latestRewrite.tables",
        "prices,pool_state,trades,pools"
      )
      .split(",")
      .map(_.trim.toLowerCase)
      .filter(_.nonEmpty)
      .toSet
  }

  private def touchesAllowedTable(plan: LogicalPlan): Boolean = {
    val allowed = allowedTables
    plan.exists {
      case SubqueryAlias(id, _) => allowed.contains(id.name.toLowerCase)
      case _                    => false
    }
  }

  private object Limit1 {
    def unapply(plan: LogicalPlan): Option[LogicalPlan] = plan match {
      case GlobalLimit(Literal(1, _), LocalLimit(Literal(1, _), child)) =>
        Some(child)
      case _ => None
    }
  }

  // Uniform-direction ORDER BY keys collapse to one ordering
  // expression: a single key as-is, multiple keys as a struct (struct
  // comparison is field-wise lexicographic — exactly multi-key sort
  // semantics when every key shares the direction). DESC -> max_by,
  // ASC -> min_by (the reference's O3 latest-1 and O4 earliest-1
  // lookups respectively).
  private object UniformOrder {
    // min_by/max_by skip NULL ordering keys, but a Sort places them
    // per its null ordering — rewriting is only sound when the key
    // cannot be NULL, or NULLs sort LAST (so LIMIT 1 also skips them;
    // the degenerate every-row-null group still differs and keeps the
    // original plan via the nullable guard).
    private def keyOk(so: SortOrder): Boolean =
      !so.child.nullable || so.nullOrdering == NullsLast

    def unapply(order: Seq[SortOrder]): Option[(Expression, SortDirection)] =
      order match {
        case Seq(so @ SortOrder(ord, dir, _, _)) if keyOk(so) =>
          Some((ord, dir))
        case many
            if many.nonEmpty && many.map(_.direction).distinct.size == 1 &&
              many.forall(so => !so.child.nullable) =>
          // struct comparison with a NULL field has its own ordering;
          // multi-key therefore requires non-nullable keys outright
          Some((CreateStruct(many.map(_.child)), many.head.direction))
        case _ => None
      }
  }

  // SELECT col ... ORDER BY keys LIMIT 1, as the analyzer shapes it:
  // either Project above Sort (ORDER BY column not in the select list;
  // the analyzer widened a lower Project and trims on top) or Sort
  // directly above a single-column Project (ORDER BY the selected
  // column).
  private def asMaxBy(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case Project(
          Seq(out: Attribute),
          Sort(UniformOrder(ord, dir), true, child, _)
        ) if child.outputSet.contains(out) =>
      Some(aggregate(out, ord, dir, child))
    case Sort(
          UniformOrder(ord, dir),
          true,
          Project(Seq(out: Attribute), child),
          _
        ) if ord.references.subsetOf(child.outputSet) =>
      Some(aggregate(out, ord, dir, child))
    case _ => None
  }

  private def aggregate(
      out: Attribute,
      ord: Expression,
      dir: SortDirection,
      child: LogicalPlan
  ): LogicalPlan = {
    val fn = dir match {
      case Descending => MaxBy(out, ord)
      case Ascending  => MinBy(out, ord)
    }
    val agg = AggregateExpression(fn, Complete, isDistinct = false)
    // keep the original exprId so the outer ScalarSubquery reference
    // (plan.output.head) stays valid without touching the parent
    val named: NamedExpression = Alias(agg, out.name)(exprId = out.exprId)
    Aggregate(Nil, Seq(named), child)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ss: ScalarSubquery =>
        ss.plan match {
          case Limit1(inner) if touchesAllowedTable(inner) =>
            asMaxBy(inner) match {
              case Some(rewritten) => ss.copy(plan = rewritten)
              case None            => ss
            }
          case _ => ss
        }
    }
}

class DegenterSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => LatestRowRewrite)
  }
}
