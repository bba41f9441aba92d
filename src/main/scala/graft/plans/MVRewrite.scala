package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression, ParseToDate, Round}
import org.apache.spark.sql.types.DateType
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** MATERIALIZED-VIEW substitution — the third injected optimizer rule
  * (after [[RankFilterToGroupedTopK]] and [[RedundantGroupLimitBelowTopK]]):
  * when a query re-derives an aggregate the warehouse already maintains,
  * answer it from the summary instead of the fact. The registered contract
  * here is the daily-revenue rollup (GROUP BY to_date(o_orderdate),
  * SUM(CAST(round(o_totalprice·100) AS BIGINT)) — the q173-maintained
  * shape); a matching Aggregate over the orders scan is replaced by a
  * Project over the MV's (pre-analyzed) plan, re-aliased onto the
  * original output attribute ids so nothing above the Aggregate notices.
  * At 100 TB this is the difference between scanning the fact and
  * scanning |days| rows — the single biggest win a warehouse optimizer
  * can hand a dashboard query.
  *
  * Scope and soundness: the rule fires only for sessions that inject it
  * (q122's `experimental.extraOptimizations` discipline — session-scoped,
  * never global); registration asserts the freshness contract (the MV is
  * maintained by q77/q173-style refresh — a stale MV is a registration
  * bug, exactly as in Calcite/Snowflake MV rewrite); the match is
  * STRUCTURAL (to_date over o_orderdate; Sum of a Long-cast Round over
  * o_totalprice·100 — constant-folded or not), so alias names are free.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  /** fact-path suffix → analyzed MV plan with output (day, cents). */
  val registry =
    new scala.collection.concurrent.TrieMap[String, LogicalPlan]

  /** The subtree below the Aggregate must be EXACTLY the bare orders scan:
    * one leaf, and every node either a pruning/grouping-extraction Project
    * or the LogicalRelation itself. A Filter, Join, Union, or any other
    * operator anywhere below means the query does NOT compute the
    * registered rollup (a filtered or joined variant would silently read
    * the UNFILTERED summary — wrong results), so the rewrite must not
    * fire. */
  private def isOrdersScan(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    leaves.length == 1 &&
      p.collect { case n => n }.forall {
        case _: Project        => true
        case _: LogicalRelation => true
        case _                 => false
      } &&
      (leaves.head match {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.endsWith("orders.parquet"))
          case _ => false
        }
        case _ => false
      })
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => stripAlias(c)
    case other       => other
  }

  /** to_date(o_orderdate) in either life stage: the analyzed ParseToDate
    * or the optimizer-lowered Cast(o_orderdate AS DATE). */
  private def isDayOfOrderdate(e: Expression): Boolean = stripAlias(e) match {
    case td: ParseToDate => td.left match {
      case a: AttributeReference => a.name == "o_orderdate"
      case Cast(a: AttributeReference, _, _, _) => a.name == "o_orderdate"
      case _ => false
    }
    case Cast(a: AttributeReference, DateType, _, _) => a.name == "o_orderdate"
    case _ => false
  }

  private def isCentsSum(e: Expression): Boolean = stripAlias(e) match {
    case AggregateExpression(Sum(c, _), _, false, None, _) =>
      c.dataType == LongType &&
        c.exists { case r: Round => true; case _ => false } &&
        c.exists { case a: AttributeReference => a.name == "o_totalprice"
                   case _ => false } &&
        c.exists { case Literal(v, _) => v != null && v.toString.startsWith("100")
                   case _ => false }
    case _ => false
  }

  /** Resolve the grouping expression: either inline, or extracted by the
    * optimizer into `_groupingexpression` defined in a Project below. */
  private def groupingDef(g: Expression, child: LogicalPlan): Option[Expression] =
    g match {
      case a: AttributeReference => child match {
        case Project(projList, _) =>
          projList.collectFirst {
            case al @ Alias(c, _) if al.exprId == a.exprId => c
          }
        case _ => None
      }
      case other => Some(other)
    }

  /** The grouped output column may be the grouping attr itself or an
    * alias of it / of the day expression. */
  private def outIsDay(out: NamedExpression, g: Expression,
      child: LogicalPlan): Boolean = stripAlias(out) match {
    case a: AttributeReference =>
      g.references.isEmpty || (g match {
        case ga: AttributeReference => ga.exprId == a.exprId
        case _ => false
      }) || groupingDef(a, child).exists(isDayOfOrderdate)
    case e => isDayOfOrderdate(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(g), outs, child, _)
        if registry.nonEmpty && isOrdersScan(child) &&
          groupingDef(g, child).exists(isDayOfOrderdate) &&
          outs.length == 2 && outIsDay(outs.head, g, child) &&
          isCentsSum(outs(1)) =>
      registry.get("orders.parquet") match {
        case Some(mv) =>
          val Seq(mvDay, mvCents) = mv.output.take(2)
          val reAliased: Seq[NamedExpression] = Seq(
            Alias(mvDay, outs.head.name)(exprId = outs.head.exprId),
            Alias(mvCents, outs(1).name)(exprId = outs(1).exprId))
          Project(reAliased, mv)
        case None => agg
      }
  }
}
