package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.TopKAgg

/**
 * Optimizer rule: rewrite the rank-k window idiom into a bounded
 * top-k aggregate (SURVEY.md section 8 item 2).
 *
 *   Filter(rank <= k,
 *     [Project(attrs)]
 *       Window([row_number() OVER (PARTITION BY p...
 *                ORDER BY score DESC, id ASC)] AS rank, child))
 * ==>
 *   Project(p..., id, score, rank)           -- same attribute ids
 *     Generate(posexplode(top))
 *       Aggregate(p..., graft_topk(id, score, k) AS top, child)
 *
 * Why: the window form shuffles EVERY scored row into its group's
 * partition and sorts it, only to discard all but k rows per group —
 * at 100 TB that exchange is the whole query. The aggregate form
 * partial-aggregates map-side (ObjectHashAggregate over a bounded
 * heap), so the shuffle carries k rows per (group x partition)
 * regardless of corpus size, and the sort disappears entirely.
 *
 * Soundness conditions (all checked structurally):
 *  - single window expression, exactly row_number();
 *  - ORDER BY is (double-typed score DESC NULLS LAST,
 *    long-typed id attribute ASC NULLS FIRST) — the ordering
 *    graft_topk's heap implements, tie-break included;
 *  - the filter bound is a positive integer literal;
 *  - every output column is a partition key, the id, the score
 *    attribute, or the rank (anything else would be dropped by the
 *    aggregate, so such plans are left untouched);
 *  - partition keys are plain attributes.
 *
 * Null semantics: graft_topk skips rows whose id/score is NULL, while
 * row_number ranks them after all non-null scores (DESC NULLS LAST);
 * outputs can differ only when a group holds fewer than k non-null
 * rows. Under the default mode `safe` the rule therefore fires only
 * when both id and score are provably non-nullable;
 * `spark.graft.topk.rewrite=eager` opts a session into rewriting
 * nullable inputs too (similarity scores are non-null by
 * construction but parquet schemas rarely say so); `off` disables.
 */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private val ModeKey = "spark.graft.topk.rewrite"
  // Per-group state is a k-entry heap; beyond this the window form's
  // sort is the safer plan.
  private val MaxK = 100000

  private def rankBound(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rankId => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rankId => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId && v == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = conf.getConfString(ModeKey, "safe")
    if (mode == "off") return plan
    plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(f, cond, w, mode).getOrElse(f)
      case f @ Filter(cond, p @ Project(projectList, w: Window))
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(f, cond, w, mode).getOrElse(f)
    }
  }

  private def rewrite(f: Filter, cond: Expression, w: Window,
                      mode: String): Option[LogicalPlan] = {
    w.windowExpressions match {
      case Seq(rankAlias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part,
            Seq(SortOrder(score, Descending, NullsLast, _),
                SortOrder(id: AttributeReference, Ascending, NullsFirst, _)), _)), _))
        if score.dataType == DoubleType && id.dataType == LongType =>

        val k = rankBound(cond, rankAlias.exprId).getOrElse(return None)
        if (k <= 0 || k > MaxK) return None
        if (mode != "eager" && (score.nullable || id.nullable)) return None
        val partAttrs = part.collect { case a: AttributeReference => a }
        if (partAttrs.length != part.length) return None
        val scoreAttr = score match { case a: AttributeReference => Some(a); case _ => None }
        val rebuildable = partAttrs.map(_.exprId).toSet + id.exprId ++
          scoreAttr.map(_.exprId) + rankAlias.exprId
        if (!f.output.forall(a => rebuildable.contains(a.exprId))) return None

        // Spark's own InsertWindowGroupLimit has already run and put a
        // WindowGroupLimit (per-partition sorted rank pre-filter) under
        // the window. The heap aggregate subsumes it WITHOUT the sort,
        // so strip it when it belongs to this very window spec.
        val aggChild = w.child match {
          case wgl: WindowGroupLimit
            if wgl.partitionSpec == part && wgl.orderSpec == w.orderSpec => wgl.child
          case c => c
        }
        val topAlias = Alias(AggregateExpression(
          TopKAgg(id, score, k), Complete, isDistinct = false), "graft_top")()
        val agg = Aggregate(partAttrs, (partAttrs :+ topAlias).toSeq, aggChild)
        val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
        val pairAttr = AttributeReference("graft_pair", StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("score", DoubleType, nullable = false))), nullable = false)()
        val gen = Generate(PosExplode(topAlias.toAttribute),
          unrequiredChildIndex = Seq(partAttrs.length),
          outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, pairAttr), child = agg)
        val projList: Seq[NamedExpression] = f.output.map { a =>
          if (a.exprId == id.exprId)
            Alias(GetStructField(pairAttr, 0, Some("id")), a.name)(exprId = a.exprId)
          else if (scoreAttr.exists(_.exprId == a.exprId))
            Alias(GetStructField(pairAttr, 1, Some("score")), a.name)(exprId = a.exprId)
          else if (a.exprId == rankAlias.exprId)
            Alias(Add(posAttr, Literal(1, IntegerType)), a.name)(exprId = a.exprId)
          else a // partition key: flows through the aggregate unchanged
        }
        Some(Project(projList, gen))
      case _ => None
    }
  }
}
