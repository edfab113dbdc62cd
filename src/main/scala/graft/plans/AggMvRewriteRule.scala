package graft.plans

import graft.sql.MaterializedAgg
import graft.sql.MaterializedAgg.AggMv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Automatic materialized-view rewrite: an `Aggregate` over a base
  * fact table whose grouping is a subset of a registered summary's
  * group columns — and whose aggregates are sum / count / min / max /
  * avg over its measure columns — re-targets onto the summary table
  * with RE-aggregation:
  *
  * {{{
  *   sum(x)   → sum(sum_x)        count(*) → coalesce(sum(n), 0)
  *   count(x) → coalesce(sum(cnt_x), 0)
  *   min(x)   → min(min_x)        max(x)   → max(max_x)
  *   avg(x)   → sum(sum_x) / sum(cnt_x)    (double division)
  * }}}
  *
  * The rollup algebra is exact (sum-of-sums etc. — the same merge as
  * partial aggregation itself), so the rewrite never changes results;
  * it changes the SCAN from fact-sized to group-cardinality-sized.
  * This is the optimizer half of [[MaterializedAgg]] — the same
  * transparent-acceleration pattern as [[NativeRewriteRule]]: queries
  * (DataFrame or SQL text) don't change, plans do.
  *
  * Deliberately conservative matching, in the style of every MV
  * rewriter: plain (non-DISTINCT, non-FILTER) aggregate calls on bare
  * measure columns; grouping and any residual `Filter`/`Project`
  * between the aggregate and the scan may touch GROUP columns only.
  * Anything else leaves the plan untouched.
  */
class AggMvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedAgg.registered.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Base-relation scan (optionally under attribute-only Project and a
    * group-column Filter) → (mv, filter condition). Two base shapes:
    * a parquet `LogicalRelation` (always rewritable — parquet dirs are
    * assumed maintained with the MV), and a snapshot-table DSv2 scan,
    * which rewrites ONLY when provably FRESH: the `_mv` sidecar names
    * the base version the summary reflects, and the manifest at that
    * version must equal the manifest this scan pinned (so a refresh-lag
    * MV never serves a stale answer, and a time-travel read at the
    * reflected version still rewrites). Snapshot scans are safe to
    * match bare: the connector returns EVERY pushed filter as a
    * residual, so a user filter always survives as a `Filter` node
    * above the scan. */
  private def matchChild(plan: LogicalPlan): Option[(AggMv, Option[Expression])] = plan match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
      val fs = lr.relation.asInstanceOf[HadoopFsRelation]
      MaterializedAgg.matchBase(fs.location.rootPaths.map(p => p.toUri.getPath)).map(mv => (mv, None))
    case dr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      graft.sources.SnapshotScanProbe.rewriteTarget(dr.table).flatMap {
        case (path, pinnedManifest) =>
          MaterializedAgg.forBasePath(path).filter(_.snapshot).filter { mv =>
            graft.sql.SnapshotMv.meta(spark, mv.mvPath).exists { mm =>
              scala.util.Try(
                graft.store.SnapshotStore.manifest(spark, path, mm.baseVersion))
                .toOption.contains(pinnedManifest)
            }
          }.map(mv => (mv, None))
      }
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      matchChild(child)
    case Filter(cond, child) =>
      matchChild(child).flatMap {
        case (mv, None) => Some((mv, Some(cond)))
        case _          => None // one filter layer only
      }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (groupingExprs, resultExprs, child) =
      (agg.groupingExpressions, agg.aggregateExpressions, agg.child)
    matchChild(child).flatMap { case (mv, filterCond) =>
      val groupNames = groupingExprs.map {
        case a: AttributeReference => Some(a.name)
        case _                     => None
      }
      val filterAttrs = filterCond.toSeq.flatMap(_.references.toSeq).map(_.name)
      val groupingOk =
        groupNames.forall(_.exists(mv.groupCols.contains)) &&
          filterAttrs.forall(mv.groupCols.contains)
      if (!groupingOk) None
      else {
        val rel = MaterializedAgg.mvRelation(spark, mv)
        val mvAttr: Map[String, AttributeReference] =
          rel.output.collect { case a: AttributeReference => a.name -> a }.toMap

        def sumOf(name: String): Expression =
          Sum(mvAttr(name)).toAggregateExpression()

        // rewrite one aggregate call; None = unsupported → bail out
        def rewriteAgg(ae: AggregateExpression): Option[Expression] =
          if (ae.isDistinct || ae.filter.isDefined) None
          else ae.aggregateFunction match {
            case Count(Seq(Literal(1, _))) =>
              Some(Coalesce(Seq(sumOf("n"), Literal(0L))))
            case Count(Seq(a: AttributeReference)) if mv.measureCols.contains(a.name) =>
              Some(Coalesce(Seq(sumOf(s"cnt_${a.name}"), Literal(0L))))
            case Sum(a: AttributeReference, _) if mv.measureCols.contains(a.name) =>
              Some(sumOf(s"sum_${a.name}"))
            case Min(a: AttributeReference) if mv.measureCols.contains(a.name) =>
              Some(Min(mvAttr(s"min_${a.name}")).toAggregateExpression())
            case Max(a: AttributeReference) if mv.measureCols.contains(a.name) =>
              Some(Max(mvAttr(s"max_${a.name}")).toAggregateExpression())
            case Average(a: AttributeReference, _) if mv.measureCols.contains(a.name) =>
              Some(Divide(
                Cast(sumOf(s"sum_${a.name}"), DoubleType),
                Cast(sumOf(s"cnt_${a.name}"), DoubleType)))
            case _ => None
          }

        // every result expression must rewrite completely: aggregate
        // calls via the rollup table, bare references via group columns.
        // Explicit recursion (NOT transformUp): the walk must stop at an
        // AggregateExpression boundary — measure attrs are legal inside
        // an aggregate call but not outside one, and a blanket bottom-up
        // transform would visit them first and bail out.
        var ok = true
        def rewriteExpr(e: Expression): Expression = e match {
          case ae: AggregateExpression =>
            rewriteAgg(ae) match {
              case Some(r) => r
              case None    => ok = false; ae
            }
          case a: AttributeReference =>
            if (mv.groupCols.contains(a.name)) mvAttr(a.name)
            else { ok = false; a }
          case other => other.mapChildren(rewriteExpr)
        }
        val newResults = resultExprs.map { ne =>
          val rewritten = rewriteExpr(ne)
          rewritten match {
            case a: Alias => Alias(a.child, a.name)(exprId = a.exprId)
            case a: AttributeReference =>
              // grouping column surfaced directly: keep the ORIGINAL
              // output id so parents still resolve
              ne match {
                case orig: AttributeReference => Alias(a, orig.name)(exprId = orig.exprId)
                case _                        => a
              }
            case other => other.asInstanceOf[NamedExpression]
          }
        }
        if (!ok) None
        else {
          val newGrouping = groupingExprs.map {
            case a: AttributeReference => mvAttr(a.name)
            case e                     => e
          }
          val newChild = filterCond match {
            case Some(cond) =>
              Filter(cond.transformUp {
                case a: AttributeReference if mvAttr.contains(a.name) => mvAttr(a.name)
              }, rel)
            case None => rel
          }
          Some(Aggregate(newGrouping, newResults, newChild))
        }
      }
    }
  }
}
