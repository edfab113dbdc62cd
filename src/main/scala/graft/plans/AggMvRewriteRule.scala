package graft.plans

import graft.sql.MaterializedAgg
import graft.sql.MaterializedAgg.AggMv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
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
  private def matchChild(plan: LogicalPlan)
      : Option[(AggMv, Seq[Expression], Option[Long])] = plan match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
      val fs = lr.relation.asInstanceOf[HadoopFsRelation]
      MaterializedAgg.matchBase(fs.location.rootPaths.map(p => p.toUri.getPath))
        .filter(_.dims.isEmpty) // a JOIN MV never answers a bare-base aggregate
        .map(mv => (mv, Nil, None))
    case dr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      graft.sources.SnapshotScanProbe.rewriteTarget(dr.table).flatMap {
        case (path, pinnedManifest) =>
          MaterializedAgg.forBasePath(path).filter(_.snapshot)
            .filter(_.dims.isEmpty) // join multiplicity ≠ base multiplicity
            .flatMap(mv => freshPin(path, pinnedManifest, mv)
              .map(hv => (mv, Seq.empty[Expression], Some(hv))))
      }
    case j: Join => matchJoinMv(j)
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      matchChild(child)
    case Filter(cond, child) =>
      matchChild(child).map { case (mv, fs, pin) => (mv, fs :+ cond, pin) }
    case _ => None
  }

  /** MV freshness + version pin. Resolve the MV version FIRST and pin
    * the rewrite to it — a concurrent mv_refresh landing after this
    * line can only make the check below decline, never make the query
    * read newer aggregates than the base version the scan pinned.
    * Freshness comes from the resolved head's own immutable manifest:
    * its `src=` cursor names the base version the committed state
    * reflects. The `_mv` sidecar (written AFTER the commit) is
    * consulted only for metadata-only base advances (no MV commit, the
    * sidecar moves alone), and only when it is not stale relative to
    * the cursor. Returns the MV version to read when fresh. */
  private def freshPin(
      path: String,
      pinnedManifest: graft.store.SnapshotStore.Manifest,
      mv: AggMv): Option[Long] =
    graft.store.SnapshotStore.currentVersion(spark, mv.mvPath).flatMap { hv =>
      val man = scala.util.Try(
        graft.store.SnapshotStore.manifest(spark, mv.mvPath, hv)).toOption
      def reflects(v: Long): Boolean = v >= 0 && scala.util.Try(
        graft.store.SnapshotStore.manifest(spark, path, v))
        .toOption.contains(pinnedManifest)
      val srcV = man.map(_.srcV).getOrElse(-1L)
      val sidecarOk = graft.sql.SnapshotMv.meta(spark, mv.mvPath).exists(mm =>
        mm.baseVersion >= srcV && reflects(mm.baseVersion))
      if (reflects(srcV) || sidecarOk) Some(hv) else None
    }

  // ---- JOIN-MV matching -------------------------------------------------

  /** A pinned snapshot leaf under attr-only Projects and Filters, with
    * the filters collected on the way down. */
  private def pinnedLeaf(plan: LogicalPlan): Option[
      (String, graft.store.SnapshotStore.Manifest, AttributeSet, Seq[Expression])] =
    plan match {
      case dr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        graft.sources.SnapshotScanProbe.rewriteTarget(dr.table)
          .map { case (p, m) => (p, m, dr.outputSet, Nil) }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        pinnedLeaf(child)
      case Filter(cond, child) =>
        pinnedLeaf(child).map { case (p, m, out, fs) => (p, m, out, fs :+ cond) }
      case _ => None
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x         => Seq(x)
  }

  private case class DimMatch(
      path: String,
      pinned: graft.store.SnapshotStore.Manifest,
      eqs: Seq[(String, String)], // (fact-side name, dim-side name)
      filters: Seq[Expression])

  /** Unroll a left-deep INNER equi-join tree: dims peel off the right,
    * the fact leaf sits bottom-left. Every conjunct must be a plain
    * column equality with one side from the dim leaf. */
  private def unrollJoins(plan: LogicalPlan)
      : Option[((String, graft.store.SnapshotStore.Manifest, Seq[Expression]),
          Seq[DimMatch])] = plan match {
    case j: Join if j.joinType == Inner && j.condition.isDefined =>
      pinnedLeaf(j.right).flatMap { case (dPath, dPin, dOut, dFilters) =>
        val pairs = splitConj(j.condition.get).map {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            if (dOut.contains(b) && !dOut.contains(a)) Some((a.name, b.name))
            else if (dOut.contains(a) && !dOut.contains(b)) Some((b.name, a.name))
            else None
          case _ => None
        }
        if (pairs.contains(None)) None
        else unrollJoins(j.left).map { case (fact, dims) =>
          (fact, dims :+ DimMatch(dPath, dPin, pairs.flatten, dFilters))
        }
      }
    case other =>
      pinnedLeaf(other).map { case (p, m, _, fs) => ((p, m, fs), Nil) }
  }

  /** An aggregate over `fact ⋈ dims` re-targets onto a registered JOIN
    * MV when the join SHAPE matches the MV's recorded dims (as a
    * multiset — role-playing dims join the same table twice under
    * different keys) and EVERY pinned manifest is exactly the version
    * the MV state reflects: the fact via [[freshPin]], each dim via the
    * `_mv` sidecar's per-dim version pin. Leaf filters (pushed below
    * the join by the optimizer) are carried out and re-applied over the
    * MV; [[tryRewrite]] later drops the inferred `IsNotNull(joinKey)`
    * conjuncts, which the inner equi-join makes vacuous on MV state. */
  private def matchJoinMv(j: Join)
      : Option[(AggMv, Seq[Expression], Option[Long])] =
    unrollJoins(j).flatMap { case ((factPath, factPinned, factFilters), dimMatches) =>
      MaterializedAgg.forBasePath(factPath).filter(_.snapshot)
        .filter(_.dims.nonEmpty).flatMap { mv =>
          graft.sql.SnapshotMv.meta(spark, mv.mvPath).flatMap { mm =>
            if (dimMatches.size != mm.dims.size) None
            else {
              val remaining = scala.collection.mutable.ArrayBuffer(mm.dims: _*)
              val allMatched = dimMatches.forall { dm =>
                val i = remaining.indexWhere { p =>
                  MaterializedAgg.normalizePath(p.dim.table) == dm.path &&
                    p.dim.factKeys.zip(p.dim.dimKeys).toSet == dm.eqs.toSet &&
                    scala.util.Try(graft.store.SnapshotStore
                        .manifest(spark, p.dim.table, p.version))
                      .toOption.contains(dm.pinned)
                }
                if (i >= 0) { remaining.remove(i); true } else false
              }
              if (!allMatched) None
              else freshPin(factPath, factPinned, mv).map { hv =>
                (mv, factFilters ++ dimMatches.flatMap(_.filters), Some(hv))
              }
            }
          }
        }
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (groupingExprs, resultExprs, child) =
      (agg.groupingExpressions, agg.aggregateExpressions, agg.child)
    matchChild(child).flatMap { case (mv, rawFilters, mvPin) =>
      val groupNames = groupingExprs.map {
        case a: AttributeReference => Some(a.name)
        case _                     => None
      }
      // Inferred `IsNotNull(joinKey)` conjuncts (InferFiltersFromConstraints
      // plants them on both sides of every equi-join) are VACUOUS on MV
      // state — a null-keyed fact row never survived the inner join, so
      // no state row descends from one. Drop them instead of declining.
      val joinKeyNames: Set[String] =
        mv.dims.flatMap(d => d.factKeys ++ d.dimKeys).toSet
      val conjuncts = rawFilters.flatMap(splitConj).filterNot {
        case IsNotNull(a: AttributeReference) => joinKeyNames.contains(a.name)
        case _                                => false
      }
      val filterCond = conjuncts.reduceOption(And)
      val filterAttrs = filterCond.toSeq.flatMap(_.references.toSeq).map(_.name)
      val groupingOk =
        groupNames.forall(_.exists(mv.groupCols.contains)) &&
          filterAttrs.forall(mv.groupCols.contains)
      if (!groupingOk) None
      else {
        val rel = MaterializedAgg.mvRelation(spark, mv, mvPin)
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
