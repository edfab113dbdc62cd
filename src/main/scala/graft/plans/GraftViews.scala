package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.{Row, types}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.{SnapshotCatalog, SnapshotViews}

/** PERSISTED-VIEW execution for the snapshot catalog.
  *
  * Spark 4.1.2 ships the DSv2 `ViewCatalog` SPI but nothing in the
  * stock analyzer consumes it — no `loadView` caller exists anywhere
  * in the release jars, and `ResolveSessionCatalog` refuses every view
  * DDL aimed at a non-session catalog (`MISSING_CATALOG_ABILITY`).
  * This file supplies the missing half as ordinary session extensions,
  * exactly the customization layer Spark provides for engine gaps:
  *
  *  - [[GraftViewParser]] (injectParser): after delegating the real
  *    parse, view DDL whose identifier lands in a [[SnapshotCatalog]]
  *    (`CREATE [OR REPLACE] VIEW`, `DROP VIEW`, `SHOW VIEWS`,
  *    `ALTER VIEW ... SET/UNSET TBLPROPERTIES`) is rewritten to the
  *    runnable commands below BEFORE analysis, so
  *    `ResolveSessionCatalog` never sees it. Everything else — session
  *    temp views included — passes through untouched.
  *  - [[GraftViewSubstitution]] (injectResolutionRule): an
  *    `UnresolvedRelation` that names a stored view re-parses the
  *    view's SQL in place (`SubqueryAlias` over the defining query,
  *    column aliases applied positionally) — the fixed-point analyzer
  *    then resolves nested views naturally. Resolution context is the
  *    READER's (views in the corpus qualify their table references);
  *    a cyclic view fails analysis loudly at max-iterations.
  *
  * The storage/API half lives in [[graft.sources.SnapshotViews]] and
  * `SnapshotCatalog`'s ViewCatalog methods; these commands go through
  * that public API, so a future Spark release that ships native V2
  * view execution can drop this file without touching storage. */
object GraftViews {

  /** The graft catalog + identifier `parts` names, if any: an explicit
    * leading catalog name wins; otherwise the session's CURRENT
    * catalog (when it is a SnapshotCatalog) hosts the relative name. */
  def graftIdent(
      session: SparkSession, parts: Seq[String]): Option[(SnapshotCatalog, Identifier)] = {
    if (parts.isEmpty) return None
    val cm = session.sessionState.catalogManager
    def catOf(name: String): Option[SnapshotCatalog] =
      // isCatalogRegistered first: most relation heads are namespaces,
      // not catalogs — don't pay a thrown CatalogNotFoundException per
      // UnresolvedRelation per analyzer iteration
      if (!cm.isCatalogRegistered(name)) None
      else try cm.catalog(name) match {
        case c: SnapshotCatalog => Some(c)
        case _                  => None
      } catch { case scala.util.control.NonFatal(_) => None }
    // A leading part that names a REGISTERED catalog of ANY kind makes
    // the identifier explicitly qualified: resolve it in that catalog
    // or not at all. Falling through would reinterpret another
    // catalog's name as a namespace inside the current graft catalog —
    // hijacking e.g. `CREATE VIEW spark_catalog.db.v` when a
    // SnapshotCatalog happens to be current.
    if (parts.length >= 2 && cm.isCatalogRegistered(parts.head))
      catOf(parts.head).map(c => (c, Identifier.of(parts.tail.init.toArray, parts.last)))
    else cm.currentCatalog match {
      case c: SnapshotCatalog =>
        val ns = if (parts.length >= 2) parts.init.toArray else cm.currentNamespace
        Some((c, Identifier.of(ns, parts.last)))
      case _ => None
    }
  }

  private def partsOf(child: LogicalPlan): Option[Seq[String]] = child match {
    case UnresolvedIdentifier(parts, _) => Some(parts)
    case v: UnresolvedView              => Some(v.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      Some(t.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      Some(t.multipartIdentifier)
    case _                              => None
  }

  /** Rewrite a parsed view-DDL plan into graft commands when (and only
    * when) its identifier lands in a SnapshotCatalog. */
  def intercept(session: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView =>
      (for {
        parts <- partsOf(cv.child)
        (cat, id) <- graftIdent(session, parts)
      } yield CreateGraftViewCommand(
        cat, id,
        sql = cv.originalText.getOrElse(throw new IllegalArgumentException(
          s"CREATE VIEW ${parts.mkString(".")}: no original SQL text captured")),
        userColumns = cv.userSpecifiedColumns,
        comment = cv.comment,
        properties = cv.properties,
        query = cv.query,
        allowExisting = cv.allowExisting,
        replace = cv.replace): LogicalPlan).getOrElse(plan)
    case dv: DropView =>
      (for {
        parts <- partsOf(dv.child)
        (cat, id) <- graftIdent(session, parts)
      } yield DropGraftViewCommand(cat, id, dv.ifExists): LogicalPlan).getOrElse(plan)
    case sv: ShowViews =>
      sv.namespace match {
        case UnresolvedNamespace(parts, _) =>
          val resolved: Option[(SnapshotCatalog, Seq[String])] = parts match {
            case head +: rest if isGraftCatalogName(session, head) =>
              Some((session.sessionState.catalogManager.catalog(head)
                .asInstanceOf[SnapshotCatalog], rest))
            // another REGISTERED catalog's name is an explicit
            // qualifier — leave `SHOW VIEWS IN spark_catalog.db` to
            // the stock path, don't read it as a graft namespace
            case head +: _ if session.sessionState.catalogManager
              .isCatalogRegistered(head) => None
            case other =>
              session.sessionState.catalogManager.currentCatalog match {
                case c: SnapshotCatalog => Some((c, other))
                case _                  => None
              }
          }
          resolved.map { case (cat, ns) =>
            ShowGraftViewsCommand(cat, ns, sv.pattern): LogicalPlan
          }.getOrElse(plan)
        case _ => plan
      }
    case av: AlterViewAs =>
      (for {
        parts <- partsOf(av.child)
        (cat, id) <- graftIdent(session, parts)
      } yield AlterGraftViewAsCommand(cat, id, av.originalText,
        av.query): LogicalPlan).getOrElse(plan)
    case ac: AnalyzeColumn =>
      // `ANALYZE TABLE cat.ns.t COMPUTE STATISTICS FOR [ALL] COLUMNS`:
      // the native spelling of `CALL system.analyze` — Spark's own
      // AnalyzeColumn command is session-catalog-only
      (for {
        parts <- partsOf(ac.child)
        (cat, id) <- graftIdent(session, parts)
        if !SnapshotViews.exists(session, cat.warehousePath, id)
      } yield AnalyzeGraftColumnsCommand(cat, id, ac.columnNames.getOrElse(Nil),
        ac.allColumns): LogicalPlan).getOrElse(plan)
    case sp: SetViewProperties =>
      (for {
        parts <- partsOf(sp.child)
        (cat, id) <- graftIdent(session, parts)
      } yield AlterGraftViewPropsCommand(cat, id, set = sp.properties,
        unset = Nil): LogicalPlan).getOrElse(plan)
    case up: UnsetViewProperties =>
      (for {
        parts <- partsOf(up.child)
        (cat, id) <- graftIdent(session, parts)
      } yield AlterGraftViewPropsCommand(cat, id, set = Map.empty,
        unset = up.propertyKeys): LogicalPlan).getOrElse(plan)
    case _ => plan
  }

  /** A persisted view must not capture session-temporary objects: the
    * stored SQL resolves in the DEFINER's catalog context on every
    * read, where no temp view exists — the reference would dangle (or
    * worse, bind to an unrelated table). Mirrors Spark's
    * INVALID_TEMP_OBJ_REFERENCE refusal for its own persisted views. */
  def refuseTempRefs(session: SparkSession, body: LogicalPlan, what: String): Unit =
    body.foreach {
      case r: UnresolvedRelation
          if session.sessionState.catalog.isTempView(r.multipartIdentifier) =>
        throw new IllegalArgumentException(
          s"$what: the defining query references temporary view " +
            s"${r.multipartIdentifier.mkString(".")} — a persisted view cannot depend " +
            "on session-temporary objects")
      case _ => ()
    }

  private def isGraftCatalogName(session: SparkSession, name: String): Boolean = {
    val cm = session.sessionState.catalogManager
    cm.isCatalogRegistered(name) &&
      (try cm.catalog(name).isInstanceOf[SnapshotCatalog]
       catch { case scala.util.control.NonFatal(_) => false })
  }
}

/** Delegating parser that rewrites graft-catalog view DDL after the
  * real parse ([[GraftViews.intercept]]); every other surface passes
  * straight through to the stock parser. */
final class GraftViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViews.intercept(session, delegate.parsePlan(sqlText))
  // `spark.sql(text[, args])` routes through THIS entry point (with an
  // empty context for plain SQL): it must reach the real parser — the
  // interface DEFAULT drops the ParameterContext on the floor, leaving
  // named/positional parameters unbound — and it must still intercept,
  // or plain-SQL view DDL sails past into ResolveSessionCatalog's
  // refusal. A parameterized plan wraps the DDL node, so the top-level
  // match simply passes it through (view DDL takes no parameters).
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    GraftViews.intercept(session, delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): types.DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): types.StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Analyzer rule: substitute stored-view names with their defining
  * query. Runs in the main resolution fixed point, so nested views
  * resolve transitively. */
final class GraftViewSubstitution(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a VERSION/TIMESTAMP AS OF wrapper must NOT resolve through a
    // view — substituting would silently ignore the version spec;
    // leaving it unresolved fails analysis loudly instead
    val timeTraveled = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        timeTraveled.add(tt.relation)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming && !timeTraveled.contains(u) =>
        substitute(u)
    }
  }

  private def substitute(u: UnresolvedRelation): LogicalPlan =
      GraftViews.graftIdent(session, u.multipartIdentifier).flatMap { case (cat, id) =>
        SnapshotViews.read(session, warehouseOf(cat), id).map { rec =>
          // CTESubstitution already ran (Substitution batch precedes
          // resolution rules), so a WITH inside the spliced body would
          // never bind its own CTE names — run it on the body here
          val parsed = org.apache.spark.sql.catalyst.analysis.CTESubstitution(
            qualifyBody(
              session.sessionState.sqlParser.parsePlan(rec.sql), rec))
          val aliased =
            if (rec.columnAliases != null && rec.columnAliases.nonEmpty)
              UnresolvedSubqueryColumnAliases(rec.columnAliases.toSeq, parsed)
            else parsed
          SubqueryAlias(u.multipartIdentifier.last, aliased): LogicalPlan
        }
      }.getOrElse(u)

  /** Pin the DEFINER's resolution context (as Spark's own V2 view
    * resolution does): an unqualified table reference in the stored
    * body resolves against the catalog/namespace that were current at
    * CREATE time — persisted in the record — never the READER's
    * session state, which would silently bind the same view text to a
    * different table per reader. References whose head already names a
    * registered catalog are left untouched, as are names bound by an
    * ENCLOSING CTE — scope-aware: a table reference that merely shares
    * a name with a CTE defined in a different, non-enclosing scope of
    * the body still qualifies (the plan-global name set this replaced
    * exempted it, reintroducing per-reader rebinding). The recursion
    * also descends into the CTE definitions themselves —
    * `UnresolvedWith` is a UnaryNode whose `cteRelations` are NOT
    * children, so a child-walking transform never reaches them. */
  private def qualifyBody(parsed: LogicalPlan, rec: SnapshotViews.Rec): LogicalPlan = {
    val defCat = Option(rec.currentCatalog).filter(_.nonEmpty)
    if (defCat.isEmpty) return parsed
    val cm = session.sessionState.catalogManager
    val defNs: Seq[String] = Option(rec.currentNamespace).map(_.toSeq).getOrElse(Nil)
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    def qualify(plan: LogicalPlan, scope: Set[String]): LogicalPlan = {
      val rewritten = plan match {
        case w: UnresolvedWith =>
          // sequential scope: each definition sees the CTEs defined
          // BEFORE it (plus the outer scope); a RECURSIVE cte sees its
          // own name inside its definition
          var s = scope
          val rels = w.cteRelations.map { case (n, rel, opt) =>
            val inner = if (w.allowRecursion) s + n.toLowerCase else s
            val r2 = qualify(rel, inner).asInstanceOf[SubqueryAlias]
            s += n.toLowerCase
            (n, r2, opt)
          }
          UnresolvedWith(qualify(w.child, s), rels, w.allowRecursion)
        case r: UnresolvedRelation
            if !(r.multipartIdentifier.length >= 2 &&
                cm.isCatalogRegistered(r.multipartIdentifier.head)) &&
              !(r.multipartIdentifier.length == 1 &&
                scope.contains(r.multipartIdentifier.head.toLowerCase)) =>
          val parts = r.multipartIdentifier
          val full =
            if (parts.length == 1) defCat.get +: (defNs ++ parts)
            else defCat.get +: parts
          r.copy(multipartIdentifier = full)
        case other => other.mapChildren(qualify(_, scope))
      }
      // subquery expressions carry their own plans — outer CTE names
      // stay in scope inside them
      rewritten.transformExpressionsUp {
        case se: SubqueryExpression => se.withNewPlan(qualify(se.plan, scope))
      }
    }
    qualify(parsed, Set.empty)
  }

  private def warehouseOf(cat: SnapshotCatalog): String = cat.warehousePath
}

/** `CREATE [OR REPLACE] VIEW <graft-cat>.<ns>.<v> AS <query>`. The
  * query analyzes HERE (schema + column-count validation against any
  * user column list) and the record persists through the catalog's
  * ViewCatalog API — one atomic metadata file. */
final case class CreateGraftViewCommand(
    catalog: SnapshotCatalog,
    ident: Identifier,
    sql: String,
    userColumns: Seq[(String, Option[String])],
    comment: Option[String],
    properties: Map[String, String],
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    if (allowExisting && catalog.viewExists(ident)) return Nil
    GraftViews.refuseTempRefs(session, query, s"CREATE VIEW ${ident.name}")
    val analyzed = session.sessionState.executePlan(query).analyzed
    val qSchema = analyzed.schema
    if (userColumns.nonEmpty && userColumns.length != qSchema.length)
      throw new IllegalArgumentException(
        s"CREATE VIEW ${ident.name}: ${userColumns.length} column aliases for a " +
          s"${qSchema.length}-column query")
    val aliases = userColumns.map(_._1).toArray
    val schema =
      if (aliases.isEmpty) qSchema
      else types.StructType(qSchema.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    val props = properties ++ comment.map(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT -> _)
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(
      ident, sql, cm.currentCatalog.name, cm.currentNamespace, schema,
      qSchema.fieldNames, aliases,
      userColumns.map(_._2.orNull).toArray, {
        import scala.jdk.CollectionConverters._
        props.asJava
      })
    if (replace) catalog.replaceView(info, true) else catalog.createView(info)
    Nil
  }
}

/** `ALTER VIEW <graft-cat>.<ns>.<v> AS <query>` — swap the defining
  * SQL in place, keeping properties; column aliases/comments reset
  * (the statement carries no column list). */
final case class AlterGraftViewAsCommand(
    catalog: SnapshotCatalog,
    ident: Identifier,
    sql: String,
    query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val old = SnapshotViews.read(session, catalog.warehousePath, ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
    GraftViews.refuseTempRefs(session, query, s"ALTER VIEW ${ident.name} AS")
    val analyzed = session.sessionState.executePlan(query).analyzed
    val cm = session.sessionState.catalogManager
    SnapshotViews.create(session, catalog.warehousePath, ident,
      old.copy(sql = sql, currentCatalog = cm.currentCatalog.name,
        currentNamespace = cm.currentNamespace, schema = analyzed.schema,
        queryColumnNames = analyzed.schema.fieldNames,
        columnAliases = Array.empty, columnComments = Array.empty),
      overwrite = true)
    Nil
  }
}

/** `ANALYZE TABLE <graft-cat>.<ns>.<t> COMPUTE STATISTICS FOR [ALL]
  * COLUMNS ...` — routes to the NDV/KLL analyze commit ([[graft.ops
  * .NdvStats.analyzeCommit]]), the same surface as `CALL
  * system.analyze`. ALL COLUMNS takes every sketchable atomic column
  * (int/bigint/string — the HLL input domain). */
final case class AnalyzeGraftColumnsCommand(
    catalog: SnapshotCatalog,
    ident: Identifier,
    columns: Seq[String],
    allColumns: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val root = (catalog.warehousePath +: ident.namespace.toSeq :+ ident.name).mkString("/")
    val schema = graft.store.SnapshotStore.read(session, root).schema
    val cols =
      if (!allColumns) columns
      else schema.fields.toSeq.collect {
        case f if f.dataType == types.IntegerType || f.dataType == types.LongType ||
          f.dataType == types.StringType => f.name
      }
    require(cols.nonEmpty,
      s"ANALYZE TABLE ${ident.name}: no sketchable columns " +
        "(HLL sketches take int/bigint/string)")
    val unknown = cols.filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    require(unknown.isEmpty,
      s"ANALYZE TABLE ${ident.name}: unknown column(s) ${unknown.mkString(", ")}")
    val v = graft.ops.NdvStats.analyzeCommit(session, root, cols)
    Seq(Row(v, cols.mkString(",")))
  }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    Seq(AttributeReference("version", types.LongType, nullable = false)(),
      AttributeReference("columns", types.StringType, nullable = false)())
  }
}

final case class DropGraftViewCommand(
    catalog: SnapshotCatalog, ident: Identifier, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

final case class ShowGraftViewsCommand(
    catalog: SnapshotCatalog, namespace: Seq[String], pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    ShowViews.getOutputAttrs
  override def run(session: SparkSession): Seq[Row] = {
    val views = catalog.listViews(namespace: _*)
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(p.replace("*", ".*"), java.util.regex.Pattern.CASE_INSENSITIVE))
    views.toSeq
      .filter(v => re.forall(_.matcher(v.name).matches()))
      .sortBy(_.name)
      .map(v => Row(namespace.mkString("."), v.name, false))
  }
}

final case class AlterGraftViewPropsCommand(
    catalog: SnapshotCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Nil
  }
}
