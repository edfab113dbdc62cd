package graft.store

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit, max, when}
import org.apache.spark.sql.sources._

/** CHECK CONSTRAINTS on snapshot tables (the Spark 4 ANSI-constraint
  * surface: `ALTER TABLE t ADD CONSTRAINT c CHECK (price > 0)`).
  *
  * Storage: `<table>/_constraints` — table-level metadata like tags,
  * NOT per-snapshot manifest state: a constraint governs future writes
  * regardless of which snapshot a reader pins, every commit kind keeps
  * it automatically (no manifest plumbing), and vacuum never touches
  * it. Updates swap the whole file atomically (tmp + rename).
  *
  * Three consumers:
  *  - WRITE-TIME ENFORCEMENT. SQL writes (INSERT/streaming/row-level)
  *    are enforced by Spark itself: `SnapshotTable.constraints()`
  *    surfaces enforced CHECKs and the analyzer's
  *    `ResolveTableConstraints` injects a `CheckInvariant` into every
  *    V2 write — per-row, codegen'd, no extra pass. The ENGINE write
  *    APIs (appendCommit & friends) bypass the analyzer, so they call
  *    [[enforce]]: ONE distributed pass over the NEW rows only,
  *    evaluating every check in a single aggregate.
  *  - ADD-TIME VALIDATION. Adding an enforced constraint validates the
  *    EXISTING table (one scan) and refuses if any row violates —
  *    a constraint that is born true stays true.
  *  - PLAN-TIME PRUNING. A pushed filter that provably contradicts a
  *    CHECK interval (`WHERE price < 0` vs `CHECK (price >= 0)`)
  *    empties the scan before any file, sidecar, or footer is touched
  *    ([[disjoint]]). Sound for comparison filters only: SQL
  *    comparisons reject null rows themselves, so the null-passes-CHECK
  *    subtlety cannot resurface through a pruned filter.
  *
  * SQL semantics: a CHECK is violated only when its predicate is
  * FALSE — null predicates PASS (ANSI). Both enforcement paths encode
  * that explicitly. */
object TableChecks {

  /** One stored CHECK constraint. */
  final case class Check(name: String, predicateSql: String, enforced: Boolean, rely: Boolean)

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  def checksFile(table: String): Path = new Path(s"$table/_constraints")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(spark: SparkSession, table: String): Seq[Check] = {
    val p = checksFile(table)
    val f = fs(spark, p)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.toSeq.filter(_.startsWith("check=")).flatMap { l =>
      l.stripPrefix("check=").split(":", 4) match {
        case Array(n, sql, e, r) =>
          Some(Check(dec(n), dec(sql), e.toBoolean, r.toBoolean))
        case _ => None
      }
    }
  }

  private def write(spark: SparkSession, table: String, checks: Seq[Check]): Unit = {
    val p = checksFile(table)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".tmp_checks_${java.util.UUID.randomUUID.toString.take(12)}")
    val out = f.create(tmp, true)
    try checks.foreach { c =>
      out.write(s"check=${enc(c.name)}:${enc(c.predicateSql)}:${c.enforced}:${c.rely}\n"
        .getBytes("UTF-8"))
    } finally out.close()
    val fc = FileContext.getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  /** Add a constraint (duplicate names refuse). Caller validates
    * existing data first when the constraint is enforced. */
  def add(spark: SparkSession, table: String, c: Check): Unit = {
    val cur = read(spark, table)
    require(!cur.exists(_.name.equalsIgnoreCase(c.name)),
      s"constraint '${c.name}' already exists on $table (DROP CONSTRAINT first)")
    write(spark, table, cur :+ c)
  }

  /** Copy `from`'s constraints file to `to` (no-op when `from` has
    * none): branches inherit main's constraints at fork, so every
    * branch write enforces the same CHECKs main enforces — without
    * this, the write-audit-publish flow could fast-forward rows no
    * CheckInvariant ever saw. */
  def copyTo(spark: SparkSession, from: String, to: String): Unit = {
    val cs = read(spark, from)
    if (cs.nonEmpty) write(spark, to, cs)
  }

  /** Drop by name; returns whether it existed. */
  def drop(spark: SparkSession, table: String, name: String): Boolean = {
    val cur = read(spark, table)
    val kept = cur.filterNot(_.name.equalsIgnoreCase(name))
    if (kept.size == cur.size) false
    else { write(spark, table, kept); true }
  }

  /** Names of stored constraints whose predicate references `col`
    * (top-level attribute name, case-insensitive). The RENAME/DROP
    * COLUMN guard: a CHECK's predicate SQL re-parses on every
    * subsequent write, so retiring a referenced name would leave the
    * table unwritable — and once a full rewrite releases the name, a
    * re-ADDed unrelated column would silently re-bind the old
    * predicate. Unparseable predicates count as referencing (refuse
    * conservatively). */
  def checksReferencing(spark: SparkSession, table: String, col: String): Seq[String] =
    read(spark, table).filter { c =>
      val refs =
        try spark.sessionState.sqlParser.parseExpression(c.predicateSql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.head.toLowerCase
        } catch { case scala.util.control.NonFatal(_) => Seq(col.toLowerCase) }
      refs.contains(col.toLowerCase)
    }.map(_.name)

  /** Violation rows for one predicate: FALSE only (null passes). */
  private def violates(sql: String) =
    !coalesce(expr(sql), lit(true))

  /** Enforce every enforced check against `df` in ONE distributed
    * aggregate pass; throws naming the first violated constraint.
    * Engine write APIs call this on the NEW rows only — O(delta). */
  def enforce(df: DataFrame, table: String): Unit = {
    val checks = read(df.sparkSession, table).filter(_.enforced)
    if (checks.isEmpty) return
    val verdicts = df.select(checks.map(c =>
      max(when(violates(c.predicateSql), 1).otherwise(0)).alias(enc(c.name))): _*).collect()
    if (verdicts.isEmpty) return // empty batch violates nothing
    val row = verdicts(0)
    checks.zipWithIndex.foreach { case (c, i) =>
      if (!row.isNullAt(i) && row.getInt(i) == 1)
        throw new IllegalArgumentException(
          s"write to $table violates CHECK constraint '${c.name}' (${c.predicateSql})")
    }
  }

  /** Enforced checks resolved to BOUND catalyst violation expressions
    * over `schema`'s attributes: each returned expression evaluates
    * TRUE exactly when the row VIOLATES its constraint (predicate
    * null-safely equal to false — ANSI: null passes). The streaming
    * sink ships these to its writers and evaluates per row with a
    * codegen'd predicate — the per-row enforcement Spark's analyzer
    * injects for batch writes but not for streaming ones. */
  def violationExprs(
      spark: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType)
      : Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = {
    val checks = read(spark, table).filter(_.enforced)
    if (checks.isEmpty) return Nil
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.plans.logical
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    checks.map { c =>
      val parsed = spark.sessionState.sqlParser.parseExpression(c.predicateSql)
      // full analysis over a LocalRelation of the WRITE schema: function
      // resolution, implicit casts, attribute binding — identical
      // semantics to the batch path's CheckInvariant
      val analyzed = spark.sessionState
        .executePlan(logical.Filter(parsed, logical.LocalRelation(attrs))).analyzed
      val cond = analyzed.collectFirst { case f: logical.Filter => f.condition }
        .getOrElse(throw new IllegalStateException(
          s"constraint '${c.name}' (${c.predicateSql}) did not analyze to a filter"))
      // bind HERE (ordinal BoundReferences over the write schema):
      // expression ids don't survive the driver→executor boundary, a
      // bound expression does
      val violation =
        ce.EqualNullSafe(cond, ce.Literal(false, org.apache.spark.sql.types.BooleanType))
      (c.name, ce.BindReferences.bindReference(violation, attrs))
    }
  }

  /** Validate the EXISTING table against a new check (one scan). */
  def validateExisting(spark: SparkSession, table: String, c: Check): Unit = {
    val df = SnapshotStore.read(spark, table)
    val bad = df.filter(violates(c.predicateSql)).limit(1).count()
    require(bad == 0L,
      s"cannot ADD CONSTRAINT '${c.name}' (${c.predicateSql}) on $table: existing rows violate it " +
        "(fix the data first, or add it NOT ENFORCED)")
  }

  // ---- plan-time pruning: filter ∩ constraint = ∅ ------------------

  /** A one-sided-or-closed interval over [[cmp]]-comparable values. */
  private final case class Interval(
      lo: Option[Any], loIncl: Boolean, hi: Option[Any], hiIncl: Boolean)

  /** Parse `col <op> literal` / `literal <op> col` into (column,
    * allowed interval). Anything richer → None (no pruning, never
    * wrong). */
  private def intervalOf(spark: SparkSession, sql: String): Option[(String, Interval)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.{expressions => ce}
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch { case scala.util.control.NonFatal(_) => return None }
    def litVal(l: ce.Literal): Option[Any] = l.value match {
      case null                                       => None
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case i: java.lang.Integer if l.dataType ==
          org.apache.spark.sql.types.DateType          => Some(i) // epoch-day domain
      case v                                           => Some(v)
    }
    def colName(e: ce.Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _                                                 => None
    }
    parsed match {
      case ce.GreaterThan(c, l: ce.Literal) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), false, None, false))
      case ce.GreaterThanOrEqual(c, l: ce.Literal) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), true, None, false))
      case ce.LessThan(c, l: ce.Literal) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(None, false, Some(v), false))
      case ce.LessThanOrEqual(c, l: ce.Literal) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(None, false, Some(v), true))
      case ce.EqualTo(c, l: ce.Literal) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), true, Some(v), true))
      // mirrored literal-first spellings
      case ce.GreaterThan(l: ce.Literal, c) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(None, false, Some(v), false))
      case ce.GreaterThanOrEqual(l: ce.Literal, c) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(None, false, Some(v), true))
      case ce.LessThan(l: ce.Literal, c) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), false, None, false))
      case ce.LessThanOrEqual(l: ce.Literal, c) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), true, None, false))
      case ce.EqualTo(l: ce.Literal, c) =>
        for (n <- colName(c); v <- litVal(l)) yield (n, Interval(Some(v), true, Some(v), true))
      case _ => None
    }
  }

  /** cmp in the shared exact-where-possible domain. */
  private def cmp(a: Any, b: Any): Option[Int] =
    graft.sources.SnapshotScanProbe.cmpValues(a, b)

  private def contains(iv: Interval, v: Any): Boolean = {
    val aboveLo = iv.lo.forall(lo => cmp(v, lo) match {
      case Some(c) => if (iv.loIncl) c >= 0 else c > 0
      case None    => true // incomparable → can't prove outside
    })
    val belowHi = iv.hi.forall(hi => cmp(v, hi) match {
      case Some(c) => if (iv.hiIncl) c <= 0 else c < 0
      case None    => true
    })
    aboveLo && belowHi
  }

  /** Is filter-range ∩ constraint-interval provably EMPTY? Continuous
    * semantics (never assumes integer steps) — only ever MORE
    * conservative. */
  private def filterDisjoint(iv: Interval, f: Filter): Boolean = f match {
    case EqualTo(_, v)  => !contains(iv, v)
    case In(_, vs)      => vs.nonEmpty && vs.forall(v => !contains(iv, v))
    case GreaterThan(_, v) => // x > v: empty iff constraint hi <= v
      iv.hi.exists(hi => cmp(hi, v).exists(c => c < 0 || c == 0))
    case GreaterThanOrEqual(_, v) => // x >= v: empty iff hi < v, or hi == v exclusive
      iv.hi.exists(hi => cmp(hi, v).exists(c => c < 0 || (c == 0 && !iv.hiIncl)))
    case LessThan(_, v) => // x < v: empty iff lo >= v
      iv.lo.exists(lo => cmp(lo, v).exists(c => c > 0 || c == 0))
    case LessThanOrEqual(_, v) => // x <= v: empty iff lo > v, or lo == v exclusive
      iv.lo.exists(lo => cmp(lo, v).exists(c => c > 0 || (c == 0 && !iv.loIncl)))
    case _ => false
  }

  /** True when some pushed comparison filter provably contradicts a
    * stored CHECK — the scan can plan ZERO files. Uses only RELIED or
    * enforced constraints: an un-enforced, un-relied CHECK is
    * documentation, not a proof. */
  def disjoint(spark: SparkSession, table: String, filters: Seq[Filter]): Boolean = {
    if (filters.isEmpty) return false
    val checks = read(spark, table).filter(c => c.enforced || c.rely)
    if (checks.isEmpty) return false
    val intervals = checks.flatMap(c => intervalOf(spark, c.predicateSql))
    intervals.exists { case (col, iv) =>
      filters.exists {
        case f @ EqualTo(c, _) if c == col            => filterDisjoint(iv, f)
        case f @ In(c, _) if c == col                 => filterDisjoint(iv, f)
        case f @ GreaterThan(c, _) if c == col        => filterDisjoint(iv, f)
        case f @ GreaterThanOrEqual(c, _) if c == col => filterDisjoint(iv, f)
        case f @ LessThan(c, _) if c == col           => filterDisjoint(iv, f)
        case f @ LessThanOrEqual(c, _) if c == col    => filterDisjoint(iv, f)
        case _                                        => false
      }
    }
  }
}
