package graft.lake

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.TimestampType

/** SQL-name registry for snapshot tables plus the analyzer rule that
  * resolves them — the SQL-syntax half of the time-travel contract
  * the reference's gold sink gets from Iceberg (`SELECT ... FROM t
  * VERSION AS OF 3` / `TIMESTAMP AS OF '...'`; reference
  * jobs/ev_sessions_gold_etl.py writes an Iceberg table whose
  * catalog exposes exactly this syntax through Athena/Spark SQL).
  *
  *   SnapshotCatalog.register("ev_fact", "/lake/gold/fact")
  *   spark.sql("SELECT * FROM ev_fact VERSION AS OF 2")
  *
  * The rule is injected by [[graft.functions.GraftExtensions]]
  * (spark.sql.extensions) and matches only single-part names present
  * in the registry, so it can never shadow a real catalog table with
  * a qualified name. `TIMESTAMP AS OF t` resolves to the newest
  * version whose manifest was PUBLISHED at or before `t` (manifest
  * mtime — publish order and version order coincide because the
  * manifest CAS linearizes commits). Registrations are
  * process-wide, matching the driver-side nature of the manifest log.
  */
object SnapshotCatalog {

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(name: String, path: String): Unit = {
    tables.put(name.toLowerCase, path); ()
  }

  def unregister(name: String): Unit = { tables.remove(name.toLowerCase); () }

  def pathOf(name: String): Option[String] = Option(tables.get(name.toLowerCase))

  /** Newest version whose manifest mtime is ≤ `tsMillis`. */
  private[lake] def versionAsOf(spark: SparkSession, path: String,
      tsMillis: Long): Long = {
    val f = SnapshotTable.fs(spark, path)
    val eligible = SnapshotTable.versions(spark, path).filter { v =>
      f.getFileStatus(new Path(s"${SnapshotTable.logDir(path)}/v$v"))
        .getModificationTime <= tsMillis
    }
    require(eligible.nonEmpty,
      s"no version of $path existed at or before timestamp $tsMillis")
    eligible.max
  }
}

/** Resolves `UnresolvedRelation`s (and their `RelationTimeTravel`
  * wrappers) whose single-part name is registered in
  * [[SnapshotCatalog]] into the snapshot read plan. */
case class ResolveSnapshotRelation(spark: SparkSession) extends Rule[LogicalPlan] {

  private def registered(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(n) => SnapshotCatalog.pathOf(n)
      case _      => None
    }

  /** DML targets may carry an alias (`MERGE INTO t alias`) — unwrap
    * to the underlying relation. */
  private def unwrapped(p: LogicalPlan): Option[UnresolvedRelation] = p match {
    case u: UnresolvedRelation => Some(u)
    case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => unwrapped(a.child)
    case _ => None
  }

  private def registeredTarget(p: LogicalPlan): Option[(UnresolvedRelation, String)] =
    unwrapped(p).flatMap(u => registered(u).map(u -> _))

  // resolveOperatorsDOWN: the DML statements must see their target
  // while it is still an UnresolvedRelation — bottom-up would rewrite
  // the target into a snapshot read plan first and the command cases
  // would never match
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case RelationTimeTravel(u: UnresolvedRelation, ts, version)
        if registered(u).isDefined =>
      val path = registered(u).get
      val v = version match {
        // a non-numeric VERSION AS OF is a tag name (Iceberg refs)
        case Some(s) => scala.util.Try(s.toLong).getOrElse(
          SnapshotTable.tagVersion(spark, path, s).getOrElse(
            throw new IllegalArgumentException(s"no tag '$s' at $path")))
        case None => SnapshotCatalog.versionAsOf(spark, path,
          ts.map(evalMillis).getOrElse(Long.MaxValue))
      }
      DatasetBridge.planOf(SnapshotTable.read(spark, path, Some(v)))

    // row-level SQL statements over registered tables → runnable
    // commands (the Iceberg-v2 statement surface; see
    // SnapshotSqlCommands). The predicate rides as a Column (not an
    // Expression constructor arg) so the command node is `resolved`
    // even though its attributes bind only at run time.
    case d @ org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable(target, cond) =>
      registeredTarget(target) match {
        case Some((u, path)) =>
          SnapshotDeleteCommand(u.multipartIdentifier.last, path,
            org.apache.spark.sql.graftbridge.ColumnBridge.column(cond))
        case None => d
      }

    case up: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
      registeredTarget(up.table) match {
        case Some((u, path)) =>
          import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          import org.apache.spark.sql.graftbridge.ColumnBridge
          val assigns = up.assignments.map { a =>
            val name = a.key match {
              case ua: UnresolvedAttribute => ua.nameParts.last
              case at: org.apache.spark.sql.catalyst.expressions.Attribute => at.name
              case other => throw new UnsupportedOperationException(
                "snapshot UPDATE SET must assign plain columns, got: " + other.sql)
            }
            name -> ColumnBridge.column(a.value)
          }
          SnapshotUpdateCommand(u.multipartIdentifier.last, path, assigns,
            up.condition.map(ColumnBridge.column)
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
        case None => up
      }

    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      registeredTarget(m.targetTable) match {
        case Some((u, path)) =>
          import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, UpdateStarAction}
          val supported = m.matchedActions.forall {
            case UpdateStarAction(None) => true
            case _                      => false
          } && m.notMatchedActions.forall {
            case InsertStarAction(None) => true
            case _                      => false
          } && m.notMatchedBySourceActions.isEmpty
          if (!supported) throw new UnsupportedOperationException(
            "snapshot MERGE supports exactly WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT * (unconditional); got: " + m.simpleString(5))
          SnapshotMergeCommand(u.multipartIdentifier.last, path,
            m.sourceTable, SnapshotSqlCommands.keyColsOf(m.mergeCondition))
        case None => m
      }

    // ALTER TABLE ... ADD CONSTRAINT n CHECK (e): the parser wraps the
    // target as Filter(NOT e, UnresolvedRelation) — dig the relation
    // out of the subtree; the constraint node carries the original
    // condition SQL text
    case ac: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
      val target = ac.child.collectFirst {
        case u: UnresolvedRelation => u
      }.flatMap(u => registered(u).map(u -> _))
      target match {
        case Some((u, path)) =>
          val cc = ac.checkConstraint
          val name = Option(cc.userProvidedName).getOrElse(
            "check_" + java.lang.Integer.toHexString(cc.condition.hashCode))
          SnapshotAddConstraintCommand(u.multipartIdentifier.last, path,
            name, cc.condition)
        case None => ac
      }

    case dc: org.apache.spark.sql.catalyst.plans.logical.DropConstraint =>
      dc.table match {
        case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
            if t.multipartIdentifier.size == 1 &&
              SnapshotCatalog.pathOf(t.multipartIdentifier.head).isDefined =>
          val n = t.multipartIdentifier.head
          SnapshotDropConstraintCommand(n, SnapshotCatalog.pathOf(n).get,
            dc.name, dc.ifExists)
        case _ => dc
      }

    // a WHERE clause directly above a registered relation resolves
    // through readWhere, so HIDDEN-PARTITIONED tables get their
    // inclusive-projection partition pruning in SQL too (the Iceberg
    // behavior: `SELECT ... FROM t WHERE ts >= X` prunes day dirs the
    // query never names). Plain tables take the same path — readWhere
    // on them is read().filter. The alias (AS name or the table name)
    // is applied so qualified column references resolve.
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
        if registeredTarget(child).isDefined &&
          !cond.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) =>
      val (u, path) = registeredTarget(child).get
      val alias = child match {
        case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          a.alias
        case _ => u.multipartIdentifier.last
      }
      DatasetBridge.planOf(SnapshotTable.readWhere(spark, path,
        org.apache.spark.sql.graftbridge.ColumnBridge.column(cond),
        sqlAlias = Some(alias)))

    // Iceberg-style metadata tables: `SELECT * FROM t.history`,
    // `t.files`, `t.partitions` — the inspection surface an Iceberg
    // catalog exposes, resolved from the registered name's manifest
    case u: UnresolvedRelation
        if u.multipartIdentifier.size == 2 &&
          SnapshotCatalog.pathOf(u.multipartIdentifier.head).isDefined &&
          Set("history", "files", "partitions")(u.multipartIdentifier(1).toLowerCase) =>
      val path = SnapshotCatalog.pathOf(u.multipartIdentifier.head).get
      val df = u.multipartIdentifier(1).toLowerCase match {
        case "history"    => SnapshotTable.history(spark, path)
        case "files"      => SnapshotTable.filesMetadata(spark, path)
        case "partitions" => SnapshotTable.partitionsMetadata(spark, path)
      }
      DatasetBridge.planOf(df)

    case u: UnresolvedRelation if registered(u).isDefined =>
      DatasetBridge.planOf(SnapshotTable.read(spark, path = registered(u).get))
  }

  /** `TIMESTAMP AS OF <expr>`: fold the (foldable) expression to
    * epoch millis via a timestamp cast in the session zone. */
  private def evalMillis(e: Expression): Long = {
    val micros = Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)).eval(null)
    require(micros != null, s"TIMESTAMP AS OF expression $e is not a valid timestamp")
    micros.asInstanceOf[Long] / 1000L
  }
}
