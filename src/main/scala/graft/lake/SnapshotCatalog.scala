package graft.lake

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, ResolvedTable, UnresolvedAttribute, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
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
  *
  * The same rule is the read/DML half of [[GraftCatalog]]: relations
  * a `TableCatalog` lookup resolved to a [[GraftTable]] are
  * substituted onto the native snapshot read plan (exprId-aligned, so
  * already-resolved parents keep binding), and row-level statements
  * whose target is a catalog table become the same Snapshot*Command
  * nodes as registry-named ones.
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
    // through the .ckpt-sidecar fallback: a crashed vacuum checkpoint
    // swap must not make TIMESTAMP AS OF throw FileNotFound
    val eligible = SnapshotTable.versions(spark, path).filter { v =>
      SnapshotTable.versionFileStatus(f, path, v)._2
        .getModificationTime <= tsMillis
    }
    require(eligible.nonEmpty,
      s"no version of $path existed at or before timestamp $tsMillis")
    eligible.max
  }
}

/** Resolves snapshot-table relations into the native read plan and
  * snapshot DML statements into runnable commands — for BOTH name
  * sources: single-part names registered in [[SnapshotCatalog]]
  * (still `UnresolvedRelation` when this rule sees them) and
  * [[GraftCatalog]] tables (already a `DataSourceV2Relation` holding
  * a [[GraftTable]], resolved by Spark's own catalog lookup). */
case class ResolveSnapshotRelation(spark: SparkSession) extends Rule[LogicalPlan] {

  /** A rewritable snapshot-table occurrence: `name` (short table
    * name), `alias` (SQL-visible qualifier: AS alias, or the name),
    * the storage path, and — when Spark already resolved the relation
    * (catalog path) — its output attributes, which any substitute
    * plan must keep answering to by exprId. */
  private case class Target(name: String, alias: String, path: String,
      out: Option[Seq[Attribute]], readOnly: Boolean = false)

  /** A branch-ref time-travel relation prunes like a table but is
    * never a DML target — DML on a branch goes through its branch
    * handle, where the writer explicitly chose the ref. */
  private def requireWritable(t: Target, stmt: String): Unit =
    if (t.readOnly) throw new UnsupportedOperationException(
      s"$stmt on versioned (branch-ref) read '${t.name}' is not supported — " +
        "run the statement against the branch handle instead")

  private def registered(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(n) => SnapshotCatalog.pathOf(n)
      case _      => None
    }

  /** DML targets may carry an alias (`MERGE INTO t alias`) — unwrap
    * to the underlying relation. Pinned time-travel and metadata
    * relations never match. A branch-head time-travel relation
    * (VERSION AS OF '<branch>', pinnedVersion=None, readOnly=true)
    * DOES match — intentionally, so Filter pruning applies on the
    * branch handle — but carries `readOnly`, which the DML cases
    * check so a branch-ref can never silently become a write
    * target. */
  private def targetOf(p: LogicalPlan): Option[Target] = p match {
    case u: UnresolvedRelation =>
      registered(u).map(path =>
        Target(u.multipartIdentifier.last, u.multipartIdentifier.last, path, None))
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable if t.pinnedVersion.isEmpty && t.metaKind.isEmpty =>
        val short = t.identName.split("\\.").last
        Some(Target(short, short, t.path, Some(r.output), readOnly = t.readOnly))
      case _ => None
    }
    case a: SubqueryAlias =>
      targetOf(a.child).map(t => t.copy(alias = a.alias))
    case _ => None
  }

  /** Re-target a resolved condition at a fresh frame: attribute
    * references become plain unresolved names (the registry path's
    * conditions arrive unresolved already — this is a no-op there).
    * Resolved-by-exprId attrs can never bind against the readWhere /
    * command frame, which has its own exprIds. */
  private def deresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }

  /** Wrap a substitute plan so it exposes exactly `out`'s exprIds:
    * parents that resolved against the original relation's output
    * keep binding. Used only on catalog relations (registry relations
    * are still unresolved when replaced, so nothing references them
    * yet). */
  private def aligned(plan: LogicalPlan, out: Seq[Attribute]): LogicalPlan = {
    val byName = plan.output.map(a => a.name.toLowerCase -> a).toMap
    Project(out.map { o =>
      val src = byName.getOrElse(o.name.toLowerCase,
        throw new IllegalStateException(
          s"snapshot read plan lacks column '${o.name}' of the catalog schema"))
      Alias(src, o.name)(exprId = o.exprId)
    }, plan)
  }

  private def substituted(df: org.apache.spark.sql.DataFrame,
      out: Option[Seq[Attribute]]): LogicalPlan = {
    val plan = DatasetBridge.planOf(df)
    out.map(aligned(plan, _)).getOrElse(plan)
  }

  // Top-down custom recursion (not resolveOperatorsDown): write
  // commands keep their TABLE child un-substituted — an
  // InsertIntoStatement / AppendData target must stay a relation for
  // Spark's own insert resolution and the V1 write fallback, while
  // the same relation in read position becomes the native plan.
  override def apply(plan: LogicalPlan): LogicalPlan =
    rewrite(plan, pendingRowId(plan))

  /** An unresolved `_row_id` reference anywhere in the plan: the
    * metadata column ([[GraftTable.metadataColumns]]) has not been
    * injected into its relation's output yet (AddMetadataColumns runs
    * in the same fixed-point batch). Substituting the relation now
    * would strand the reference, so GraftTable read substitutions
    * wait one iteration. */
  private def pendingRowId(plan: LogicalPlan): Boolean =
    plan.exists { n =>
      // resolved from the relation's metadataOutput but not yet
      // injected into its output (AddMetadataColumns pending);
      // missingInput walks child outputs, so it is only safe — and
      // only meaningful — once the children resolved
      (n.childrenResolved &&
        n.missingInput.exists(_.name.equalsIgnoreCase(SnapshotTable.RowIdCol))) ||
        n.expressions.exists(_.exists {
          case u: UnresolvedAttribute =>
            u.nameParts.last.equalsIgnoreCase(SnapshotTable.RowIdCol)
          case _ => false
        })
    }

  private def rewrite(p: LogicalPlan, deferRid: Boolean): LogicalPlan = {
    val deferred = deferRid && (p match {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
      case Filter(_, child)        => targetOf(child).isDefined
      case _                       => false
    })
    val applied =
      if (deferred) p else cases.applyOrElse(p, identity[LogicalPlan])
    if (!(applied eq p)) applied
    else p match {
      case w: V2WriteCommand =>
        w.mapChildren(c => if (c eq w.table) c else rewrite(c, deferRid))
      case i: InsertIntoStatement =>
        i.mapChildren(c => if (c eq i.table) c else rewrite(c, deferRid))
      case _ => p.mapChildren(rewrite(_, deferRid))
    }
  }

  private val cases: PartialFunction[LogicalPlan, LogicalPlan] = {
    case RelationTimeTravel(u: UnresolvedRelation, ts, version)
        if registered(u).isDefined =>
      val path = registered(u).get
      val df = version match {
        // a non-numeric VERSION AS OF is a ref name: tag or branch
        // head (Iceberg refs share one namespace)
        case Some(s) => s.toLongOption match {
          case Some(v) => SnapshotTable.read(spark, path, Some(v))
          case None =>
            val (h, v) = SnapshotTable.resolveRef(spark, path, s).getOrElse(
              throw new IllegalArgumentException(
                s"no tag or branch '$s' at $path"))
            SnapshotTable.read(spark, h, v)
        }
        case None => SnapshotTable.read(spark, path,
          Some(SnapshotCatalog.versionAsOf(spark, path,
            ts.map(evalMillis).getOrElse(Long.MaxValue))))
      }
      DatasetBridge.planOf(df)

    // row-level SQL statements over snapshot tables → runnable
    // commands (the Iceberg-v2 statement surface; see
    // SnapshotSqlCommands). The predicate rides as a Column (not an
    // Expression constructor arg) so the command node is `resolved`
    // even though its attributes bind only at run time.
    case d @ DeleteFromTable(target, cond) =>
      targetOf(target) match {
        case Some(t) =>
          requireWritable(t, "DELETE")
          SnapshotDeleteCommand(t.alias, t.path,
            ColumnBridge.column(deresolve(cond)))
        case None => d
      }

    case up: UpdateTable =>
      targetOf(up.table) match {
        case Some(t) =>
          requireWritable(t, "UPDATE")
          val assigns = up.assignments.map { a =>
            val name = a.key match {
              case ua: UnresolvedAttribute => ua.nameParts.last
              case at: Attribute => at.name
              case other => throw new UnsupportedOperationException(
                "snapshot UPDATE SET must assign plain columns, got: " + other.sql)
            }
            name -> ColumnBridge.column(deresolve(a.value))
          }
          SnapshotUpdateCommand(t.alias, t.path, assigns,
            up.condition.map(c => ColumnBridge.column(deresolve(c)))
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
        case None => up
      }

    case m: MergeIntoTable =>
      targetOf(m.targetTable) match {
        case Some(t) =>
          requireWritable(t, "MERGE")
          // the supported shape is full-row upsert: star actions, or
          // their analyzer-expanded equivalent (one name-aligned
          // assignment per target column — ResolveReferences expands
          // `SET *` before this rule runs when the target resolved
          // through a catalog)
          val width = t.out.map(_.size)
          def fullRowAligned(assigns: Seq[Assignment]): Boolean =
            width.forall(_ == assigns.size) && assigns.forall { a =>
              val k = a.key match {
                case ua: UnresolvedAttribute => Some(ua.nameParts.last)
                case at: Attribute           => Some(at.name)
                case _                       => None
              }
              val v = a.value match {
                case ua: UnresolvedAttribute => Some(ua.nameParts.last)
                case at: Attribute           => Some(at.name)
                case _                       => None
              }
              k.zip(v).exists { case (a1, b1) => a1.equalsIgnoreCase(b1) }
            }
          val supported = m.matchedActions.forall {
            case UpdateStarAction(None)          => true
            case UpdateAction(None, assigns, _)  => fullRowAligned(assigns)
            case _                               => false
          } && m.notMatchedActions.forall {
            case InsertStarAction(None)          => true
            case InsertAction(None, assigns)     => fullRowAligned(assigns)
            case _                               => false
          } && m.notMatchedBySourceActions.isEmpty &&
            // WITH SCHEMA EVOLUTION always rides the clause engine —
            // star actions then expand over the POST-evolution schema
            // (new source columns included; target-only columns keep)
            !m.withSchemaEvolution
          if (supported)
            // the unconditional full-row upsert keeps its dedicated
            // fast path (merge(): one join, identity/rid inheritance)
            SnapshotMergeCommand(t.alias, t.path,
              m.sourceTable, SnapshotSqlCommands.keyColsOf(m.mergeCondition))
          else {
            // qualifier-preserving re-target (unlike deresolve): both
            // sides of a MERGE share column names, so a resolved
            // attribute must keep its alias qualifier to re-resolve
            // unambiguously against the command's joined frame
            def qexpr(e: Expression): org.apache.spark.sql.Column =
              ColumnBridge.column(e.transform {
                case a: AttributeReference =>
                  UnresolvedAttribute(a.qualifier.takeRight(1) :+ a.name)
              })
            def assignsOf(as: Seq[Assignment]): Seq[(String, org.apache.spark.sql.Column)] =
              as.map { a =>
                val name = a.key match {
                  case ua: UnresolvedAttribute => ua.nameParts.last
                  case at: Attribute           => at.name
                  case other => throw new UnsupportedOperationException(
                    "snapshot MERGE must assign plain columns, got: " + other.sql)
                }
                name -> qexpr(a.value)
              }
            def matchedOf(a: MergeAction, fam: String): MergeMatchedClause = a match {
              case UpdateStarAction(c)      => MergeUpdate(c.map(qexpr), Nil)
              // an analyzer-expanded SET * under WITH SCHEMA EVOLUTION
              // reverts to star form so the expansion happens over the
              // POST-evolution schema (fromStar carries the intent)
              case UpdateAction(c, _, true) if m.withSchemaEvolution =>
                MergeUpdate(c.map(qexpr), Nil)
              case UpdateAction(c, as, _)   => MergeUpdate(c.map(qexpr), assignsOf(as))
              case DeleteAction(c)          => MergeDelete(c.map(qexpr))
              case other => throw new UnsupportedOperationException(
                s"snapshot MERGE $fam supports UPDATE/DELETE, got: " + other.sql)
            }
            val nm = m.notMatchedActions.map {
              case InsertStarAction(c)   => MergeInsert(c.map(qexpr), Nil)
              // InsertAction has no fromStar flag, so an analyzer-
              // expanded INSERT * under WITH SCHEMA EVOLUTION is
              // recovered structurally: a full-width name-aligned
              // identity list IS star (and a user writing that list
              // out by hand asked for the same thing)
              case InsertAction(c, as)
                  if m.withSchemaEvolution && fullRowAligned(as) =>
                MergeInsert(c.map(qexpr), Nil)
              case InsertAction(c, as)   => MergeInsert(c.map(qexpr), assignsOf(as))
              case other => throw new UnsupportedOperationException(
                "snapshot MERGE WHEN NOT MATCHED supports INSERT, got: " + other.sql)
            }
            // the statement's own source alias, so `s.c` references in
            // clause expressions re-resolve against the command's frame
            val sAlias = m.sourceTable match {
              case SubqueryAlias(id, _)  => id.name
              case u: UnresolvedRelation => u.multipartIdentifier.last
              case _                     => "__graft_src"
            }
            SnapshotMergeClausesCommand(t.alias, t.path, m.sourceTable, sAlias,
              SnapshotSqlCommands.keyColsOf(m.mergeCondition),
              m.matchedActions.map(matchedOf(_, "WHEN MATCHED")), nm,
              m.notMatchedBySourceActions.map(matchedOf(_, "WHEN NOT MATCHED BY SOURCE")),
              schemaEvolution = m.withSchemaEvolution)
          }
        case None => m
      }

    // ALTER TABLE ... ADD CONSTRAINT n CHECK (e): the parser wraps the
    // target as Filter(NOT e, UnresolvedRelation) — dig the relation
    // out of the subtree; the constraint node carries the original
    // condition SQL text
    case ac: AddCheckConstraint =>
      val target = ac.child.collectFirst {
        case u: UnresolvedRelation if registered(u).isDefined =>
          (u.multipartIdentifier.last, registered(u).get)
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
            r.table.asInstanceOf[GraftTable].metaKind.isEmpty =>
          val t = r.table.asInstanceOf[GraftTable]
          (t.identName.split("\\.").last, t.path)
      }
      target match {
        case Some((name, path)) =>
          val cc = ac.checkConstraint
          val cname = Option(cc.userProvidedName).getOrElse(
            "check_" + java.lang.Integer.toHexString(cc.condition.hashCode))
          SnapshotAddConstraintCommand(name, path, cname, cc.condition)
        case None => ac
      }

    // TRUNCATE TABLE <registered>: catalog tables take the DSv2
    // TruncatableTable path (GraftTable.truncateTable); registry
    // names resolve here
    case tt: TruncateTable =>
      tt.table match {
        case t: UnresolvedTable
            if t.multipartIdentifier.size == 1 &&
              SnapshotCatalog.pathOf(t.multipartIdentifier.head).isDefined =>
          SnapshotMaintenanceCommand(t.multipartIdentifier, "truncate")
        case _ => tt
      }

    case dc: DropConstraint =>
      dc.table match {
        case t: UnresolvedTable
            if t.multipartIdentifier.size == 1 &&
              SnapshotCatalog.pathOf(t.multipartIdentifier.head).isDefined =>
          val n = t.multipartIdentifier.head
          SnapshotDropConstraintCommand(n, SnapshotCatalog.pathOf(n).get,
            dc.name, dc.ifExists)
        case r: ResolvedTable if r.table.isInstanceOf[GraftTable] =>
          val t = r.table.asInstanceOf[GraftTable]
          SnapshotDropConstraintCommand(t.identName.split("\\.").last, t.path,
            dc.name, dc.ifExists)
        case _ => dc
      }

    // a WHERE clause directly above a snapshot relation resolves
    // through readWhere, so HIDDEN-PARTITIONED tables get their
    // inclusive-projection partition pruning in SQL too (the Iceberg
    // behavior: `SELECT ... FROM t WHERE ts >= X` prunes day dirs the
    // query never names). Plain tables take the same path — readWhere
    // on them is read().filter. The alias (AS name or the table name)
    // is applied so qualified column references resolve.
    case Filter(cond, child)
        if targetOf(child).isDefined &&
          !cond.exists(_.isInstanceOf[SubqueryExpression]) =>
      val t = targetOf(child).get
      // a relation whose output carries the injected `_row_id`
      // metadata column reads through the tracked readWhere — both
      // pruning families compose with row ids (the ev45 composition,
      // here on the SQL path)
      val df =
        if (t.out.exists(_.exists(_.name.equalsIgnoreCase(SnapshotTable.RowIdCol))))
          SnapshotTable.readWhereWithRowIds(spark, t.path,
            ColumnBridge.column(deresolve(cond)), sqlAlias = Some(t.alias))
        else SnapshotTable.readWhere(spark, t.path,
          ColumnBridge.column(deresolve(cond)), sqlAlias = Some(t.alias))
      substituted(df, t.out)

    // Iceberg-style metadata tables: `SELECT * FROM t.history`,
    // `t.files`, `t.partitions` — the inspection surface an Iceberg
    // catalog exposes, resolved from the registered name's manifest
    // (GraftCatalog names resolve these through loadTable instead)
    case u: UnresolvedRelation
        if u.multipartIdentifier.size == 2 &&
          SnapshotCatalog.pathOf(u.multipartIdentifier.head).isDefined &&
          GraftTable.metaKinds(u.multipartIdentifier(1).toLowerCase) =>
      val path = SnapshotCatalog.pathOf(u.multipartIdentifier.head).get
      val df = u.multipartIdentifier(1).toLowerCase match {
        case "history"    => SnapshotTable.history(spark, path)
        case "files"      => SnapshotTable.filesMetadata(spark, path)
        case "partitions" => SnapshotTable.partitionsMetadata(spark, path)
      }
      DatasetBridge.planOf(df)

    case u: UnresolvedRelation if registered(u).isDefined =>
      DatasetBridge.planOf(SnapshotTable.read(spark, path = registered(u).get))

    // a GraftCatalog relation in read position → the native snapshot
    // read plan (manifest-scoped parquet scan: file pruning, DVs,
    // hidden-partition drop), exprId-aligned for already-resolved
    // parents. GraftTable deliberately has no DSv2 scan — this
    // substitution IS the read path.
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t = r.table.asInstanceOf[GraftTable]
      val wantsRid = t.metaKind.isEmpty &&
        r.output.exists(_.name.equalsIgnoreCase(SnapshotTable.RowIdCol))
      val df = t.metaKind match {
        case Some(_)          => t.metaFrame
        case None if wantsRid =>
          // `_row_id` metadata column referenced → tracked read (time
          // travel included: a pinned relation serves the ids that
          // version recorded)
          SnapshotTable.readWithRowIds(spark, t.path, t.pinnedVersion)
        case None             => SnapshotTable.read(spark, t.path, t.pinnedVersion)
      }
      substituted(df, Some(r.output))
  }

  /** `TIMESTAMP AS OF <expr>`: fold the (foldable) expression to
    * epoch millis via a timestamp cast in the session zone. */
  private def evalMillis(e: Expression): Long = {
    val micros = Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)).eval(null)
    require(micros != null, s"TIMESTAMP AS OF expression $e is not a valid timestamp")
    micros.asInstanceOf[Long] / 1000L
  }
}
