package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** Injected SQL parser adding the branch/tag DDL statements Spark's
  * grammar has no syntax for (the Iceberg ref-management surface,
  * statement-shaped rather than `CALL system.*` procedures):
  *
  *   ALTER TABLE t CREATE BRANCH dev [AS OF VERSION 3 | AS OF TAG golden]
  *   ALTER TABLE t DROP BRANCH dev
  *   ALTER TABLE t CREATE [OR REPLACE] TAG golden [AS OF VERSION 3]
  *   ALTER TABLE t DROP TAG golden
  *   ALTER TABLE t FAST FORWARD BRANCH dev
  *   ALTER TABLE t CHERRY PICK BRANCH dev VERSION 4
  *   ALTER TABLE t CLUSTER BY (c1, c2)
  *
  * the constraint inspection statement Spark has no syntax for
  * (`ALTER TABLE ... ADD/DROP CONSTRAINT` itself parses NATIVELY in
  * Spark 4.1 and routes through [[ResolveSnapshotRelation]]):
  *
  *   SHOW CONSTRAINTS [IN] t
  *
  * and the Delta-shaped maintenance statements:
  *
  *   VACUUM t [KEEP n VERSIONS] [DRY RUN]
  *   OPTIMIZE t [FILES n | ZORDER BY (c1, c2) | INCREMENTAL
  *               | WHERE <pred> [ZORDER BY (c1, c2) | INCREMENTAL]]
  *   ALTER TABLE t SET AUTOCOMPACT n [ROWS r] | UNSET AUTOCOMPACT
  *   ALTER TABLE t SET AUTOCLUSTER n | UNSET AUTOCLUSTER
  *   RESTORE [TABLE] t TO VERSION AS OF <n | 'tag'>
  *   RESTORE [TABLE] t TO TIMESTAMP AS OF '<ts>'
  *   SHOW BRANCHES [IN] t / SHOW TAGS [IN] t
  *
  * Reading a ref needs no new syntax — `VERSION AS OF '<ref>'`
  * resolves tags and branch heads already; writing to a branch goes
  * through its registered handle. Everything else delegates to
  * Spark's parser untouched, so this is a pure statement-surface
  * extension (the Delta/Iceberg extension-parser pattern). The table
  * identifier resolves at RUN time: a single-part name through
  * [[SnapshotCatalog]]'s registry, a multi-part name through the
  * session's catalog manager (a [[GraftCatalog]] table carries its
  * storage path).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateBranchAtVersion(t, b, v) =>
      SnapshotRefDdlCommand(idents(t), "create_branch", b, Some(v.toLong), None)
    case CreateBranchAtTag(t, b, tag) =>
      SnapshotRefDdlCommand(idents(t), "create_branch", b, None, Some(tag))
    case CreateBranch(t, b) =>
      SnapshotRefDdlCommand(idents(t), "create_branch", b, None, None)
    case DropBranch(t, b) =>
      SnapshotRefDdlCommand(idents(t), "drop_branch", b, None, None)
    case CreateTagAtVersion(t, orReplace, tag, v) =>
      SnapshotRefDdlCommand(idents(t), "create_tag", tag, Some(v.toLong), None,
        replace = orReplace != null)
    case CreateTag(t, orReplace, tag) =>
      SnapshotRefDdlCommand(idents(t), "create_tag", tag, None, None,
        replace = orReplace != null)
    case DropTag(t, tag) =>
      SnapshotRefDdlCommand(idents(t), "drop_tag", tag, None, None)
    case FastForward(t, b) =>
      SnapshotRefDdlCommand(idents(t), "fast_forward", b, None, None)
    case CherryPick(t, b, v) =>
      SnapshotRefDdlCommand(idents(t), "cherry_pick", b, Some(v.toLong), None)
    case ShowConstraints(t) => SnapshotShowConstraintsCommand(idents(t))
    case RestoreVersion(t, v) =>
      SnapshotRestoreCommand(idents(t), Some(v.toLong), None, None)
    case RestoreTag(t, tag) =>
      SnapshotRestoreCommand(idents(t), None, Some(tag), None)
    case RestoreTimestamp(t, ts) =>
      SnapshotRestoreCommand(idents(t), None, None, Some(ts))
    case VacuumKeepDry(t, n) =>
      SnapshotVacuumDryRunCommand(idents(t), keepVersions = n.toInt)
    case VacuumDry(t) =>
      SnapshotVacuumDryRunCommand(idents(t), keepVersions = 1)
    case VacuumKeep(t, n) =>
      SnapshotMaintenanceCommand(idents(t), "vacuum", keepVersions = n.toInt)
    case Vacuum(t) =>
      SnapshotMaintenanceCommand(idents(t), "vacuum")
    case OptimizeZorder(t, cols) =>
      SnapshotMaintenanceCommand(idents(t), "optimize",
        zorderCols = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case OptimizeIncremental(t) =>
      SnapshotMaintenanceCommand(idents(t), "optimize_incremental")
    case OptimizeFiles(t, n) =>
      SnapshotMaintenanceCommand(idents(t), "optimize", numFiles = n.toInt)
    case OptimizeWhereZorder(t, pred, cols) =>
      SnapshotMaintenanceCommand(idents(t), "optimize",
        zorderCols = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        whereSql = Some(pred.trim))
    // guard disambiguates a predicate whose LAST token is a column
    // literally named `incremental`: the INCREMENTAL route is taken
    // only when the captured prefix is itself a parsable expression
    // ("p = 1" from "WHERE p = 1 INCREMENTAL"); "active AND" from
    // "WHERE active AND incremental" is not, so that statement falls
    // through to the plain scoped OPTIMIZE with its full predicate
    case OptimizeWhereIncremental(t, pred) if parsesAsExpression(pred) =>
      SnapshotMaintenanceCommand(idents(t), "optimize_incremental",
        whereSql = Some(pred.trim))
    case OptimizeWhere(t, pred) =>
      SnapshotMaintenanceCommand(idents(t), "optimize",
        whereSql = Some(pred.trim))
    case Optimize(t) =>
      SnapshotMaintenanceCommand(idents(t), "optimize")
    case ShowBranches(t) => SnapshotShowRefsCommand(idents(t), "branches")
    case ShowTags(t)     => SnapshotShowRefsCommand(idents(t), "tags")
    case CloneVersion(dst, kind, src, v) =>
      SnapshotCloneCommand(idents(dst), idents(src),
        deep = kind.equalsIgnoreCase("deep"), Some(v.toLong), None)
    case CloneTag(dst, kind, src, tag) =>
      SnapshotCloneCommand(idents(dst), idents(src),
        deep = kind.equalsIgnoreCase("deep"), None, Some(tag))
    case Clone(dst, kind, src) =>
      SnapshotCloneCommand(idents(dst), idents(src),
        deep = kind.equalsIgnoreCase("deep"), None, None)
    case EnableRowTracking(t) => SnapshotEnableRowTrackingCommand(idents(t))
    case SetAutoCompact(t, minFiles, rows) =>
      SnapshotPolicyCommand(idents(t), "autocompact", minFiles.toInt,
        Option(rows).map(_.toLong))
    case UnsetAutoCompact(t) =>
      SnapshotPolicyCommand(idents(t), "autocompact", 0, None)
    case SetAutoCluster(t, minStale) =>
      SnapshotPolicyCommand(idents(t), "autocluster", minStale.toInt, None)
    case UnsetAutoCluster(t) =>
      SnapshotPolicyCommand(idents(t), "autocluster", 0, None)
    case ClusterBy(t, cols) =>
      SnapshotMaintenanceCommand(idents(t), "cluster_by",
        zorderCols = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case DescribeDetail(t) => SnapshotDescribeDetailCommand(idents(t))
    case DescribeHistory(t) => SnapshotDescribeHistoryCommand(idents(t))
    case ReplacePartitionSpec(t, specs) =>
      SnapshotEvolveSpecCommand(idents(t), GraftSqlParser.splitSpecs(specs))
    case ShowPartitionSpec(t) => SnapshotShowSpecCommand(idents(t))
    case other => delegate.parsePlan(other)
  }

  /** True when `s` parses as a WHERE-clause predicate — the
    * OptimizeWhereIncremental disambiguation guard (a predicate that
    * genuinely ends in a column named `incremental` AND wants the
    * incremental route can parenthesize itself: `WHERE (... AND
    * incremental) INCREMENTAL`). Parsed as a WHERE clause, not via
    * parseExpression, because the latter's namedExpression rule
    * accepts a trailing bare alias — parseExpression("active AND")
    * is `active AS AND`, which would defeat the guard. Syntax-only
    * (delegate.parsePlan), no analysis, no catalog. */
  private def parsesAsExpression(s: String): Boolean =
    try { delegate.parsePlan(s"SELECT * FROM __graft_probe WHERE $s"); true }
    catch { case scala.util.control.NonFatal(_) => false }

  private def idents(t: String): Seq[String] =
    delegate.parseMultipartIdentifier(t)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private object GraftSqlParser {
  // identifiers: optionally backquoted parts joined by dots; ref
  // names: one capture group, bare or single-quoted (quotes lenient).
  // (?is) = case-insensitive, dot-all; trailing ;? tolerates a
  // statement terminator.
  private val T = """((?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))*)"""
  private val N = """'?(\w[\w-]*)'?"""

  private def rx(body: String) =
    new scala.util.matching.Regex(s"(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+$body\\s*;?\\s*")

  private[lake] val CreateBranchAtVersion =
    rx(s"CREATE\\s+BRANCH\\s+$N\\s+AS\\s+OF\\s+VERSION\\s+(\\d+)")
  private[lake] val CreateBranchAtTag =
    rx(s"CREATE\\s+BRANCH\\s+$N\\s+AS\\s+OF\\s+TAG\\s+$N")
  private[lake] val CreateBranch = rx(s"CREATE\\s+BRANCH\\s+$N")
  private[lake] val DropBranch = rx(s"DROP\\s+BRANCH\\s+$N")
  private[lake] val CreateTagAtVersion =
    rx(s"CREATE\\s+(OR\\s+REPLACE\\s+)?TAG\\s+$N\\s+AS\\s+OF\\s+VERSION\\s+(\\d+)")
  private[lake] val CreateTag = rx(s"CREATE\\s+(OR\\s+REPLACE\\s+)?TAG\\s+$N")
  private[lake] val DropTag = rx(s"DROP\\s+TAG\\s+$N")
  private[lake] val FastForward = rx(s"FAST\\s+FORWARD\\s+BRANCH\\s+$N")
  private[lake] val CherryPick =
    rx(s"CHERRY\\s+PICK\\s+BRANCH\\s+$N\\s+VERSION\\s+(\\d+)")

  // maintenance statements (Delta-shaped VACUUM / OPTIMIZE)
  private def stmt(body: String) =
    new scala.util.matching.Regex(s"(?is)\\s*$body\\s*;?\\s*")
  // Delta's RESTORE statement shapes; a quoted non-numeric version
  // target is a TAG (branch heads move — restoring to one would be
  // restoring to a moving target; use its version instead)
  private[lake] val RestoreVersion =
    stmt(s"RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)")
  private[lake] val RestoreTag =
    stmt(s"RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+$N")
  private[lake] val RestoreTimestamp =
    stmt(s"RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'")
  private[lake] val VacuumKeepDry =
    stmt(s"VACUUM\\s+$T\\s+KEEP\\s+(\\d+)\\s+VERSIONS?\\s+DRY\\s+RUN")
  private[lake] val VacuumDry = stmt(s"VACUUM\\s+$T\\s+DRY\\s+RUN")
  private[lake] val VacuumKeep =
    stmt(s"VACUUM\\s+$T\\s+KEEP\\s+(\\d+)\\s+VERSIONS?")
  private[lake] val Vacuum = stmt(s"VACUUM\\s+$T")
  private[lake] val OptimizeZorder =
    stmt(s"OPTIMIZE\\s+$T\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)")
  // liquid-clustering maintenance: cluster only files not yet marked
  // under the recorded spec; settled files stay byte-identical
  private[lake] val OptimizeIncremental =
    stmt(s"OPTIMIZE\\s+$T\\s+INCREMENTAL")
  private[lake] val OptimizeFiles =
    stmt(s"OPTIMIZE\\s+$T\\s+FILES\\s+(\\d+)")
  // Delta's partition-scoped maintenance: only files the predicate
  // could touch are rewritten (whole-file; any predicate is safe)
  private[lake] val OptimizeWhereZorder =
    stmt(s"OPTIMIZE\\s+$T\\s+WHERE\\s+(.+?)\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)")
  // scoped maintenance wave: incremental clustering bounded to the
  // predicate's candidate partitions (must match before OptimizeWhere,
  // whose lazy predicate capture would swallow the INCREMENTAL token)
  private[lake] val OptimizeWhereIncremental =
    stmt(s"OPTIMIZE\\s+$T\\s+WHERE\\s+(.+?)\\s+INCREMENTAL")
  private[lake] val OptimizeWhere =
    stmt(s"OPTIMIZE\\s+$T\\s+WHERE\\s+(.+?)")
  private[lake] val Optimize = stmt(s"OPTIMIZE\\s+$T")
  // Delta's CLONE statement: CREATE TABLE t2 [SHALLOW|DEEP] CLONE t1
  // [VERSION AS OF <n|'tag'>] — target must be a catalog name (its
  // storage path derives from the warehouse mapping)
  private[lake] val CloneVersion = stmt(
    s"CREATE\\s+TABLE\\s+$T\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$T\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)")
  // tag capture is permissive ([^']+): a tag created with dots or
  // other punctuation must still match HERE so the clone command's
  // tag lookup can raise its clear no-such-tag error, instead of
  // falling through to the delegate parser's opaque syntax failure
  private[lake] val CloneTag = stmt(
    s"CREATE\\s+TABLE\\s+$T\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$T\\s+VERSION\\s+AS\\s+OF\\s+'([^']+)'")
  private[lake] val Clone = stmt(
    s"CREATE\\s+TABLE\\s+$T\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$T")
  // row tracking opt-in (Delta: SET TBLPROPERTIES delta.enableRowTracking;
  // spelled as a first-class statement here, like the ref DDL)
  private[lake] val EnableRowTracking =
    stmt(s"ALTER\\s+TABLE\\s+$T\\s+ENABLE\\s+ROW\\s+TRACKING")
  // commit-time maintenance policies (Delta: SET TBLPROPERTIES
  // delta.autoOptimize.autoCompact; first-class statements here):
  // SET AUTOCOMPACT <minSmallFiles> [ROWS <smallFileRows>] /
  // SET AUTOCLUSTER <minStaleFiles> / UNSET either
  private[lake] val SetAutoCompact = stmt(
    s"ALTER\\s+TABLE\\s+$T\\s+SET\\s+AUTOCOMPACT\\s+(\\d+)(?:\\s+ROWS\\s+(\\d+))?")
  private[lake] val UnsetAutoCompact =
    stmt(s"ALTER\\s+TABLE\\s+$T\\s+UNSET\\s+AUTOCOMPACT")
  private[lake] val SetAutoCluster =
    stmt(s"ALTER\\s+TABLE\\s+$T\\s+SET\\s+AUTOCLUSTER\\s+(\\d+)")
  private[lake] val UnsetAutoCluster =
    stmt(s"ALTER\\s+TABLE\\s+$T\\s+UNSET\\s+AUTOCLUSTER")
  // liquid-clustering DDL: record/change the spec as one metadata
  // commit; OPTIMIZE ... INCREMENTAL then clusters against it
  private[lake] val ClusterBy =
    rx(s"CLUSTER\\s+BY\\s*\\(([^)]+)\\)")
  private[lake] val DescribeDetail =
    stmt(s"DESC(?:RIBE)?\\s+DETAIL\\s+$T")
  private[lake] val DescribeHistory =
    stmt(s"DESC(?:RIBE)?\\s+HISTORY\\s+$T")
  private[lake] val ShowBranches = stmt(s"SHOW\\s+BRANCHES\\s+(?:IN\\s+|FROM\\s+)?$T")
  private[lake] val ShowTags = stmt(s"SHOW\\s+TAGS\\s+(?:IN\\s+|FROM\\s+)?$T")
  private[lake] val ShowConstraints =
    stmt(s"SHOW\\s+CONSTRAINTS\\s+(?:IN\\s+|FROM\\s+)?$T")
  // partition evolution (Iceberg REPLACE PARTITION FIELD semantics,
  // whole-spec form): greedy capture to the LAST ')' because specs
  // like bucket(4, id) nest parens and commas
  private[lake] val ReplacePartitionSpec =
    rx(s"REPLACE\\s+PARTITION\\s+SPEC\\s*\\((.+)\\)")
  private[lake] val ShowPartitionSpec =
    stmt(s"SHOW\\s+PARTITION\\s+SPEC\\s+(?:IN\\s+|FROM\\s+)?$T")

  /** Split a spec list on TOP-LEVEL commas only — `months(ts),
    * bucket(4, id)` is two specs, not three. */
  private[lake] def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.toSeq.filter(_.nonEmpty)
  }
}

private[lake] object SnapshotStatementTarget {

  /** Resolve a statement's table identifier to a storage path: a
    * single-part name through [[SnapshotCatalog]]'s registry, a
    * multi-part name through the session's catalog manager. */
  def pathOf(spark: SparkSession, ident: Seq[String]): String = ident match {
    case Seq(n) => SnapshotCatalog.pathOf(n).getOrElse(
      throw new IllegalArgumentException(
        s"'$n' is not a registered snapshot table (SnapshotCatalog.register)"))
    case parts =>
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case tc: TableCatalog =>
          tc.loadTable(Identifier.of(parts.slice(1, parts.size - 1).toArray,
              parts.last)) match {
            case g: GraftTable => g.path
            case other => throw new IllegalArgumentException(
              s"${ident.mkString(".")} is not a snapshot table: $other")
          }
        case other => throw new IllegalArgumentException(
          s"catalog '${parts.head}' is not a table catalog: $other")
      }
  }
}

/** Runnable ref-DDL command: resolves the table identifier to a
  * storage path (registered name or catalog table) and applies the
  * [[SnapshotTable]] ref operation. Returns the resulting version
  * (for drops: the head, unchanged). */
case class SnapshotRefDdlCommand(ident: Seq[String], op: String,
    ref: String, version: Option[Long], fromTag: Option[String],
    replace: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    val v: Long = op match {
      case "create_branch" =>
        SnapshotTable.createBranch(spark, path, ref, version, fromTag)
      case "drop_branch" =>
        SnapshotTable.dropBranch(spark, path, ref)
        SnapshotTable.latestVersion(spark, path).getOrElse(0L)
      case "create_tag" =>
        SnapshotTable.tag(spark, path, ref, version, replace)
      case "drop_tag" =>
        SnapshotTable.dropTag(spark, path, ref)
        SnapshotTable.latestVersion(spark, path).getOrElse(0L)
      case "fast_forward" =>
        SnapshotTable.fastForward(spark, path, ref)
      case "cherry_pick" =>
        SnapshotTable.cherryPick(spark, path, ref, version.get)
      case other => throw new IllegalStateException(s"unknown ref op: $other")
    }
    Seq(Row(v))
  }
}

/** Runnable RESTORE command (Delta's statement): `RESTORE [TABLE] t
  * TO VERSION AS OF <n | 'tag'>` / `TO TIMESTAMP AS OF '<ts>'` →
  * [[SnapshotTable.restore]]. A tag resolves to its pinned version; a
  * timestamp through the same commit-time resolution `TIMESTAMP AS
  * OF` reads use. Branch refs are refused — a branch head moves, so
  * "restore to it" has no stable meaning. Returns the NEW head
  * version (restore is itself a commit; history is never rewritten). */
case class SnapshotRestoreCommand(ident: Seq[String], version: Option[Long],
    tag: Option[String], timestamp: Option[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private def tsMillis(s: String): Long =
    s.trim.toLongOption.getOrElse {
      scala.util.Try(java.time.Instant.parse(s.trim).toEpochMilli).getOrElse(
        java.sql.Timestamp.valueOf(s.trim.replace('T', ' ')).getTime)
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    val target: Long = version
      .orElse(tag.map { r =>
        SnapshotTable.resolveRef(spark, path, r) match {
          case Some((_, Some(v))) => v
          case Some((_, None)) => throw new IllegalArgumentException(
            s"'$r' is a BRANCH of $path — branch heads move; restore to " +
              "a version or tag instead")
          case None => throw new IllegalArgumentException(
            s"no tag or branch '$r' at $path")
        }
      })
      .getOrElse(SnapshotCatalog.versionAsOf(spark, path,
        tsMillis(timestamp.get)))
    Seq(Row(SnapshotTable.restore(spark, path, target)))
  }
}

/** `VACUUM t [KEEP n VERSIONS] DRY RUN` (Delta's dry run): one row
  * per thing the real vacuum would reclaim — expired versions, data
  * files, DV files — deleting nothing. */
case class SnapshotVacuumDryRunCommand(ident: Seq[String],
    keepVersions: Int) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("kind", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("item", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    val (expired, dead, deadDv) =
      SnapshotTable.vacuumDryRun(spark, path, keepVersions = keepVersions)
    expired.map(v => Row("version", s"v$v")) ++
      dead.map(Row("data_file", _)) ++ deadDv.map(Row("dv_file", _))
  }
}

/** Runnable maintenance command: `VACUUM t [KEEP n VERSIONS]` →
  * [[SnapshotTable.vacuum]]; `OPTIMIZE t [FILES n | ZORDER BY
  * (c1, c2)]` → [[SnapshotTable.compact]] (the Delta statement
  * shapes). Returns the head version after the operation. */
case class SnapshotMaintenanceCommand(ident: Seq[String], op: String,
    keepVersions: Int = 1, numFiles: Int = 8,
    zorderCols: Seq[String] = Nil,
    whereSql: Option[String] = None) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    val v: Long = op match {
      case "vacuum" =>
        SnapshotTable.vacuum(spark, path, keepVersions = keepVersions)
        SnapshotTable.latestVersion(spark, path).getOrElse(0L)
      case "optimize" =>
        SnapshotTable.compact(spark, path, numFiles = numFiles,
          zorderCols = zorderCols,
          where = whereSql.map(org.apache.spark.sql.functions.expr))
      case "optimize_incremental" =>
        SnapshotTable.optimizeIncremental(spark, path,
          where = whereSql.map(org.apache.spark.sql.functions.expr))
      case "cluster_by" =>
        SnapshotTable.clusterBy(spark, path, zorderCols)
      case "truncate" =>
        SnapshotTable.truncate(spark, path)
      case other => throw new IllegalStateException(s"unknown maintenance op: $other")
    }
    Seq(Row(v))
  }
}

/** Commit-time policy DDL: `ALTER TABLE t SET AUTOCOMPACT n [ROWS r]`
  * → [[SnapshotTable.setAutoCompact]], `ALTER TABLE t SET AUTOCLUSTER
  * n` → [[SnapshotTable.setAutoCluster]]; `UNSET` passes 0 (both
  * policies treat non-positive as disable). One metadata commit
  * either way; returns the resulting version. */
case class SnapshotPolicyCommand(ident: Seq[String], policy: String,
    threshold: Int, rows: Option[Long]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    val v = policy match {
      case "autocompact" => rows match {
        case Some(r) => SnapshotTable.setAutoCompact(spark, path, threshold, r)
        case None    => SnapshotTable.setAutoCompact(spark, path, threshold)
      }
      case "autocluster" => SnapshotTable.setAutoCluster(spark, path, threshold)
      case other => throw new IllegalStateException(s"unknown policy: $other")
    }
    Seq(Row(v))
  }
}

/** `DESCRIBE DETAIL t` (Delta's statement): the one-row table detail
  * of [[SnapshotTable.describeDetail]] — format, location, version,
  * created/modified times, partition columns, numFiles, sizeInBytes,
  * numRows, properties, reader features — entirely from the cached
  * manifest (file sizes stat'ed tiered: driver below 64 files,
  * distributed above). */
/** `ALTER TABLE t ENABLE ROW TRACKING` — opt an existing table into
  * stable row ids ([[SnapshotTable.enableRowTracking]]: one metadata
  * commit assigning base ids to every live file from its footer row
  * count; idempotent). Returns the resulting table version. */
/** `CREATE TABLE <target> [SHALLOW|DEEP] CLONE <source> [VERSION AS
  * OF <n|'tag'>]` → [[SnapshotTable.shallowClone]] /
  * [[SnapshotTable.deepClone]]. The target must be a CATALOG name —
  * its storage path derives from the warehouse mapping; registry
  * names map to pre-existing paths only (use the API for those). The
  * cloned directory then IS the catalog table (a table is any
  * directory with a `_graft_log`). */
case class SnapshotCloneCommand(target: Seq[String], source: Seq[String],
    deep: Boolean, version: Option[Long], tag: Option[String])
  extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = SnapshotStatementTarget.pathOf(spark, source)
    val dstPath = target match {
      case Seq(n) => throw new IllegalArgumentException(
        s"CLONE target '$n' has no storage mapping — registry names point " +
          "at existing paths; clone to a catalog name (cat.ns.t) or call " +
          "shallowClone/deepClone with an explicit path")
      case parts =>
        spark.sessionState.catalogManager.catalog(parts.head) match {
          case gc: GraftCatalog =>
            gc.tablePath(Identifier.of(
              parts.slice(1, parts.size - 1).toArray, parts.last))
          case other => throw new IllegalArgumentException(
            s"catalog '${parts.head}' is not a GraftCatalog: $other")
        }
    }
    val v =
      if (deep) {
        val pin = tag match {
          case Some(t) => Some(SnapshotTable.tagVersion(spark, srcPath, t)
            .getOrElse(throw new IllegalArgumentException(
              s"no tag '$t' at $srcPath")))
          case None => version
        }
        SnapshotTable.deepClone(spark, srcPath, dstPath, pin)
      } else
        SnapshotTable.shallowClone(spark, srcPath, dstPath, version, tag)
    Seq(Row(v))
  }
}

case class SnapshotEnableRowTrackingCommand(ident: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    Seq(Row(SnapshotTable.enableRowTracking(spark, path)))
  }
}

case class SnapshotDescribeDetailCommand(ident: Seq[String])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.types.{ArrayType, MapType, TimestampType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("createdAt", TimestampType, nullable = false)(),
    AttributeReference("lastModified", TimestampType, nullable = false)(),
    AttributeReference("partitionColumns",
      ArrayType(StringType, containsNull = false), nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("sizeInBytes", LongType, nullable = false)(),
    AttributeReference("numRows", LongType, nullable = true)(),
    AttributeReference("properties",
      MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)(),
    AttributeReference("readerFeatures",
      ArrayType(StringType, containsNull = false), nullable = false)(),
    AttributeReference("writerFeatures",
      ArrayType(StringType, containsNull = false), nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    SnapshotTable.describeDetail(spark, path).collect().toSeq
  }
}

/** `DESCRIBE HISTORY t` (Delta's statement): one row per surviving
  * version, newest first — [[SnapshotTable.history]] (version,
  * operation, published_at, n_files, n_rows), read entirely from
  * cached manifests + version-file mtimes. */
case class SnapshotDescribeHistoryCommand(ident: Seq[String])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.types.{IntegerType, TimestampType}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)(),
    AttributeReference("published_at", TimestampType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    SnapshotTable.history(spark, path).collect().toSeq
  }
}

/** `SHOW BRANCHES [IN] t` / `SHOW TAGS [IN] t`: one row per ref —
  * (name, version), where a branch's version is its HEAD and a tag's
  * the pinned one (Iceberg `refs` metadata shape). */
case class SnapshotShowRefsCommand(ident: Seq[String], kind: String)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("name", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    kind match {
      case "branches" =>
        SnapshotTable.branches(spark, path).map { b =>
          Row(b, SnapshotTable.latestVersion(
            spark, SnapshotTable.branchHandle(path, b)).getOrElse(0L))
        }
      case _ =>
        SnapshotTable.tags(spark, path).toSeq.sortBy(_._1)
          .map { case (n, v) => Row(n, v) }
    }
  }
}

/** `SHOW CONSTRAINTS [IN] t`: one row per CHECK constraint —
  * (name, expr), name-sorted. ADD/DROP CONSTRAINT need no parser
  * support: Spark 4.1 parses them natively and
  * [[ResolveSnapshotRelation]] routes them to the snapshot table. */
case class SnapshotShowConstraintsCommand(ident: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("expr", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    SnapshotTable.checkConstraints(spark, path).toSeq.sortBy(_._1)
      .map { case (n, e) => Row(n, e) }
  }
}

/** `ALTER TABLE t REPLACE PARTITION SPEC (months(ts), bucket(4, id))`
  * → [[SnapshotTable.evolvePartitionTransforms]] — the SQL spelling
  * of partition evolution (Iceberg's REPLACE PARTITION FIELD
  * semantics, whole-spec form): a metadata-only commit; existing
  * files keep pruning under their retired era. Returns the commit
  * version. */
case class SnapshotEvolveSpecCommand(ident: Seq[String],
    specs: Seq[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    Seq(Row(SnapshotTable.evolvePartitionTransforms(spark, path, specs)))
  }
}

/** `SHOW PARTITION SPEC [IN] t`: one row per transform of the
  * CURRENT spec, in spec order. */
case class SnapshotShowSpecCommand(ident: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("position", LongType, nullable = false)(),
    AttributeReference("transform", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = SnapshotStatementTarget.pathOf(spark, ident)
    SnapshotTable.partitionTransforms(spark, path).zipWithIndex
      .map { case (s, i) => Row(i.toLong, s) }
  }
}
