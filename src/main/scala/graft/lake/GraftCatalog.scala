package graft.lake

import java.util.{Collections, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableCatalog` over snapshot tables — the no-
  * `register()` front door:
  *
  *   spark.sql.catalog.graft            = graft.lake.GraftCatalog
  *   spark.sql.catalog.graft.warehouse  = /lake/warehouse
  *
  *   CREATE NAMESPACE graft.gold;
  *   CREATE TABLE graft.gold.fact (id BIGINT, ts TIMESTAMP, v DOUBLE)
  *     USING graft-snapshot PARTITIONED BY (days(ts));
  *   INSERT INTO graft.gold.fact SELECT ...;
  *   SELECT * FROM graft.gold.fact VERSION AS OF 2;
  *   MERGE INTO graft.gold.fact t USING updates s ON t.id = s.id ...;
  *
  * The catalog maps `graft.ns….name` to the directory
  * `<warehouse>/ns…/name`; a table is any directory with a
  * `_graft_log`. DDL goes through this class; reads and row-level DML
  * are rewritten by [[ResolveSnapshotRelation]] onto the native
  * snapshot read/command plans (full manifest pruning, DVs, hidden
  * partitioning), and INSERT/CTAS write through the V1 write fallback
  * ([[GraftTable.newWriteBuilder]]) into [[SnapshotTable.append]] /
  * [[SnapshotTable.overwrite]] — so every SQL path funnels into the
  * same commit protocol as the programmatic API. Mirrors the Iceberg
  * `SparkCatalog` shape (reference jobs/ev_sessions_gold_etl.py
  * configures exactly such a catalog for its gold table).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def hfs(p: String) = new Path(p).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"GraftCatalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // accept `DEFAULT <expr>` in column DDL (initial defaults) and
  // `GENERATED ALWAYS AS (expr)` in CREATE TABLE — without these
  // capabilities the analyzer rejects the clauses before the catalog
  // ever sees them; the generation expression arrives as
  // GENERATION_EXPRESSION field metadata inside the schema and is
  // validated + enforced by SnapshotTable (create/commit)
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def dirOf(ns: Seq[String]): String = (warehouse +: ns).mkString("/")

  /** A table is a directory with a snapshot log. */
  private def isTable(dir: String): Boolean =
    hfs(dir).exists(new Path(SnapshotTable.logDir(dir)))

  def tablePath(ident: Identifier): String =
    dirOf(ident.namespace.toSeq) + "/" + ident.name

  // ---- tables ------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toSeq)
    val f = hfs(dir)
    if (!f.exists(new Path(dir))) throw new NoSuchNamespaceException(namespace)
    f.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(dir + "/" + n))
      .map(n => Identifier.of(namespace, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val path = tablePath(ident)
    if (isTable(path)) GraftTable(ident.toString, path)
    else metadataTable(ident).getOrElse(throw new NoSuchTableException(ident))
  }

  /** `SELECT * FROM graft.ns.t.history / .files / .partitions` —
    * Iceberg's inspection-table surface: the metadata name arrives as
    * a table identifier one level BELOW the real table. */
  private def metadataTable(ident: Identifier): Option[Table] = {
    val parent = dirOf(ident.namespace.toSeq)
    if (GraftTable.metaKinds(ident.name.toLowerCase) && isTable(parent))
      Some(GraftTable(ident.toString, parent,
        metaKind = Some(ident.name.toLowerCase)))
    else None
  }

  /** Time travel: `VERSION AS OF <n | 'tag' | 'branch'>` — a
    * non-numeric version is an Iceberg-style ref: a tag pins a main
    * version, a branch name reads the branch head. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    version.toLongOption match {
      case Some(v) => GraftTable(ident.toString, path, pinnedVersion = Some(v))
      case None =>
        val (h, v) = SnapshotTable.resolveRef(spark, path, version).getOrElse(
          throw new IllegalArgumentException(
            s"no tag or branch '$version' at $path"))
        GraftTable(ident.toString, h, pinnedVersion = v,
          // a branch ref pins no version (it reads the branch HEAD)
          // but came through versioned loadTable, so the read-only
          // invariant must hold structurally, not by unreachability
          readOnly = v.isEmpty)
    }
  }

  /** Time travel: `TIMESTAMP AS OF` — `timestamp` is epoch MICROS. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    GraftTable(ident.toString, path, pinnedVersion =
      Some(SnapshotCatalog.versionAsOf(spark, path, timestamp / 1000L)))
  }

  /** The v2-Column entry point Spark's CREATE TABLE actually calls:
    * the default bridge to the StructType overload DROPS the
    * generation expression, so re-encode it here as
    * GENERATION_EXPRESSION field metadata — the slot the manifest
    * schema round-trips and SnapshotTable.create/commit enforce. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}
    val withGen = StructType(columns.map { c =>
      val mb = new MetadataBuilder()
      Option(c.metadataInJSON()).foreach(j => mb.withMetadata(Metadata.fromJson(j)))
      Option(c.comment()).foreach(mb.putString("comment", _))
      // the same CURRENT/EXISTS default bridge Spark's StructType
      // conversion performs (constant-folded below in the schema path)
      Option(c.defaultValue()).foreach { d =>
        mb.putString(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
          d.getSql())
        mb.putString(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY,
          d.getSql())
      }
      Option(c.generationExpression()).foreach(e =>
        mb.putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
          .GENERATION_EXPRESSION_METADATA_KEY, e))
      Option(c.identityColumnSpec()).foreach { s =>
        val ic = org.apache.spark.sql.catalyst.util.IdentityColumn
        mb.putLong(ic.IDENTITY_INFO_START, s.getStart)
        mb.putLong(ic.IDENTITY_INFO_STEP, s.getStep)
        mb.putBoolean(ic.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
          s.isAllowExplicitInsert)
      }
      StructField(c.name(), c.dataType(), c.nullable(), mb.build())
    })
    createTable(ident, withGen, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val path = Option(properties.get(TableCatalog.PROP_LOCATION))
      .getOrElse(tablePath(ident))
    if (isTable(path)) throw new TableAlreadyExistsException(ident)
    // CREATE TABLE (... DEFAULT <expr>): the analyzer hands the
    // default as CURRENT_DEFAULT field metadata — constant-fold it
    // into the EXISTS_DEFAULT the read path serves (a later insert
    // that omits the column then reads the default, the same
    // file-absence semantics as ADD COLUMN ... DEFAULT)
    val withDefaults = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .constantFoldCurrentDefaultsToExistDefaults(schema, "CREATE TABLE")
    val rowTracking = Option(properties.get(GraftCatalog.RowTrackingProp))
      .exists { v =>
        require(v.equalsIgnoreCase("true"),
          s"${GraftCatalog.RowTrackingProp} accepts only 'true' " +
            "(row tracking is one-way)")
        true
      }
    // CREATE TABLE ... CLUSTER BY (a, b): Spark 4 hands the clause as
    // a ClusterByTransform inside the partitioning array — record it
    // as the table's clustering spec (liquid clustering at create; no
    // data exists yet, OPTIMIZE INCREMENTAL clusters as files arrive)
    val (clusterTs, partTs) = partitions.toSeq
      .partition(_.name.equalsIgnoreCase("cluster_by"))
    val clusterCols = clusterTs.flatMap(_.arguments.toSeq.collect {
      case r: NamedReference =>
        require(r.fieldNames.length == 1,
          "nested CLUSTER BY columns are not supported")
        r.fieldNames.head
    })
    SnapshotTable.create(spark, path, withDefaults,
      partTs.map(GraftCatalog.specOf), rowTracking = rowTracking,
      clusterCols = clusterCols)
    GraftTable(ident.toString, path)
  }

  /** One ALTER TABLE statement = ONE manifest commit: every change is
    * compiled to a `Manifest => Manifest` mutation and the composed
    * function publishes atomically through the CAS — a mid-sequence
    * validation failure (e.g. a rename refused by a CHECK-constraint
    * reference) leaves NOTHING committed, where per-change commits
    * would report the statement failed after half of it had already
    * published. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!isTable(path)) throw new NoSuchTableException(ident)
    // feature toggles via SET/UNSET TBLPROPERTIES — the two
    // ALTER-able graft features; any OTHER property has no manifest
    // slot, and accept-and-ignore would silently drop user intent
    val featureProps = Set(GraftCatalog.BloomColsProp,
      GraftCatalog.AutoCompactProp, GraftCatalog.RowTrackingProp)
    val mutations: Seq[(String, SnapshotTable.Manifest => SnapshotTable.Manifest)] =
      changes.toSeq.map {
        case p: TableChange.SetProperty if featureProps(p.property) =>
          p.property match {
            case GraftCatalog.BloomColsProp =>
              "setBloomCols" -> SnapshotTable.setBloomColumnsMutation(
                p.value.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            case GraftCatalog.AutoCompactProp =>
              "setAutoCompact" -> (p.value.split(",").map(_.trim) match {
                case Array(n) =>
                  SnapshotTable.setAutoCompactMutation(n.toInt, 100000L)
                case Array(n, r) =>
                  SnapshotTable.setAutoCompactMutation(n.toInt, r.toLong)
                case _ => throw new IllegalArgumentException(
                  s"${GraftCatalog.AutoCompactProp} expects " +
                    s"'minSmallFiles[,smallFileRows]', got '${p.value}'")
              })
            case GraftCatalog.RowTrackingProp =>
              require(p.value.equalsIgnoreCase("true"),
                s"${GraftCatalog.RowTrackingProp} accepts only 'true' " +
                  "(row tracking is one-way)")
              "enableRowTracking" -> SnapshotTable.enableRowTrackingMutation(path)
          }
        case p: TableChange.RemoveProperty if featureProps(p.property) =>
          p.property match {
            case GraftCatalog.BloomColsProp =>
              "setBloomCols" -> SnapshotTable.setBloomColumnsMutation(Nil)
            case GraftCatalog.AutoCompactProp =>
              "setAutoCompact" -> SnapshotTable.setAutoCompactMutation(0, 0L)
            case GraftCatalog.RowTrackingProp =>
              throw new IllegalArgumentException(
                "row tracking cannot be disabled: assigned ids are baked " +
                  "into manifests and rewritten files")
          }
        case a: TableChange.AddColumn =>
          require(a.fieldNames.length == 1, "nested ADD COLUMN is not supported")
          // DEFAULT <expr> → initial default (Iceberg v3 shape): the
          // validated metadata-carrying field comes from the same
          // helper the API path uses
          val field = org.apache.spark.sql.types.StructField(
            a.fieldNames.head, a.dataType, nullable = true)
          val fields = Option(a.defaultValue()) match {
            case None => Seq(field)
            case Some(d) => SnapshotTable.fieldsWithInitialDefaults(spark,
              Seq(field), Map(field.name -> d.getSql))
          }
          "addColumns" -> SnapshotTable.addColumnsMutation(path, fields)
        case r: TableChange.RenameColumn =>
          require(r.fieldNames.length == 1, "nested RENAME COLUMN is not supported")
          "renameColumn" -> SnapshotTable.renameColumnMutation(spark, path,
            r.fieldNames.head, r.newName)
        case u: TableChange.UpdateColumnType =>
          require(u.fieldNames.length == 1, "nested ALTER COLUMN is not supported")
          "widenColumn" -> SnapshotTable.widenColumnMutation(path,
            u.fieldNames.head, u.newDataType)
        case d: TableChange.DeleteColumn =>
          require(d.fieldNames.length == 1, "nested DROP COLUMN is not supported")
          "dropColumn" -> SnapshotTable.dropColumnMutation(spark, path,
            d.fieldNames.head)
        case cb: TableChange.ClusterBy =>
          "clusterBy" -> SnapshotTable.clusterByMutation(path,
            cb.clusteringColumns().toSeq.map { r =>
              require(r.fieldNames.length == 1,
                "nested CLUSTER BY columns are not supported")
              r.fieldNames.head
            })
        case pos: TableChange.UpdateColumnPosition =>
          require(pos.fieldNames.length == 1,
            "nested ALTER COLUMN is not supported")
          val after = pos.position() match {
            case _: TableChange.First => None
            case a: TableChange.After => Some(a.column())
            case other => throw new IllegalArgumentException(
              s"unsupported column position: $other")
          }
          "reorderColumn" -> SnapshotTable.reorderColumnMutation(path,
            pos.fieldNames.head, after)
        case other => throw new IllegalArgumentException(
          "GraftCatalog supports ALTER TABLE ... ADD COLUMNS / RENAME COLUMN / " +
            "DROP COLUMN / ALTER COLUMN ... TYPE (lossless widening) / " +
            "ALTER COLUMN ... FIRST|AFTER (metadata-only reorder) / " +
            s"SET|UNSET TBLPROPERTIES(${featureProps.mkString(", ")}) only; " +
            s"got: ${other.getClass.getSimpleName}")
      }
    if (mutations.nonEmpty) {
      val op = mutations.map(_._1).distinct match {
        case Seq(single) => single
        case _           => "alterTable"
      }
      SnapshotTable.publishMetadataCommit(spark, path, op)(
        mutations.map(_._2).reduce(_ andThen _))
    }
    GraftTable(ident.toString, path)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    if (!isTable(path)) false
    else hfs(path).delete(new Path(path), true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tablePath(from)
    val dst = tablePath(to)
    if (!isTable(src)) throw new NoSuchTableException(from)
    if (isTable(dst)) throw new TableAlreadyExistsException(to)
    val f = hfs(src)
    require(f.exists(new Path(dirOf(to.namespace.toSeq))),
      s"target namespace ${to.namespace.mkString(".")} does not exist")
    require(f.rename(new Path(src), new Path(dst)),
      s"rename $src -> $dst failed")
    // manifests record absolute paths — re-anchor them at the new home
    SnapshotTable.relocate(spark, dst, src)
  }

  // ---- namespaces --------------------------------------------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirOf(namespace.toSeq)
    val f = hfs(dir)
    if (!f.exists(new Path(dir))) throw new NoSuchNamespaceException(namespace)
    f.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => !isTable(dir + "/" + n))
      .map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = dirOf(namespace.toSeq)
    namespace.isEmpty || (hfs(dir).exists(new Path(dir)) && !isTable(dir))
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Collections.singletonMap(SupportsNamespaces.PROP_LOCATION,
      dirOf(namespace.toSeq))
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val dir = dirOf(namespace.toSeq)
    val f = hfs(dir)
    require(!f.exists(new Path(dir)),
      s"namespace ${namespace.mkString(".")} already exists")
    f.mkdirs(new Path(dir)); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    require(namespace.nonEmpty, "cannot drop the root namespace")
    val dir = dirOf(namespace.toSeq)
    val f = hfs(dir)
    if (!f.exists(new Path(dir))) false
    else {
      if (!cascade)
        require(f.listStatus(new Path(dir)).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
      f.delete(new Path(dir), true)
    }
  }
}

object GraftCatalog {

  /** SET TBLPROPERTIES key for per-file bloom columns (CSV). */
  val BloomColsProp = "graft.bloomFilterColumns"
  /** SET TBLPROPERTIES key for commit-time auto-compaction:
    * `minSmallFiles[,smallFileRows]`; UNSET disables. */
  val AutoCompactProp = "graft.autoCompact"
  /** TBLPROPERTIES key opting a table into row tracking — at CREATE
    * TABLE or via SET TBLPROPERTIES (one-way: ids are baked into
    * manifests and rewritten files, so UNSET is refused). */
  val RowTrackingProp = "graft.rowTracking"

  /** DSv2 partition `Transform` → the snapshot spec grammar
    * ([[PartitionTransform.parse]]). Literal/reference argument order
    * is accepted either way (`truncate(4, c)` and `truncate(c, 4)`
    * both parse in Spark SQL). */
  private[lake] def specOf(t: Transform): String = {
    def refOf(args: Seq[AnyRef]): String = {
      val refs = args.collect { case r: NamedReference => r }
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"partition transform ${t.describe} must reference exactly one " +
          "top-level column")
      refs.head.fieldNames.head
    }
    def litOf(args: Seq[AnyRef]): Int = args.collectFirst {
      case l: V2Literal[_] => l.value match {
        case i: java.lang.Integer => i.intValue
        case l2: java.lang.Long   => l2.intValue
        case other => throw new IllegalArgumentException(
          s"partition transform ${t.describe}: non-integer argument $other")
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"partition transform ${t.describe} needs an integer argument"))
    val args = t.arguments.toSeq
    t.name.toLowerCase match {
      case "identity"                           => s"identity(${refOf(args)})"
      case n @ ("years" | "months" | "days" | "hours") => s"$n(${refOf(args)})"
      // Spark's parser also emits singular forms (year(ts), day(ts))
      case "year"  => s"years(${refOf(args)})"
      case "month" => s"months(${refOf(args)})"
      case "day"   => s"days(${refOf(args)})"
      case "hour"  => s"hours(${refOf(args)})"
      case "bucket"   => s"bucket(${litOf(args)}, ${refOf(args)})"
      case "truncate" => s"truncate(${litOf(args)}, ${refOf(args)})"
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' — supported: identity, " +
          "years, months, days, hours, bucket(n, col), truncate(w, col)")
    }
  }

  /** Snapshot spec string → DSv2 `Transform` (for `Table.partitioning`
    * / DESCRIBE output). */
  private[lake] def v2Of(spec: String): Transform =
    PartitionTransform.parse(spec) match {
      case DaysTransform(c)        => Expressions.days(c)
      case HoursTransform(c)       => Expressions.hours(c)
      case MonthsTransform(c)      => Expressions.months(c)
      case YearsTransform(c)       => Expressions.years(c)
      case IdentityTransform(c)    => Expressions.identity(c)
      case BucketTransform(n, c)   => Expressions.bucket(n, c)
      case TruncateTransform(w, c) =>
        Expressions.apply("truncate", Expressions.literal(w), Expressions.column(c))
    }
}

/** Catalog-resolved snapshot table. Reads are substituted onto the
  * native snapshot plan by [[ResolveSnapshotRelation]] (so this class
  * deliberately does NOT implement SupportsRead — a read that somehow
  * bypassed the rule fails analysis loudly instead of scanning
  * wrongly); writes go through the V1 fallback into the commit
  * protocol. `pinnedVersion` marks a time-travel read; `metaKind`
  * marks a history/files/partitions inspection table; `readOnly`
  * marks a branch-head time-travel resolution (VERSION AS OF
  * '<branch>'), which pins no version but must stay write-blocked
  * like every other versioned loadTable. */
case class GraftTable(identName: String, path: String,
    pinnedVersion: Option[Long] = None, metaKind: Option[String] = None,
    readOnly: Boolean = false)
  extends Table with SupportsWrite with SupportsMetadataColumns
  with TruncatableTable {

  /** `TRUNCATE TABLE cat.ns.t` → one metadata-only commit referencing
    * zero files ([[SnapshotTable.truncate]]); O(1) at any size. */
  override def truncateTable(): Boolean = {
    require(metaKind.isEmpty && pinnedVersion.isEmpty && !readOnly,
      s"TRUNCATE target $identName is not a writable snapshot table head")
    SnapshotTable.truncate(spark, path)
    true
  }

  private def spark = SparkSession.active

  override def name(): String = identName

  /** The metadata frame for a `metaKind` table. */
  private[lake] def metaFrame: org.apache.spark.sql.DataFrame = metaKind match {
    case Some("history")    => SnapshotTable.history(spark, path)
    case Some("files")      => SnapshotTable.filesMetadata(spark, path)
    case Some("partitions") => SnapshotTable.partitionsMetadata(spark, path)
    case other => throw new IllegalStateException(s"not a metadata table: $other")
  }

  override def schema(): StructType = metaKind match {
    case Some(_) => metaFrame.schema
    case None =>
      SnapshotTable.schemaOf(spark, path, pinnedVersion)
        .map(s => StructType(s.fields.filterNot(_.name.startsWith("__p_"))))
        .getOrElse(SnapshotTable.read(spark, path, pinnedVersion).schema)
  }

  override def partitioning(): Array[Transform] =
    if (metaKind.isDefined) Array.empty
    else SnapshotTable.partitionTransforms(spark, path)
      .map(GraftCatalog.v2Of).toArray

  /** Row tracking surfaces in SQL as a `_row_id` METADATA column
    * (Delta's row-tracking read shape): excluded from `SELECT *`,
    * served only when referenced — the analyzer's AddMetadataColumns
    * injects it into the relation output and
    * [[ResolveSnapshotRelation]] then substitutes the
    * readWithRowIds/readWhereWithRowIds plan instead of the plain
    * read. Exposed only while the table has row tracking enabled. */
  override def metadataColumns(): Array[MetadataColumn] =
    if (metaKind.isEmpty &&
        SnapshotTable.latestVersion(spark, path).nonEmpty &&
        SnapshotTable.rowTrackingEnabled(spark, path))
      Array(new MetadataColumn {
        override def name(): String = SnapshotTable.RowIdCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = true
        override def comment(): String =
          "stable row id (graft row tracking)"
      })
    else Array.empty

  override def properties(): JMap[String, String] = {
    // the two ALTER-able feature toggles surface so SHOW TBLPROPERTIES
    // reflects what SET TBLPROPERTIES configured
    val feature: Map[String, String] =
      if (metaKind.isDefined || SnapshotTable.latestVersion(spark, path).isEmpty)
        Map.empty
      else {
        val bloom = SnapshotTable.bloomColumns(spark, path)
        val ac = SnapshotTable.autoCompactPolicy(spark, path)
        (if (bloom.nonEmpty)
          Map(GraftCatalog.BloomColsProp -> bloom.mkString(","))
        else Map.empty[String, String]) ++
          ac.map { case (n, r) =>
            GraftCatalog.AutoCompactProp -> s"$n,$r" }.toMap ++
          (if (SnapshotTable.rowTrackingEnabled(spark, path))
            Map(GraftCatalog.RowTrackingProp -> "true")
          else Map.empty[String, String])
      }
    (Map(TableCatalog.PROP_PROVIDER -> "graft-snapshot",
      TableCatalog.PROP_LOCATION -> path) ++ feature).asJava
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(metaKind.isEmpty, s"metadata table $identName is read-only")
    require(pinnedVersion.isEmpty,
      s"cannot write to time-travel read $identName@v${pinnedVersion.get}")
    require(!readOnly,
      s"cannot write to versioned (branch-ref) read $identName — " +
        "write through the branch handle instead")
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              if (truncateFirst || overwrite) SnapshotTable.overwrite(data, path)
              else SnapshotTable.append(data, path)
              ()
            }
          }
      }
    }
  }
}

object GraftTable {
  private[lake] val metaKinds = Set("history", "files", "partitions")
}
