package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN PARTITIONING for snapshot tables: the table
  * records a partition TRANSFORM (`days(ts)`, `bucket(16, id)`, ...)
  * and the engine derives the physical partition column on every
  * write — the user never materializes, names, or filters on a
  * partition column. Reads hide the derived column, and
  * [[SnapshotTable.readWhere]] projects row predicates on the SOURCE
  * column into partition predicates on the derived column (inclusive
  * projection), so `ts BETWEEN a AND b` prunes day directories
  * without the query mentioning them — the core usability win of
  * Iceberg's partition spec (spec.html#partition-transforms),
  * re-expressed over Spark's hive-layout writer: the transform is a
  * Column expression the optimizer constant-folds on the literal
  * side, so pruning rides Spark's own partition-filter path.
  *
  * The derived column is prefixed `__p_` (reserved, rejected in user
  * schemas) and lives only in directory names — data files never
  * store it, readers drop it, and every write path re-derives it from
  * the source column (so an UPDATE that moves a row across partition
  * boundaries just works).
  */
sealed trait PartitionTransform {
  /** source (user-visible) column the transform derives from */
  def src: String
  /** canonical serialized form, e.g. `days(ts)` */
  def spec: String
  /** derived physical partition column name */
  def pcol: String
  /** hidden columns are dropped from reads; identity is not hidden */
  def hidden: Boolean = true
  /** write-side derivation; `dt` is the source column's type */
  def derive(c: Column, dt: DataType): Column
  /** order-preserving wrt the source ordering: range predicates on
    * `src` project to range predicates on `pcol` */
  def monotonic: Boolean
}

/** `days(ts)`: UTC day truncation to a DateType partition value. */
case class DaysTransform(src: String) extends PartitionTransform {
  val spec = s"days($src)"
  val pcol = s"__p_${src}_day"
  def derive(c: Column, dt: DataType): Column = to_date(date_trunc("DAY", c))
  val monotonic = true
}

/** `hours(ts)`: zero-padded `yyyy-MM-dd-HH` string (lexicographic
  * order = chronological order, so range projection holds). */
case class HoursTransform(src: String) extends PartitionTransform {
  val spec = s"hours($src)"
  val pcol = s"__p_${src}_hour"
  def derive(c: Column, dt: DataType): Column =
    date_format(date_trunc("HOUR", c), "yyyy-MM-dd-HH")
  val monotonic = true
}

/** `months(ts)`: `yyyy-MM` string. */
case class MonthsTransform(src: String) extends PartitionTransform {
  val spec = s"months($src)"
  val pcol = s"__p_${src}_month"
  def derive(c: Column, dt: DataType): Column =
    date_format(date_trunc("MONTH", c), "yyyy-MM")
  val monotonic = true
}

/** `years(ts)`: `yyyy` string. */
case class YearsTransform(src: String) extends PartitionTransform {
  val spec = s"years($src)"
  val pcol = s"__p_${src}_year"
  def derive(c: Column, dt: DataType): Column =
    date_format(date_trunc("YEAR", c), "yyyy")
  val monotonic = true
}

/** `bucket(n, col)`: Murmur3 hash mod n. Not order-preserving — only
  * equality/IN predicates project. The hash is Spark's own `hash()`
  * (a deterministic, constant-foldable expression), so the read-side
  * projection folds to a literal bucket number and prunes. */
case class BucketTransform(n: Int, src: String) extends PartitionTransform {
  require(n > 0, s"bucket($n, $src): bucket count must be positive")
  val spec = s"bucket($n, $src)"
  val pcol = s"__p_${src}_bucket"
  def derive(c: Column, dt: DataType): Column = pmod(hash(c), lit(n))
  val monotonic = false
}

/** `truncate(w, col)`: width-`w` prefix for strings, floor-to-multiple
  * for integral types. Both are order-preserving. */
case class TruncateTransform(w: Int, src: String) extends PartitionTransform {
  require(w > 0, s"truncate($w, $src): width must be positive")
  val spec = s"truncate($w, $src)"
  val pcol = s"__p_${src}_trunc"
  def derive(c: Column, dt: DataType): Column = dt match {
    case StringType => substring(c, 1, w)
    case ByteType | ShortType | IntegerType | LongType => c - pmod(c, lit(w))
    case other => throw new IllegalArgumentException(
      s"truncate($w, $src): unsupported source type ${other.simpleString} " +
        "(string and integral types only)")
  }
  val monotonic = true
}

/** `identity(col)`: plain hive partitioning on a user column, kept
  * visible — lets one spec mix hidden and explicit partitioning. */
case class IdentityTransform(src: String) extends PartitionTransform {
  val spec = s"identity($src)"
  val pcol = src
  override val hidden = false
  def derive(c: Column, dt: DataType): Column = c
  val monotonic = true
}

object PartitionTransform {

  private val Fn1 = """(\w+)\(\s*([^,()\s]+)\s*\)""".r
  private val Fn2 = """(\w+)\(\s*(\d+)\s*,\s*([^,()\s]+)\s*\)""".r

  /** Parse a transform spec. A bare column name is identity. */
  def parse(spec: String): PartitionTransform = spec.trim match {
    case Fn1("days", c)        => DaysTransform(c)
    case Fn1("hours", c)       => HoursTransform(c)
    case Fn1("months", c)      => MonthsTransform(c)
    case Fn1("years", c)       => YearsTransform(c)
    case Fn1("identity", c)    => IdentityTransform(c)
    case Fn2("bucket", n, c)   => BucketTransform(n.toInt, c)
    case Fn2("truncate", w, c) => TruncateTransform(w.toInt, c)
    case bare if bare.nonEmpty && !bare.contains("(") => IdentityTransform(bare)
    case other => throw new IllegalArgumentException(
      s"unparseable partition transform '$other' — expected days|hours|months|" +
        "years|identity(col), bucket(n, col), truncate(w, col), or a bare column")
  }

  /** Manifest-header codec (`#ptransforms=`): URL-encode each spec so
    * no raw tab appears, tab-join. */
  def encode(ts: Seq[PartitionTransform]): String =
    ts.map(t => java.net.URLEncoder.encode(t.spec, "UTF-8")).mkString("\t")

  def decode(s: String): Seq[PartitionTransform] =
    s.split("\t", -1).filter(_.nonEmpty).toSeq
      .map(t => parse(java.net.URLDecoder.decode(t, "UTF-8")))

  /** Derive (or re-derive) every transform's partition column on a
    * write-bound frame. ALL hidden (`__p_`) columns are dropped first
    * — including retired ones a rewrite read back from an old-era
    * layout — and the current spec's are recomputed from the source
    * column, so a rewrite whose SET moved a row's source value
    * re-partitions the row correctly and a rewrite on an evolved
    * table migrates rows to the current layout. */
  def apply(df: org.apache.spark.sql.DataFrame,
      ts: Seq[PartitionTransform]): org.apache.spark.sql.DataFrame = {
    val dropped = df.drop(df.columns.filter(_.startsWith("__p_")).toSeq: _*)
    ts.filter(_.hidden).foldLeft(dropped) { (d, t) =>
      val f = d.schema.fields.find(_.name.equalsIgnoreCase(t.src)).getOrElse(
        throw new IllegalArgumentException(
          s"partition transform ${t.spec}: source column '${t.src}' missing " +
            s"from the incoming data (columns: ${d.columns.mkString(", ")})"))
      d.withColumn(t.pcol, t.derive(col(f.name), f.dataType))
    }
  }

  /** INCLUSIVE PROJECTION of a row predicate onto the derived
    * partition columns (Iceberg's `Projections.inclusive`): returns a
    * partition predicate that is true for every partition that COULD
    * contain a matching row, and `lit(true)` where nothing projects.
    * Conjoining it with the original predicate is therefore always
    * semantics-preserving — it only enables directory pruning.
    *
    * `cond` must be an ANALYZED condition (the caller resolves the
    * user predicate against the table frame first): Spark 4 Columns
    * are ColumnNode trees whose raw conversion yields opaque
    * UnresolvedFunction nodes, whereas the analyzed form is plain
    * catalyst `And`/`GreaterThanOrEqual`/... with analyzer-inserted
    * casts — which is also what makes `ts >= '2024-01-02'` (a string
    * literal against a timestamp column) project correctly.
    *
    * Projected shapes: `src (=|<|<=|>|>=) foldable` (both operand
    * orders), `src IN (foldables)`, AND/OR combinations. Range shapes
    * need a monotonic transform; bucket projects equality/IN only.
    * The foldable side is re-expressed as `derive(foldable)` — still
    * foldable, so Catalyst collapses it to a literal before partition
    * pruning runs. */
  def translate(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      ts: Seq[PartitionTransform]): Column = {
    import org.apache.spark.sql.catalyst.expressions._

    val hiddenTs = ts.filter(_.hidden)
    if (hiddenTs.isEmpty) return lit(true)

    def attr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    def forSrc(n: String): Seq[PartitionTransform] =
      hiddenTs.filter(_.src.equalsIgnoreCase(n))
    def derived(t: PartitionTransform, a: AttributeReference,
        l: Expression): Column =
      t.derive(ColumnBridge.column(l), a.dataType)

    // NULL-safe: a NULL partition value (NULL source values, or rows
    // written under a DIFFERENT spec era that never had this column)
    // must never be pruned — the projection is inclusive, and a
    // retired-era file's rows surface the current spec's __p column
    // as NULL
    def nullSafe(t: PartitionTransform, c: Column): Column =
      c || col(t.pcol).isNull
    def eqProj(a: AttributeReference, l: Expression): Option[Column] =
      forSrc(a.name).map(t => nullSafe(t, col(t.pcol) === derived(t, a, l)))
        .reduceOption(_ && _)
    def rangeProj(a: AttributeReference, l: Expression,
        upper: Boolean): Option[Column] =
      forSrc(a.name).filter(_.monotonic)
        .map(t => nullSafe(t,
          if (upper) col(t.pcol) <= derived(t, a, l)
          else col(t.pcol) >= derived(t, a, l)))
        .reduceOption(_ && _)
    def inProj(a: AttributeReference, ls: Seq[Expression]): Option[Column] =
      forSrc(a.name).map(t => nullSafe(t,
          ls.map(l => col(t.pcol) === derived(t, a, l)).reduce(_ || _)))
        .reduceOption(_ && _)

    def proj(e: Expression): Option[Column] = e match {
      // AND: either side's projection alone is still inclusive
      case And(l, r) => (proj(l), proj(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b)             => a.orElse(b)
      }
      // OR: both sides must project, else nothing prunes
      case Or(l, r) => for (a <- proj(l); b <- proj(r)) yield a || b
      case EqualTo(a, l) if attr(a).isDefined && l.foldable => eqProj(attr(a).get, l)
      case EqualTo(l, a) if attr(a).isDefined && l.foldable => eqProj(attr(a).get, l)
      case LessThan(a, l) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = true)
      case LessThanOrEqual(a, l) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = true)
      case GreaterThan(a, l) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = false)
      case GreaterThanOrEqual(a, l) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = false)
      case LessThan(l, a) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = false)
      case LessThanOrEqual(l, a) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = false)
      case GreaterThan(l, a) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = true)
      case GreaterThanOrEqual(l, a) if attr(a).isDefined && l.foldable =>
        rangeProj(attr(a).get, l, upper = true)
      case In(a, ls) if attr(a).isDefined && ls.nonEmpty && ls.forall(_.foldable) =>
        inProj(attr(a).get, ls)
      case _ => None
    }

    proj(cond).getOrElse(lit(true))
  }
}
