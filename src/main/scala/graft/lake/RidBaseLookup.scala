package graft.lake

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-file rid-base lookup: `_metadata.file_path` → the
  * file's row-id base, evaluated INSIDE whole-stage codegen as an
  * xxhash64 + binary search over two broadcast-free driver arrays —
  * no join in the plan at all.
  *
  * This is the tracked-read hot path ([[SnapshotTable.readWithRowIds]]
  * and every rewrite's id-inheritance read), so the formulation was
  * measured (1M rows, same run, min-of-4, vs a plain read at 0.11s):
  * string-keyed BroadcastHashJoin 0.34s (hashes AND carries the
  * ~100-char path through the join buffers), suffix-50 string join
  * 0.47s, per-file literal unions 0.60s (loses whole-stage fusion),
  * long-key BHJ over xxhash64 0.16s, THIS expression 0.10s — i.e.
  * at parity with the plain scan; a last-file identity cache
  * measured 0.08s but assumes column-vector buffer identity across
  * batches (a silent-staleness hazard if Spark ever reuses buffers
  * across files), so the exact per-row form ships.
  *
  * Collision safety needs no per-row verification: the scan reads
  * exactly the manifest's files, so a probe row's true path is
  * always IN the key set; the caller checks driver-side that the
  * hashed keys are pairwise distinct (else it takes the probe-join
  * fallback), and then a hash match can only be the right file. A
  * MISS returns null — the caller's raise_error net turns that into
  * a loud failure instead of silent null ids. Both sides hash with
  * [[RidBaseLookup.hash]], so driver and executor can never drift.
  *
  * `keys` must be sorted ascending with `bases` aligned.
  */
private[lake] case class RidBaseLookup(child: Expression,
    keys: Array[Long], bases: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  protected override def nullSafeEval(input: Any): Any = {
    val i = java.util.Arrays.binarySearch(keys,
      RidBaseLookup.hash(input.asInstanceOf[UTF8String]))
    if (i < 0) null else bases(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("ridKeys", keys, "long[]")
    val basesRef = ctx.addReferenceObj("ridBases", bases, "long[]")
    val idx = ctx.freshName("ridIdx")
    nullSafeCodeGen(ctx, ev, c => s"""
      int $idx = java.util.Arrays.binarySearch($keysRef,
        graft.lake.RidBaseLookup.hash($c));
      ${ev.isNull} = $idx < 0;
      ${ev.value} = $idx < 0 ? 0L : $basesRef[$idx];
    """)
  }
}

private[lake] object RidBaseLookup {
  /** xxhash64 (seed 42) of the string's raw bytes — called from both
    * the driver (key building) and generated code (probe side). */
  def hash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  def hash(s: String): Long = hash(UTF8String.fromString(s))
}
