package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.SnapshotTable.{Entry, entryDiff, multisetDiff}

/** The delta-publish diff contract, mechanically: whatever path
  * [[SnapshotTable.entryDiff]] takes — the reference-equal append
  * fast path, the path-keyed one-pass diff, or the general multiset
  * fallback — its output must be multiset-identical (and in the same
  * order, so the published delta is BYTE-identical) to
  * `(multisetDiff(prev, cur), multisetDiff(cur, prev))` on every
  * input shape those paths discriminate on. The fast paths exist for
  * the 10^6-entry commit (ScaleBench `manifest_scale_1m`); this spec
  * is what lets them be fast without being a second semantics. */
class EntryDiffSpec extends AnyFunSuite {

  private def e(path: String, rows: Long = 10L,
      stats: Seq[(String, Double, Double)] = Seq(("id", 0.0, 9.0))): Entry =
    Entry("c-1", path, rows, stats)

  private def oracle(prev: Seq[Entry], cur: Seq[Entry])
      : (Seq[Entry], Seq[Entry]) =
    (multisetDiff(prev, cur), multisetDiff(cur, prev))

  private def check(prev: Seq[Entry], cur: Seq[Entry]): Unit = {
    val got = entryDiff(prev, cur)
    assert(got === oracle(prev, cur),
      s"entryDiff diverged from the multiset oracle for prev=$prev cur=$cur")
  }

  test("append shape with a SHARED prefix (the fast path) matches the " +
      "multiset oracle, including order") {
    val prev = (0 until 100).map(i => e(s"f$i"))
    val adds = Seq(e("g0"), e("g1"))
    check(prev, prev ++ adds)       // instance-shared prefix
    check(Nil, adds)                // empty base
    check(prev, prev)               // no-op commit
  }

  test("structurally equal but NOT instance-shared prefix (re-parsed " +
      "entries) produces the same result through the general path") {
    val prev = (0 until 50).map(i => e(s"f$i"))
    val cur = (0 until 50).map(i => e(s"f$i")) ++ Seq(e("g0"))
    assert(!(cur.head eq prev.head))
    check(prev, cur)
    assert(entryDiff(prev, cur) === ((Nil, Seq(e("g0")))))
  }

  test("DML shapes: removals, stat changes on a kept path, and " +
      "shorter current lists") {
    val prev = (0 until 20).map(i => e(s"f$i"))
    // delete-only: two entries gone
    check(prev, prev.take(10) ++ prev.drop(12))
    // rewrite: same path, different stats — remove+add pair
    val changed = prev.updated(5, e("f5", stats = Seq(("id", 0.0, 99.0))))
    check(prev, changed)
    assert(entryDiff(prev, changed) ===
      ((Seq(prev(5)), Seq(changed(5)))))
    // mixed: shared prefix broken mid-list falls through correctly
    check(prev, prev.take(7) ++ Seq(e("new0")) ++ prev.drop(8))
  }

  test("duplicate live paths on either side fall back to the full " +
      "multiset diff") {
    val dup = Seq(e("f0"), e("f1"), e("f0"))
    val cur = Seq(e("f0"), e("f1"))
    check(dup, cur)
    check(cur, dup)
    // duplicate with DIFFERENT content under the same path
    val dup2 = Seq(e("f0"), e("f0", rows = 99L))
    check(dup2, Seq(e("f0")))
  }

  test("cached Entry hashCode equals the synthesized product hash and " +
      "respects structural equality") {
    val a = e("f0")
    val b = e("f0")
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.hashCode === scala.runtime.ScalaRunTime._hashCode(b))
    val c = e("f0", stats = Seq(("id", 0.0, 8.0)))
    assert(a !== c)
    assert(a.hashCode !== c.hashCode) // 2^-32 collision would be fine too
    // HashMap keyed by entries behaves (the applyDelta/multisetDiff use)
    val m = scala.collection.mutable.HashMap(a -> 1)
    assert(m.contains(b) && !m.contains(c))
  }
}
