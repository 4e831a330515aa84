package graft.lake

import org.apache.spark.sql.Column

/** Clause model for [[SnapshotTable.mergeClauses]] — the full
  * SQL:2003 / Delta-style MERGE surface beyond the unconditional
  * full-row upsert [[SnapshotTable.merge]] implements:
  *
  *   WHEN MATCHED [AND cond] THEN UPDATE SET a = e, ... | DELETE
  *   WHEN NOT MATCHED [AND cond] THEN INSERT (c, ...) VALUES (e, ...)
  *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE ... | DELETE
  *
  * Conditions and value expressions are ordinary [[Column]]s that may
  * reference the target as `<targetAlias>.<col>` and the source as
  * `<sourceAlias>.<col>` (defaults `t` / `s`); NOT MATCHED BY SOURCE
  * clauses see only the target, NOT MATCHED (insert) clauses only the
  * source, per SQL. Clauses of one family evaluate in order and the
  * FIRST whose condition holds applies; a row no clause claims is
  * kept unchanged (target side) or not inserted (source side). A
  * NULL condition result counts as false, per SQL three-valued WHEN.
  *
  * The matched and not-matched-by-source families share the
  * update/delete shapes, so both are expressed as
  * [[MergeMatchedClause]] sequences.
  */
sealed trait MergeMatchedClause {
  /** `AND` condition; `None` = unconditional (fires for every row the
    * family covers that an earlier clause didn't claim). */
  def condition: Option[Column]
}

/** `... THEN UPDATE SET <assignments>`. Empty `assignments` means
  * `UPDATE SET *`: every non-generated, non-identity target column
  * with a same-named source column is assigned from the source
  * (meaningless — and refused — in the NOT MATCHED BY SOURCE family,
  * where there is no source row). */
case class MergeUpdate(condition: Option[Column] = None,
    assignments: Seq[(String, Column)] = Nil) extends MergeMatchedClause

/** `... THEN DELETE`. */
case class MergeDelete(condition: Option[Column] = None)
  extends MergeMatchedClause

/** `WHEN NOT MATCHED [AND cond] THEN INSERT ...`. Empty `values`
  * means `INSERT *` (same expansion rule as `UPDATE SET *`, except
  * identity-BY-DEFAULT columns may flow from the source). Columns not
  * assigned insert NULL; identity columns left NULL are filled by the
  * commit's identity pass, generated columns always recompute. */
case class MergeInsert(condition: Option[Column] = None,
    values: Seq[(String, Column)] = Nil)
