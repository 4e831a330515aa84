package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * private[sql]; a subpackage bridge is the standard pattern for
  * Spark-native extension libraries that define custom Catalyst
  * expressions (the Column constructor itself is no longer public).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Does the column reference an attribute with this (last-part)
    * name? Looks through BOTH forms a Column can take: a real
    * Expression tree (the SQL/command path) and the lazily-wrapped
    * ColumnNode graph that `functions.col` builds (which
    * [[expression]] surfaces as an opaque ColumnNodeExpression —
    * its UnresolvedAttributes live in the node graph, not the
    * Expression tree). */
  def referencesName(c: Column, name: String): Boolean =
    expression(c).exists {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        u.nameParts.lastOption.exists(_.equalsIgnoreCase(name))
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.name.equalsIgnoreCase(name)
      case other =>
        org.apache.spark.sql.classic.GraftColumnNodeBridge
          .nodeAttributeNames(other).exists(_.equalsIgnoreCase(name))
    }

  /** Does the column contain a QUALIFIED attribute reference whose
    * leading qualifier is `alias` (e.g. `s`.`x` for alias "s")?
    * Used to reject source-alias references in MERGE clause families
    * that have no source row (NOT MATCHED BY SOURCE). Same two-form
    * unwrap as [[referencesName]]. */
  def referencesQualifiedBy(c: Column, alias: String): Boolean =
    expression(c).exists {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        u.nameParts.size > 1 && u.nameParts.head.equalsIgnoreCase(alias)
      case other =>
        org.apache.spark.sql.classic.GraftColumnNodeBridge
          .nodeAttributeParts(other)
          .exists(p => p.size > 1 && p.head.equalsIgnoreCase(alias))
    }
}
