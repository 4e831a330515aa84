package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.internal.{UnresolvedAttribute => NodeAttr}

/** Bridge into the `private[classic]` ColumnNode wrapper: a Column
  * built by `functions.col` reaches [[ColumnNodeExpression]] as an
  * OPAQUE leaf — its UnresolvedAttributes live in the ColumnNode
  * graph, not the Expression tree — so name-reference checks need
  * this unwrap (see graftbridge.ColumnBridge.referencesName). */
private[sql] object GraftColumnNodeBridge {

  /** Last-part names of unresolved attributes inside a wrapped
    * ColumnNode graph; empty for ordinary expressions. */
  def nodeAttributeNames(e: Expression): Seq[String] = e match {
    case ColumnNodeExpression(node) =>
      node.collect { case ua: NodeAttr => ua.nameParts.lastOption }.flatten
    case _ => Nil
  }

  /** Full name-part paths (qualifier included) of unresolved
    * attributes inside a wrapped ColumnNode graph; empty for
    * ordinary expressions. */
  def nodeAttributeParts(e: Expression): Seq[Seq[String]] = e match {
    case ColumnNodeExpression(node) =>
      node.collect { case ua: NodeAttr => ua.nameParts }
    case _ => Nil
  }
}
