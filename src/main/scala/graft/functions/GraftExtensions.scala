package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available in any session via configuration —
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * or programmatically:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * This is the library-grade registration path (survives session
  * cloning, visible in `SHOW FUNCTIONS`); the per-session
  * `VectorFunctions.register(spark)` remains for ad-hoc use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    // whole-operator extension: plans the AsOfJoin logical node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL-syntax time travel over registered snapshot tables:
    //   SELECT * FROM name VERSION AS OF 2 / TIMESTAMP AS OF '...'
    ext.injectResolutionRule(s => graft.lake.ResolveSnapshotRelation(s))
    // branch/tag ref DDL statements (ALTER TABLE t CREATE BRANCH ...)
    // — syntax Spark's grammar lacks; everything else delegates
    ext.injectParser((_, delegate) => new graft.lake.GraftSqlParser(delegate))
  }
}
