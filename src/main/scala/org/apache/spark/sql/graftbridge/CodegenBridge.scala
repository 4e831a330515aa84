package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}

/** Codegen diagnostics (private[sql] APIs in Spark 4, hence the
  * subpackage bridge): force-compile every WholeStageCodegen subtree
  * of a physical plan with Janino NOW. A generated-code construct
  * Janino cannot compile (e.g. a Java method reference) normally
  * surfaces only as a runtime WARN followed by a silent fallback to
  * interpreted execution — this turns it into a hard failure specs
  * can assert on. */
object CodegenBridge {

  /** Compiles each whole-stage subtree; returns how many were
    * compiled. Throws the Janino CompileException on failure. */
  def compileWholeStage(plan: SparkPlan): Int = {
    val stages = plan.collect { case w: WholeStageCodegenExec => w }
    stages.foreach { w =>
      val (_, source) = w.doCodeGen()
      CodeGenerator.compile(source)
    }
    stages.size
  }
}
